"""Distribution-drift test statistics over grouped/binned columns —
the curation-dashboard battery that complements the exact two-sample
KS report (``q_docs_source_length_ks``): PSI answers "how much did
this feed's shape move", chi-square answers "are these two labels
independent", Mann-Whitney answers "did one cohort's values shift up"
— the standard monitoring trio for a training-data pipeline watching
its sources drift between crawls.

All three share the same 100 TB scale shape as the KS query: ONE
map-side-combinable groupBy over the corpus reduces to a table bounded
by the BIN GRID (|groups| x |bins| / |A| x |B| cells / |value grid|
rows — never row-scaled), every subsequent step runs on that bounded
table, and output is one row per group (or one row total). No
reference counterpart (the reference is a SAX kernel library); these
follow the textbook definitions:

- PSI: sum_b (p_b - q_b) ln(p_b / q_b), add-alpha smoothed over a
  FIXED bin domain (the industry "population stability index").
- chi-square: sum_cells (n - e)^2 / e with e = row_margin *
  col_margin / N over the full category grid including empty cells.
- Mann-Whitney U: the exact tie-corrected rank-sum form computed from
  integer value-grid counts, 2U kept in DECIMAL so corpus-scale
  products never overflow a long (same lesson as the KS DECIMAL
  cross-products).

Float parity with the DuckDB oracles follows the repo idiom (see
dsir_logweights): terms are exact-rational doubles (IEEE-identical
cross-engine) except ``ln``; sums quantize 1e-6 on output, which
absorbs libm ULP and summation-order drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .timeseries import quantize

__all__ = [
    "psi_by_group",
    "psi_from_counts",
    "chisq_independence",
    "mann_whitney_u",
]


def psi_by_group(
    df: DataFrame,
    *,
    group: str,
    bin_col: str,
    n_bins: int,
    alpha: int = 1,
) -> DataFrame:
    """Population Stability Index of each group's binned distribution
    against the whole input -> ``(group, n_rows, psi)``.

    ``bin_col`` must already hold integer bins in ``[0, n_bins)`` (the
    caller owns the binning — integer arithmetic keeps it
    engine-exact). Both distributions are add-``alpha`` smoothed over
    the FULL fixed bin domain, so empty bins contribute mass and PSI
    is finite by construction; a group-by-group spine (groups x
    ``sequence(0, n_bins-1)``) materializes the empty cells.

    Scale: the corpus reduces in one combinable groupBy to
    |groups| x |bins| cells; the spine cross-join is |groups| x
    ``n_bins`` rows with the bin table broadcast. PSI >= 0 always;
    ~0.1 is the conventional "investigate" line, ~0.25 "shifted".
    """
    cells = df.groupBy(group, bin_col).agg(F.count(F.lit(1)).alias("__c"))
    return psi_from_counts(
        cells,
        group=group,
        bin_col=bin_col,
        count="__c",
        n_bins=n_bins,
        alpha=alpha,
    )


def psi_from_counts(
    cells: DataFrame,
    *,
    group: str,
    bin_col: str,
    count: str,
    n_bins: int,
    alpha: int = 1,
) -> DataFrame:
    """:func:`psi_by_group` starting from pre-aggregated ``(group,
    bin, count)`` cells — the entry point for callers that already
    hold the grid-bounded counter table, e.g. a complete-mode
    streaming aggregation whose state IS those cells (the
    ``grid_quantiles_from_counts`` pattern). Missing cells are
    treated as zero observations (the spine materializes them)."""
    if n_bins < 2:
        raise ValueError("psi_from_counts needs n_bins >= 2")
    if alpha < 1:
        raise ValueError("psi_from_counts needs integer alpha >= 1")
    cells = cells.select(
        group, bin_col, F.col(count).cast("long").alias("__c")
    )
    groups = cells.groupBy(group).agg(F.sum("__c").alias("n_rows"))
    per_bin = cells.groupBy(bin_col).agg(F.sum("__c").alias("__cb"))
    # 1-row driver scalar -> plan-time literal (grid-bounded input)
    n_total = cells.agg(F.sum("__c")).first()[0] or 0
    spine = groups.crossJoin(
        F.broadcast(
            cells.sparkSession.range(n_bins).select(
                F.col("id").alias(bin_col)
            )
        )
    )
    full = (
        spine.join(per_bin, bin_col, "left")
        .join(cells, [group, bin_col], "left")
        .select(
            group,
            "n_rows",
            (F.coalesce(F.col("__c"), F.lit(0)) + alpha).alias("__ca"),
            (F.coalesce(F.col("__cb"), F.lit(0)) + alpha).alias("__cba"),
        )
    )
    p = F.col("__ca").cast("double") / (
        F.col("n_rows") + F.lit(alpha * n_bins)
    ).cast("double")
    q = F.col("__cba").cast("double") / F.lit(
        float(n_total + alpha * n_bins)
    )
    term = (p - q) * F.log(p / q)
    return (
        full.withColumn("__t", term)
        .groupBy(group, "n_rows")
        .agg(quantize(F.sum("__t"), 6).alias("psi"))
    )


def chisq_independence(df: DataFrame, *, a: str, b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns -> one row ``(n, dof, chisq)``.

    The statistic runs over the FULL |A| x |B| grid — observed-zero
    cells still carry expected mass ``e = n_a * n_b / N`` (dropping
    them understates the statistic), so the margins cross-join
    materializes every cell; both margin tables are grid-bounded and
    the small side broadcasts. All terms are exact-rational doubles
    (no transcendental), so cross-engine parity needs only the output
    quantization."""
    cells = df.groupBy(a, b).agg(F.count(F.lit(1)).alias("__n"))
    ma = cells.groupBy(a).agg(F.sum("__n").alias("__na"))
    mb = cells.groupBy(b).agg(F.sum("__n").alias("__nb"))
    n_total = df.count()
    grid = (
        ma.crossJoin(F.broadcast(mb))
        .join(cells, [a, b], "left")
        .select(
            "__na",
            "__nb",
            F.coalesce(F.col("__n"), F.lit(0)).alias("__n"),
        )
    )
    e = (
        F.col("__na").cast("double")
        * F.col("__nb").cast("double")
        / F.lit(float(n_total))
    )
    d = F.col("__n").cast("double") - e
    # margins are grid-bounded: two driver-side counts -> plan literal
    dof = (ma.count() - 1) * (mb.count() - 1)
    return grid.agg(
        F.lit(n_total).cast("long").alias("n"),
        F.lit(int(dof)).cast("long").alias("dof"),
        quantize(F.sum(d * d / e), 6).alias("chisq"),
    )


def mann_whitney_u(
    df: DataFrame,
    *,
    group: str,
    value_int: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact tie-corrected Mann-Whitney U between two cohorts' integer
    values -> one row ``(n_a, n_b, u_a, auc)``.

    ``value_int`` must be integer (caller pre-quantizes floats to a
    grid, the same contract as grid_quantiles). Computed from
    value-grid COUNTS, never ranks: with ``cum_b(<v)`` the count of
    B-values strictly below v,

        2*U_a = sum_v c_a(v) * (2*cum_b(<v) + c_b(v))

    (each tie contributes 1/2, kept doubled so everything stays
    integer). The tie sum ``2*cum_b + c_b`` stays in LONG (counts fit),
    but the product runs as DECIMAL(19,0) x DECIMAL(19,0) ->
    DECIMAL(38,0): at corpus scale ``c_a * cum_b`` exceeds a long (the
    KS lesson; 19-wide operands keep the result width legal in both
    engines). ``auc`` =
    U_a / (n_a*n_b) — the probability-of-superiority effect size,
    quantized 1e-6; u_a is exact (reported as double: 2U/2).

    Scale: one combinable groupBy(value grid); one cumulative window
    over the grid-bounded distinct-value table (Class A); 1-row out.
    """
    from pyspark.sql import Window

    vals = df.where(F.col(group).isin(group_a, group_b)).select(
        F.col(value_int).alias("__v"),
        F.when(F.col(group) == group_a, 1).otherwise(0).alias("__ia"),
    )
    per_v = vals.groupBy("__v").agg(
        F.sum("__ia").alias("__ca"),
        F.sum(1 - F.col("__ia")).alias("__cb"),
    )
    w = (
        Window.orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dec = lambda c: c.cast("decimal(19,0)")
    terms = per_v.select(
        "__ca",
        "__cb",
        F.coalesce(F.sum("__cb").over(w), F.lit(0)).alias("__cum_b"),
    ).select(
        "__ca",
        "__cb",
        (
            dec(F.col("__ca"))
            * dec(2 * F.col("__cum_b") + F.col("__cb"))
        ).alias("__t"),
    )
    agg = terms.agg(
        F.sum(F.col("__ca")).alias("__na"),
        F.sum(F.col("__cb")).alias("__nb"),
        F.sum("__t").alias("__u2"),
    )
    return agg.select(
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        (F.col("__u2").cast("double") / 2.0).alias("u_a"),
        quantize(
            F.col("__u2").cast("double")
            / (
                2.0
                * F.col("__na").cast("double")
                * F.col("__nb").cast("double")
            ),
            6,
        ).alias("auc"),
    )
