"""Trailing-window time-series operators: rolling z-score anomaly
scoring and exponentially-weighted moving averages.

Both operate per-series with a bounded ``rowsBetween`` frame, so the
plan is one shuffle on the series key and a single WindowExec pass —
state per row is O(window), independent of series length, which is the
shape that survives 100 TB (no per-series collect, no global sort).

Reference parity: the reference engine has no anomaly/EWMA kernels;
these extend the engine's windowed-series surface (SURVEY.md §2.3) the
same way its sliding SAX windows do (symtseries.c sliding ring), reusing
the identical partition/order/frame contract as operators/windows.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantize(col: Column, decimals: int) -> Column:
    """Engine-portable decimal quantization: ``floor(x * 10^d + 0.5) /
    10^d``.

    Unlike ``F.round`` (BigDecimal HALF_UP on the exact double — which
    can disagree with another engine's ``round()`` at the last kept
    digit for tie-adjacent doubles), every step here (multiply, add,
    floor, divide) is a single IEEE-754 double operation, so two engines
    that hold bit-identical inputs produce bit-identical quantized
    outputs. Mirror in SQL as ``floor(x * 1e<d> + 0.5) / 1e<d>``.
    Negative ties round toward +inf on BOTH engines (floor of x+0.5),
    which is the point: identical, not "correct"."""
    scale = F.lit(float(10 ** decimals))
    return F.floor(col * scale + F.lit(0.5)) / scale


def rolling_zscore(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    window: int,
    round_to: int = 4,
) -> DataFrame:
    """Trailing-window z-score per series.

    For each row, ``zscore = (x - mu) / sigma`` over the last ``window``
    rows (current inclusive) of its series, with population sigma —
    the same mu/sigma convention as the SAX normalization kernel
    (functions/sax.py). Flat windows (sigma == 0) yield NULL. The
    mean/variance are spelled out as ``sum/count`` arithmetic rather
    than ``avg``/``stddev`` builtins so an oracle engine can reproduce
    the exact expression shape; the result is rounded so last-ulp
    disagreement between window-aggregation strategies cannot flip a
    comparison downstream.
    """
    if window < 2:
        raise ValueError("rolling_zscore needs window >= 2")
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    x = F.col(value).cast("double")
    n = F.count(value).over(w).cast("double")
    s1 = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    mu = s1 / n
    var = s2 / n - mu * mu
    z = F.when(var > 0, (x - mu) / F.sqrt(var))
    return df.withColumn("n_window", F.count(value).over(w)).withColumn(
        "zscore", F.round(z, round_to)
    )


def _ewma_fold(vals: Column, alpha: float) -> Column:
    """Left fold ``y = alpha * x + (1 - alpha) * y`` over a value list,
    seeded with its first element. Shared by :func:`ewma` and
    :func:`forecast_backtest` so both build the identical expression
    tree (the cross-engine parity contract)."""
    a = F.lit(float(alpha))
    na = F.lit(1.0 - float(alpha))

    def step(acc: Column, x: Column) -> Column:
        return a * x + na * acc

    rest = F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0)))
    return F.aggregate(rest, F.element_at(vals, 1), step)


def ewma(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    alpha: float,
    window: int,
    round_to: int = 6,
) -> DataFrame:
    """Trailing-window EWMA: fold ``y = alpha * x + (1 - alpha) * y``
    over the last ``window`` values in series order, seeded with the
    oldest value in the frame.

    The fold runs as a JVM higher-order ``aggregate`` over the window's
    ``collect_list`` (frame order == series order), so every engine that
    folds left with the same lambda produces bit-identical doubles —
    each step is one multiply-add chain in a fixed order. Memory per row
    is O(window) doubles inside one WindowExec pass.

    NULL ``value`` rows are SKIPPED (``collect_list`` drops them): the
    fold runs over the frame's non-null values only. A SQL mirror using
    ``list()`` must filter nulls the same way, or NULL-poisoned frames
    will diverge.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("ewma needs 0 < alpha <= 1")
    if window < 1:
        raise ValueError("ewma needs window >= 1")
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    vals = F.collect_list(F.col(value).cast("double")).over(w)

    # bind the fold once: quantize references its argument twice, and
    # CollapseProject would otherwise inline the fold tree into both
    # (same fix as holt(); the boundary survives because the producer
    # expression is non-cheap and referenced more than once)
    return (
        df.withColumn(
            "__ew", F.when(F.size(vals) > 0, _ewma_fold(vals, alpha))
        )
        .withColumn("ewma", quantize(F.col("__ew"), round_to))
        .drop("__ew")
    )


def linear_trend(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-series OLS trend over the row index -> one row per series
    ``(key, n, slope, intercept)`` for ``y ~ slope * i + intercept``
    with ``i = 1..n`` in series order (quantized to ``round_to``).
    Single-point series emit NULL slope/intercept; series whose values
    are ALL NULL produce no output row (they are filtered before the
    aggregate — mirror the left-join back yourself if presence
    matters).

    The index moments (``sum i``, ``sum i²``) are EXACT wide-integer
    sums — ``decimal(38,0)`` here, ``HUGEINT`` in the DuckDB twin — so
    they cannot wrap for any realistic series (an int64 ``sum i²``
    silently overflows past ~3.04M rows/series under non-ANSI Spark;
    decimal stays exact to ``n < ~4.6e12``). Both engines then convert
    the exact moments to double (IEEE round-to-nearest, identical in
    both) and run the same double-arithmetic slope formula, so parity
    holds at any scale. The only float aggregations are ``sum y`` and
    ``sum i*y`` (quantization absorbs their summation-order ulp, the
    same convention as the corpus LM scores). One row_number window
    pass + one map-side-combinable groupBy on the series key: the
    single-shuffle shape that scales.

    NULL values keep their row index (the series' time axis) but are
    excluded from the sums via ``n_valid``-weighted moments — mirrored
    exactly in the SQL twin.
    """
    w = Window.partitionBy(key).orderBy(*order)
    y = F.col(value).cast("double")
    idx = F.row_number().over(w).cast("long")
    base = df.select(
        F.col(key), y.alias("__y"), idx.alias("__i"),
    ).where(F.col("__y").isNotNull())
    i_dec = F.col("__i").cast("decimal(19,0)")
    agg = base.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__i").cast("decimal(38,0)")).alias("__si_w"),
        F.sum(i_dec * i_dec).alias("__si2_w"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__i") * F.col("__y")).alias("__siy"),
    )
    n = F.col("n").cast("double")
    si = F.col("__si_w").cast("double")
    si2 = F.col("__si2_w").cast("double")
    denom = n * si2 - si * si
    slope = F.when(
        (F.col("n") >= 2) & (denom != 0),
        (n * F.col("__siy") - si * F.col("__sy")) / denom,
    )
    intercept = (F.col("__sy") - slope * si) / n
    return agg.select(
        key,
        "n",
        quantize(slope, round_to).alias("slope"),
        quantize(intercept, round_to).alias("intercept"),
    )


def mad_zscore(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    window: int,
    round_to: int = 4,
) -> DataFrame:
    """Robust (median/MAD) trailing-window z-score per series:
    ``rz = 0.6745 * (x - median) / MAD`` over the last ``window`` rows,
    where ``MAD = median(|x_i - median|)`` — the outlier detector that
    a single earlier spike cannot poison (the classic failure of the
    mean/sigma z-score: one 100x point inflates sigma and masks every
    later anomaly in the frame). Flat-MAD windows (MAD == 0) yield NULL.

    Exact medians, not approximations: ``array_sort`` on the frame's
    collect_list then middle-element arithmetic — deterministic doubles
    any engine reproduces (sorting and (a+b)/2 have no
    accumulation-order freedom). Cost is O(window log window) per row
    inside one WindowExec pass — same single-shuffle budget as
    :func:`rolling_zscore`, a higher constant bought for robustness.
    NULL values are dropped from the frame (collect_list semantics; a
    SQL mirror must FILTER its list the same way).
    """
    if window < 2:
        raise ValueError("mad_zscore needs window >= 2")
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(window - 1), Window.currentRow)
    )

    def median_of(sorted_col: Column) -> Column:
        # references its argument 5 times — callers must pass a LAMBDA
        # VARIABLE (bound once by the HOF evaluator), never a raw
        # expression, or the sort re-runs per reference
        n = F.size(sorted_col)
        half = F.floor(n / 2).cast("int")  # int/int is double in Spark SQL
        mid = F.element_at(sorted_col, half + 1)
        even = (
            F.element_at(sorted_col, half)
            + F.element_at(sorted_col, half + 1)
        ) / 2.0
        return F.when(n % 2 == 1, mid).otherwise(even)

    def _let(value_col: Column, body) -> Column:
        # bind value_col to a lambda variable (functions/sax.py _let
        # rationale): lambda variables are evaluated ONCE per row by the
        # HOF evaluator, where a projected column reference can be
        # re-inlined into consumer lambdas and re-evaluated per element
        # (measured 43s -> 4.0s at sf0.1 for this operator)
        return F.element_at(F.transform(F.array(value_col), body), 1)

    def mm_struct(vals: Column) -> Column:
        return _let(
            F.array_sort(vals),
            lambda sv: _let(
                median_of(sv),
                lambda med: _let(
                    F.array_sort(F.transform(vals, lambda x: F.abs(x - med))),
                    lambda sd: F.struct(
                        med.alias("med"), median_of(sd).alias("mad")
                    ),
                ),
            ),
        )

    out = df.withColumn(
        "__vals", F.collect_list(F.col(value).cast("double")).over(w)
    ).withColumn("__mm", _let(F.col("__vals"), mm_struct))
    rz = F.when(
        F.col("__mm")["mad"] > 0,
        F.lit(0.6745)
        * (F.col(value).cast("double") - F.col("__mm")["med"])
        / F.col("__mm")["mad"],
    )
    return (
        out.withColumn("n_window", F.size(F.col("__vals")))
        .withColumn("rzscore", quantize(rz, round_to))
        .drop("__vals", "__mm")
    )


def cusum(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    target: float,
    slack: float,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    """One-sided CUSUM drift detection per series: the running statistic
    ``C_t = max(0, C_{t-1} + (x_t - target - slack))`` with
    ``alarm = C_t > threshold`` — the standard sequential changepoint
    monitor for "has this series drifted above target by more than
    slack, persistently".

    Computed WITHOUT the recursion via the exact prefix identity
    ``C_t = S_t - min(0, min_{i<=t} S_i)`` where ``S_t`` is the running
    sum of ``y_i = x_i - target - slack``: two cumulative window
    aggregates (sum + min) in ONE WindowExec pass, O(1) state per row —
    the recursion itself would need an O(series) prefix fold per row in
    batch (that shape is the streaming twin's job, see
    :func:`streaming.timeseries.cusum_stream`). Both engines accumulate
    cumulative frames sequentially in frame order, so the identity's
    floats reproduce; the emitted statistic is quantized and the alarm
    is evaluated on the QUANTIZED value so the flag row-set is
    engine-stable. NULL values contribute nothing to the sums (both
    engines skip them) and emit the running statistic unchanged.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = F.col(value).cast("double") - F.lit(float(target) + float(slack))
    # two chained cumulative aggregates: same partitioning + sort, so
    # Catalyst plans ONE Exchange/Sort with two sequential Window passes
    with_s = df.withColumn("__s", F.sum(y).over(w))
    c = quantize(
        F.col("__s") - F.least(F.lit(0.0), F.min("__s").over(w)), round_to
    )
    return (
        with_s.withColumn("cusum", c)
        .withColumn("alarm", F.col("cusum") > F.lit(float(threshold)))
        .drop("__s")
    )


def _holt_fold(vals: Column, alpha: float, beta: float) -> Column:
    """Holt level+trend left fold over a value list -> struct ``(l,
    t)``, seeded ``(first value, 0)``. The ``l'`` term is deliberately
    recomputed inside the trend update (no let-binding in either
    engine's lambda) so any engine folding the same expression tree
    gets bit-identical doubles. Shared by :func:`holt` and
    :func:`forecast_backtest`."""
    a = F.lit(float(alpha))
    na = F.lit(1.0 - float(alpha))
    b = F.lit(float(beta))
    nb = F.lit(1.0 - float(beta))

    def step(acc: Column, x: Column) -> Column:
        level2 = a * x + na * (acc["l"] + acc["t"])
        trend2 = (
            b * ((a * x + na * (acc["l"] + acc["t"])) - acc["l"])
            + nb * acc["t"]
        )
        return F.struct(level2.alias("l"), trend2.alias("t"))

    rest = F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0)))
    seed = F.struct(F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("t"))
    return F.aggregate(rest, seed, step)


def holt(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    alpha: float,
    beta: float,
    window: int,
    round_to: int = 6,
) -> DataFrame:
    """Trailing-window Holt double-exponential smoothing (level +
    trend): fold

    ``l' = alpha * x + (1 - alpha) * (l + t)``
    ``t' = beta * (l' - l) + (1 - beta) * t``

    over the last ``window`` values in series order, seeded with
    ``(l, t) = (first value, 0)``. Emits ``level``, ``trend``, and the
    one-step-ahead ``forecast = level + trend`` (all quantized to
    ``round_to`` decimals).

    Same execution shape as :func:`ewma` — one shuffle on the series
    key, one WindowExec pass, a JVM higher-order ``aggregate`` with a
    2-field struct accumulator; O(window) doubles per row. The ``l'``
    term is deliberately recomputed inside the trend update (no
    let-binding in either engine's lambda) so any engine folding the
    same expression tree gets bit-identical doubles — the DuckDB mirror
    folds ``[x, 0.0]`` lists with the identical arithmetic. NULL values
    are skipped by ``collect_list`` exactly as in :func:`ewma`.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("holt needs 0 < alpha <= 1")
    if not 0.0 <= beta <= 1.0:
        raise ValueError("holt needs 0 <= beta <= 1")
    if window < 1:
        raise ValueError("holt needs window >= 1")
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    vals = F.collect_list(F.col(value).cast("double")).over(w)

    # Bind the fold ONCE as a named column: each quantized output
    # references it twice (floor(x*s+0.5)/s), so inlining the fold tree
    # into every output would evaluate it 8x per row (measured 6.8s vs
    # 0.9s at sf0.1). CollapseProject keeps the projection boundary for
    # a non-cheap producer expression referenced more than once, so the
    # fold runs once and the outputs extract from the struct.
    with_lt = df.withColumn(
        "__lt", F.when(F.size(vals) > 0, _holt_fold(vals, alpha, beta))
    )
    lt = F.col("__lt")
    return (
        with_lt.withColumn("level", quantize(lt["l"], round_to))
        .withColumn("trend", quantize(lt["t"], round_to))
        .withColumn("forecast", quantize(lt["l"] + lt["t"], round_to))
        .drop("__lt")
    )


def stl_decompose(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    season: str,
    trend_window: int = 12,
    round_to: int = 6,
) -> DataFrame:
    """STL-lite additive decomposition per series ->
    ``value = trend + seasonal + resid`` with
    ``(key, order..., trend, seasonal, resid)`` columns.

    Classical decomposition (the moving-average core of STL without
    its loess robustness loop): *trend* is the centered moving average
    over ``+/-trend_window`` rows (edges average the available frame —
    identical partial-frame semantics in Spark and the SQL twin);
    *seasonal* is the per-(series, ``season``-bucket) mean of the
    detrended series — the cycle-subseries mean, with the season
    bucket supplied by the caller as an existing column (e.g.
    hour-of-day from pure epoch arithmetic, so no engine calendar
    conventions leak in); *resid* is what remains — the series a
    seasonal-aware anomaly detector actually thresholds.

    Plan: ONE shuffle on the series key for the trend WindowExec, then
    one shuffle on (series, season) for the whole-partition seasonal
    mean window — both bounded-state passes; no join, no collect.
    Trend and seasonal are quantized (grouped/windowed means drift
    across engines); the detrend subtraction then operates on
    engine-identical operands.
    """
    if trend_window < 1:
        raise ValueError("stl_decompose needs trend_window >= 1")
    order_cols = list(order)
    w_t = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(-trend_window, trend_window)
    )
    base = df.select(
        key, *order_cols, season, F.col(value).cast("double").alias("__v")
    )
    t = base.withColumn(
        "trend", quantize(F.avg("__v").over(w_t), round_to)
    ).withColumn("__det", F.col("__v") - F.col("trend"))
    w_s = Window.partitionBy(key, season)
    s = t.withColumn(
        "seasonal", quantize(F.avg("__det").over(w_s), round_to)
    )
    return s.select(
        key,
        *order_cols,
        "trend",
        "seasonal",
        quantize(F.col("__det") - F.col("seasonal"), round_to).alias("resid"),
    )


def autocorrelation(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    max_lag: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Per-series sample autocorrelation at lags ``1..max_lag`` ->
    ``(key, lag_k, n_pairs, acf)`` — the shape diagnostic run before
    choosing SAX window sizes (a series with strong lag-k structure
    wants n a multiple of k) or trusting an anomaly threshold.

    Standard biased estimator: ``acf_k = sum((x_t - mu)(x_{t+k} - mu))
    / sum((x_t - mu)^2)`` with the per-series global mean — both sums
    over the full series, denominator shared across lags.

    Plan: the series shuffles ONCE (partitionBy key for the lag
    window); the per-(key, lag) numerator and the per-key denominator
    are map-side-combinable aggregates over that same relation; the
    tiny per-key denominator re-joins broadcast-style. Mean and the
    final ratio are quantized (grouped sums drift across engines);
    NULL lag partners (series edges) drop out of the numerator exactly
    like the SQL twin's ``lag()`` NULLs.
    """
    if max_lag < 1:
        raise ValueError("autocorrelation needs max_lag >= 1")
    order_cols = list(order)
    w = Window.partitionBy(key).orderBy(*order_cols)
    v = F.col(value).cast("double")
    mu_tbl = (
        df.groupBy(key)
        .agg(quantize(F.avg(v), round_to).alias("__mu"))
    )
    base = df.select(F.col(key), *order_cols, v.alias("__v")).join(
        mu_tbl, key
    )
    lagged = base.select(
        F.col(key),
        (F.col("__v") - F.col("__mu")).alias("__c"),
        *[
            (F.lag(F.col("__v"), k).over(w) - F.col("__mu")).alias(f"__c{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    denom = lagged.groupBy(key).agg(
        F.sum(F.col("__c") * F.col("__c")).alias("__d")
    )
    nums = lagged.groupBy(key).agg(
        *[
            F.sum(F.col("__c") * F.col(f"__c{k}")).alias(f"__n{k}")
            for k in range(1, max_lag + 1)
        ],
        *[
            F.count(F.col(f"__c{k}")).alias(f"__cnt{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    lag_rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag_k"),
                    F.col(f"__n{k}").alias("__n"),
                    F.col(f"__cnt{k}").alias("n_pairs"),
                )
                for k in range(1, max_lag + 1)
            ]
        )
    )
    return (
        nums.join(denom, key)
        .select(F.col(key), F.col("__d"), lag_rows.alias("__l"))
        .select(
            key,
            F.col("__l.lag_k").alias("lag_k"),
            F.col("__l.n_pairs").alias("n_pairs"),
            quantize(F.col("__l.__n") / F.col("__d"), round_to).alias("acf"),
        )
    )


def sorted_median(sorted_col: Column) -> Column:
    """Exact median of an already-sorted array column via
    middle-element arithmetic — deterministic doubles any engine
    reproduces (no accumulation-order freedom). The caller must pass a
    LAMBDA VARIABLE when the argument is expensive (it is referenced
    five times; see mad_zscore's _let rationale)."""
    n = F.size(sorted_col)
    half = F.floor(n / 2).cast("int")
    mid = F.element_at(sorted_col, half + 1)
    even = (
        F.element_at(sorted_col, half) + F.element_at(sorted_col, half + 1)
    ) / 2.0
    return F.when(n % 2 == 1, mid).otherwise(even)


def _hw_fold(
    vals: Column, alpha: float, beta: float, gamma: float, season: int
) -> Column:
    """Additive Holt-Winters left fold over ``[x, j]`` elements -> flat
    ``array<double>`` state ``[l, t, s_0..s_{m-1}]``, seeded ``(first
    value, 0, zeros)``. Flat-list state because DuckDB's
    ``list_reduce`` has no separate accumulator type; ``l'`` is
    recomputed inline (the :func:`holt` parity rule). Shared by
    :func:`holt_winters` and :func:`forecast_backtest`."""
    a, na = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    b, nb = F.lit(float(beta)), F.lit(1.0 - float(beta))
    g, ng = F.lit(float(gamma)), F.lit(1.0 - float(gamma))

    def step(acc: Column, e: Column) -> Column:
        x = F.element_at(e, 1)
        j = F.element_at(e, 2)
        sj = F.element_at(acc, (j + 3).cast("int"))
        l1 = a * (x - sj) + na * (F.element_at(acc, 1) + F.element_at(acc, 2))
        t1 = (
            b * ((a * (x - sj) + na * (F.element_at(acc, 1) + F.element_at(acc, 2))) - F.element_at(acc, 1))
            + nb * F.element_at(acc, 2)
        )
        s1 = (
            g * (x - (a * (x - sj) + na * (F.element_at(acc, 1) + F.element_at(acc, 2))))
            + ng * sj
        )
        seasons = F.transform(
            F.sequence(F.lit(0), F.lit(season - 1)),
            lambda i: F.when(i.cast("double") == j, s1).otherwise(
                F.element_at(acc, (i + 3).cast("int"))
            ),
        )
        return F.concat(F.array(l1, t1), seasons)

    seed = F.concat(
        F.array(F.element_at(F.element_at(vals, 1), 1), F.lit(0.0)),
        F.array_repeat(F.lit(0.0), season),
    )
    rest = F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0)))
    return F.aggregate(rest, seed, step)


def holt_winters(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    alpha: float,
    beta: float,
    gamma: float,
    season: int,
    window: int,
    round_to: int = 6,
) -> DataFrame:
    """Trailing-window additive Holt-Winters (level + trend +
    ``season``-slot seasonal): fold

    ``l' = alpha * (x - s_j) + (1 - alpha) * (l + t)``
    ``t' = beta * (l' - l) + (1 - beta) * t``
    ``s_j' = gamma * (x - l') + (1 - gamma) * s_j``

    over the last ``window`` values, where ``j = position % season``
    (positional seasonality — the caller's ordering defines the cycle
    phase). Seeded ``(l, t, s*) = (first value, 0, zeros)``. Emits
    ``level``, ``trend``, ``season_adj`` (the just-updated seasonal
    slot), and the one-step-ahead ``forecast = level + trend +
    s_{(j+1) % season}`` — all quantized.

    Same single-shuffle WindowExec shape as :func:`holt`, upgraded to a
    FLAT ``array<double>`` accumulator ``[l, t, s_0..s_{m-1}]`` folded
    over ``[x, j]`` elements: DuckDB's ``list_reduce`` has no separate
    accumulator type (seed and elements must share one), so the state
    IS a list and the seed is prepended — and the Spark fold uses the
    identical flat representation so every arithmetic tree matches the
    mirror term for term. ``l'`` is deliberately recomputed inline in
    the trend and seasonal updates (the :func:`holt` rule: identical
    expression trees, not let-bound intermediates, are what two
    engines reproduce bit-for-bit). O(window x season) doubles per row
    — bounded plan-time constants. NULL values are skipped by the fold
    (dropped from the ``collect_list``, as in :func:`ewma`) but KEEP
    their row position: ``j = row_number % season`` counts every row,
    so a NULL row DOES advance the seasonal phase — the phase tracks
    the series' time axis, gaps included, and the SQL mirror's
    unfiltered ``row_number`` does the same (only the value list is
    FILTERed).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("holt_winters needs 0 < alpha <= 1")
    if not 0.0 <= beta <= 1.0 or not 0.0 <= gamma <= 1.0:
        raise ValueError("holt_winters needs beta, gamma in [0, 1]")
    if season < 2 or window < season:
        raise ValueError("holt_winters needs season >= 2, window >= season")
    order_cols = list(order)
    wrow = Window.partitionBy(key).orderBy(*order_cols)
    w = wrow.rowsBetween(-(window - 1), Window.currentRow)
    v = F.col(value).cast("double")
    pos = (F.row_number().over(wrow) - 1) % season
    elem = F.when(v.isNotNull(), F.array(v, pos.cast("double")))
    vals = F.collect_list(elem).over(w)

    with_st = df.withColumn("__j", pos).withColumn(
        "__hw",
        F.when(F.size(vals) > 0, _hw_fold(vals, alpha, beta, gamma, season)),
    )
    hw = F.col("__hw")
    jn = ((F.col("__j") + 1) % season + 3).cast("int")
    return (
        with_st.withColumn("level", quantize(F.element_at(hw, 1), round_to))
        .withColumn("trend", quantize(F.element_at(hw, 2), round_to))
        .withColumn(
            "season_adj",
            quantize(F.element_at(hw, (F.col("__j") + 3).cast("int")), round_to),
        )
        .withColumn(
            "forecast",
            quantize(
                F.element_at(hw, 1)
                + F.element_at(hw, 2)
                + F.element_at(hw, jn),
                round_to,
            ),
        )
        .drop("__hw", "__j")
    )


def forecast_backtest(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    ewma_p: dict,
    holt_p: dict,
    hw_p: dict,
    round_to: int = 6,
) -> DataFrame:
    """Rolling-origin one-step forecast backtest over the exponential
    family in ONE window stage -> 3 rows ``(method, n_evals, mae)``
    ordered by method.

    All four window expressions — the ``lead()`` next-actual and the
    three method folds (:func:`_ewma_fold`, :func:`_holt_fold`,
    :func:`_hw_fold`) — share one ``(key, order)`` partitioning, so the
    plan is ONE shuffle + ONE sort feeding stacked WindowExecs, then a
    single map-side-combinable aggregate; the previous shape (three
    operator invocations joined back to a lead frame) scanned and
    sorted the input four times. Each method's forecast is the
    operator's own quantized expression (identical trees via the
    shared fold builders), so the per-method MAEs are bit-identical to
    the composed form and the DuckDB oracle is unchanged. Per-arm MAE
    is a conditional avg over rows where both forecast and next actual
    exist, floor-quantized (grouped-sum drift absorbed, the repo
    convention); ``n_evals`` is an exact integer.
    """
    order_cols = list(order)
    wrow = Window.partitionBy(key).orderBy(*order_cols)
    v = F.col(value).cast("double")

    # Pin the window stage's parallelism: the folds are CPU-heavy per
    # row (O(window) / O(window x season) multiply-adds), so AQE's
    # SIZE-based partition coalescing (tuned for IO-bound stages)
    # under-parallelizes this stage badly — measured 2 tasks instead
    # of 32 at sf0.1, 2x wall clock. An explicit series-key
    # repartition at the session's shuffle parallelism satisfies the
    # window's required distribution (no second exchange) and AQE
    # leaves user-specified partition counts alone. Results are
    # per-series, so partitioning cannot change them.
    n_part = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    df = df.repartition(n_part, key)

    w_e = wrow.rowsBetween(-(ewma_p["window"] - 1), Window.currentRow)
    w_h = wrow.rowsBetween(-(holt_p["window"] - 1), Window.currentRow)
    w_hw = wrow.rowsBetween(-(hw_p["window"] - 1), Window.currentRow)
    season = hw_p["season"]
    vals_e = F.collect_list(v).over(w_e)
    vals_h = F.collect_list(v).over(w_h)
    pos = (F.row_number().over(wrow) - 1) % season
    elem = F.when(v.isNotNull(), F.array(v, pos.cast("double")))
    vals_hw = F.collect_list(elem).over(w_hw)

    base = (
        df.withColumn("__a", F.lead(v).over(wrow))
        .withColumn(
            "__ew",
            F.when(F.size(vals_e) > 0, _ewma_fold(vals_e, ewma_p["alpha"])),
        )
        .withColumn(
            "__lt",
            F.when(
                F.size(vals_h) > 0,
                _holt_fold(vals_h, holt_p["alpha"], holt_p["beta"]),
            ),
        )
        .withColumn("__j", pos)
        .withColumn(
            "__hw",
            F.when(
                F.size(vals_hw) > 0,
                _hw_fold(
                    vals_hw, hw_p["alpha"], hw_p["beta"], hw_p["gamma"],
                    season,
                ),
            ),
        )
    )
    lt, hw = F.col("__lt"), F.col("__hw")
    jn = ((F.col("__j") + 1) % season + 3).cast("int")
    scored = base.select(
        F.col("__a"),
        quantize(F.col("__ew"), round_to).alias("__fe"),
        quantize(lt["l"] + lt["t"], round_to).alias("__fh"),
        quantize(
            F.element_at(hw, 1) + F.element_at(hw, 2) + F.element_at(hw, jn),
            round_to,
        ).alias("__fw"),
    )

    def _arm(fcol: str):
        ok = F.col(fcol).isNotNull() & F.col("__a").isNotNull()
        n = F.sum(F.when(ok, 1).otherwise(0)).cast("long")
        mae = (
            F.floor(
                F.avg(F.when(ok, F.abs(F.col(fcol) - F.col("__a"))))
                * (10.0**round_to)
                + F.lit(0.5)
            )
            / (10.0**round_to)
        )
        return n, mae

    n_e, mae_e = _arm("__fe")
    n_h, mae_h = _arm("__fh")
    n_w, mae_w = _arm("__fw")
    agg = scored.agg(
        n_e.alias("__ne"), mae_e.alias("__me"),
        n_h.alias("__nh"), mae_h.alias("__mh"),
        n_w.alias("__nw"), mae_w.alias("__mw"),
    )
    rows = F.array(
        F.struct(
            F.lit("ewma").alias("method"),
            F.col("__ne").alias("n_evals"),
            F.col("__me").alias("mae"),
        ),
        F.struct(
            F.lit("holt").alias("method"),
            F.col("__nh").alias("n_evals"),
            F.col("__mh").alias("mae"),
        ),
        F.struct(
            F.lit("holt_winters").alias("method"),
            F.col("__nw").alias("n_evals"),
            F.col("__mw").alias("mae"),
        ),
    )
    return (
        agg.select(F.explode(rows).alias("__s"))
        .select("__s.method", "__s.n_evals", "__s.mae")
        .orderBy("method")
    )


def changepoint(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-series single changepoint (binary-segmentation step 1):
    the split ``i`` minimizing the two-segment piecewise-constant SSE
    ``(Q_i - S_i^2/i) + ((Q_n - Q_i) - (S_n - S_i)^2/(n-i))`` over
    quantized prefix sums -> ``(key, n, split_i, sse_none, sse_split,
    gain)``. The level-shift detector that complements CUSUM (CUSUM
    needs a known target; this finds the most likely shift point with
    no prior) — reference scope: the anomaly surface around
    ``sts_mindist`` thresholds (src/symtseries.c:245-636 scores known
    patterns; this localizes an unknown regime change).

    Plan: ONE shuffle on the series key — the prefix sums S_i, Q_i are
    running window sums over (key, order); totals (n, S_n, Q_n) are
    FULL-FRAME window functions (count / last) over the SAME
    partitioning and the SAME quantized running sums — never a second
    independently-ordered sum, so both engines see identical totals,
    and the whole query is scan -> one Exchange -> stacked WindowExecs
    -> argmin, with no self-join (a groupBy+join formulation re-scans
    and re-shuffles the input because Spark's exchange reuse does not
    unify the differently-pruned subtrees); the argmin is a
    min(struct) with the deterministic (sse, i) tiebreak. Per the parity method, S_i/Q_i are floor-quantized the
    moment they leave the window aggregate (running-sum fold order is
    engine-internal), and every downstream expression is plain IEEE
    double arithmetic on those quantized inputs — bit-identical across
    engines. NULL values are dropped before indexing (the split index
    counts valid points, mirroring the SQL twin's WHERE). Series with
    n < 2 have no candidate split and drop out.

    At 100 TB: window pass + map-side-combinable argmin on the same
    partitioning, no pair expansion, state O(1) per row — the same
    single-shuffle shape as linear_trend/autocorrelation.
    """
    order_cols = list(order)
    w = Window.partitionBy(key).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col(value).cast("double")
    base = df.select(F.col(key), *order_cols, v.alias("__v")).where(
        F.col("__v").isNotNull()
    )
    cum = base.select(
        F.col(key),
        F.row_number().over(w).alias("__i"),
        quantize(F.sum("__v").over(run), round_to).alias("__s"),
        quantize(F.sum(F.col("__v") * F.col("__v")).over(run), round_to)
        .alias("__q"),
    )
    full = (
        Window.partitionBy(key)
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    with_tot = cum.select(
        F.col(key),
        "__i",
        "__s",
        "__q",
        F.count(F.lit(1)).over(full).alias("n"),
        F.last("__s").over(full).alias("__sn"),
        F.last("__q").over(full).alias("__qn"),
    )
    i = F.col("__i").cast("double")
    nn = F.col("n").cast("double")
    sse = (
        (F.col("__q") - F.col("__s") * F.col("__s") / i)
        + (
            (F.col("__qn") - F.col("__q"))
            - (F.col("__sn") - F.col("__s"))
            * (F.col("__sn") - F.col("__s"))
            / (nn - i)
        )
    )
    cand = (
        with_tot.where(F.col("__i") < F.col("n"))
        .select(
            F.col(key),
            F.col("n"),
            F.col("__sn"),
            F.col("__qn"),
            F.struct(
                quantize(sse, round_to).alias("__sse"),
                F.col("__i").alias("__at"),
            ).alias("__c"),
        )
    )
    best = cand.groupBy(key, "n", "__sn", "__qn").agg(
        F.min("__c").alias("__b")
    )
    sse_none = quantize(
        F.col("__qn") - F.col("__sn") * F.col("__sn") / nn, round_to
    )
    return best.select(
        key,
        "n",
        F.col("__b.__at").alias("split_i"),
        sse_none.alias("sse_none"),
        F.col("__b.__sse").alias("sse_split"),
        quantize(sse_none - F.col("__b.__sse"), round_to).alias("gain"),
    )


def stl_strength(
    stl: DataFrame,
    *,
    key: str,
    round_to: int = 6,
) -> DataFrame:
    """Hyndman-Wang strength features over an :func:`stl_decompose`
    output -> ``(key, n, trend_strength, seasonal_strength)`` with
    ``F_T = max(0, 1 - Var(R)/Var(T+R))`` and
    ``F_S = max(0, 1 - Var(R)/Var(S+R))`` (population variances).
    Variances come from quantized avg / avg-of-squares over the
    already-quantized components, so the ratios are engine-exact; a
    zero denominator yields NULL (constant component). One
    map-side-combinable aggregate on the decomposition's own series
    partitioning."""
    base = stl.select(
        F.col(key),
        F.col("resid").alias("__r"),
        (F.col("trend") + F.col("resid")).alias("__tr"),
        (F.col("seasonal") + F.col("resid")).alias("__sr"),
    )
    agg = base.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            quantize(F.avg(F.col(c)), round_to).alias(f"__m{c[2:]}")
            for c in ("__r", "__tr", "__sr")
        ],
        *[
            quantize(F.avg(F.col(c) * F.col(c)), round_to)
            .alias(f"__m{c[2:]}2")
            for c in ("__r", "__tr", "__sr")
        ],
    )
    var_r = F.col("__mr2") - F.col("__mr") * F.col("__mr")
    var_tr = F.col("__mtr2") - F.col("__mtr") * F.col("__mtr")
    var_sr = F.col("__msr2") - F.col("__msr") * F.col("__msr")
    return agg.select(
        key,
        "n",
        F.when(
            var_tr > 0,
            F.greatest(
                F.lit(0.0), quantize(F.lit(1.0) - var_r / var_tr, round_to)
            ),
        ).alias("trend_strength"),
        F.when(
            var_sr > 0,
            F.greatest(
                F.lit(0.0), quantize(F.lit(1.0) - var_r / var_sr, round_to)
            ),
        ).alias("seasonal_strength"),
    )


def changepoint_segments(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    round_to: int = 6,
) -> DataFrame:
    """Depth-2 binary segmentation per series -> one row per FOUND
    split ``(key, level, side, split_i, sse_before, sse_after, gain)``:
    level 1 is :func:`changepoint`'s root split; level 2 re-splits the
    left ``[1, s1]`` and right ``(s1, n]`` segments independently
    (side = 'root' | 'left' | 'right'). Up to three changepoints per
    series — the standard greedy multi-changepoint scheme (Scott &
    Knott), expressed relationally: a segment's SSE needs only prefix
    differences ``(Q_b - Q_a) - (S_b - S_a)^2/(b - a)``, so BOTH
    levels read the SAME quantized prefix-sum relation — no per-series
    recursion, no second scan of the input.

    Plan: the :func:`changepoint` window stack (one Exchange, stacked
    WindowExecs), then the root argmin aggregate, then ONE broadcast
    join of the tiny per-key root table back onto the prefix rows and
    a second argmin keyed by (series, side). Level-2 arithmetic runs
    on quantized prefixes and the root row's captured (S, Q) at the
    split, so every emitted number is engine-exact. Segments with
    fewer than 2 points emit no row; gains can be ~0 when a segment is
    already homogeneous — thresholding is the caller's policy.
    """
    order_cols = list(order)
    w = Window.partitionBy(key).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col(value).cast("double")
    base = df.select(F.col(key), *order_cols, v.alias("__v")).where(
        F.col("__v").isNotNull()
    )
    cum = base.select(
        F.col(key),
        F.row_number().over(w).alias("__i"),
        quantize(F.sum("__v").over(run), round_to).alias("__s"),
        quantize(F.sum(F.col("__v") * F.col("__v")).over(run), round_to)
        .alias("__q"),
    )
    full = (
        Window.partitionBy(key)
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wt = cum.select(
        F.col(key),
        "__i",
        "__s",
        "__q",
        F.count(F.lit(1)).over(full).alias("__n"),
        F.last("__s").over(full).alias("__sn"),
        F.last("__q").over(full).alias("__qn"),
    )
    i = F.col("__i").cast("double")
    nn = F.col("__n").cast("double")
    sse_root = (
        (F.col("__q") - F.col("__s") * F.col("__s") / i)
        + (
            (F.col("__qn") - F.col("__q"))
            - (F.col("__sn") - F.col("__s"))
            * (F.col("__sn") - F.col("__s"))
            / (nn - i)
        )
    )
    root = (
        wt.where(F.col("__i") < F.col("__n"))
        .select(
            F.col(key),
            F.col("__n"),
            F.col("__sn"),
            F.col("__qn"),
            F.struct(
                quantize(sse_root, round_to).alias("__sse"),
                F.col("__i").alias("__at"),
                F.col("__s").alias("__sx"),
                F.col("__q").alias("__qx"),
            ).alias("__c"),
        )
        .groupBy(key, "__n", "__sn", "__qn")
        .agg(F.min("__c").alias("__b"))
        .select(
            F.col(key),
            F.col("__n").alias("__rn"),
            F.col("__sn").alias("__rsn"),
            F.col("__qn").alias("__rqn"),
            F.col("__b.__sse").alias("__rsse"),
            F.col("__b.__at").alias("__s1"),
            F.col("__b.__sx").alias("__s1s"),
            F.col("__b.__qx").alias("__s1q"),
        )
    )
    sse_none = quantize(
        F.col("__rqn")
        - F.col("__rsn") * F.col("__rsn") / F.col("__rn").cast("double"),
        round_to,
    )
    root_rows = root.select(
        F.col(key),
        F.lit(1).alias("level"),
        F.lit("root").alias("side"),
        F.col("__s1").alias("split_i"),
        sse_none.alias("sse_before"),
        F.col("__rsse").alias("sse_after"),
        quantize(sse_none - F.col("__rsse"), round_to).alias("gain"),
    )
    # level 2: segment-local candidates over the SAME prefix relation.
    # Prefix offsets (a_s, a_q, a_i) are (0,0,0) left of the root split
    # and the root row's captured (S,Q,i) right of it; b_* are the
    # segment's right boundary prefixes.
    j = cum.join(F.broadcast(root), key)
    is_left = F.col("__i") < F.col("__s1")
    a_i = F.when(is_left, F.lit(0)).otherwise(F.col("__s1"))
    a_s = F.when(is_left, F.lit(0.0)).otherwise(F.col("__s1s"))
    a_q = F.when(is_left, F.lit(0.0)).otherwise(F.col("__s1q"))
    b_i = F.when(is_left, F.col("__s1")).otherwise(F.col("__rn"))
    b_s = F.when(is_left, F.col("__s1s")).otherwise(F.col("__rsn"))
    b_q = F.when(is_left, F.col("__s1q")).otherwise(F.col("__rqn"))
    li = (F.col("__i") - a_i).cast("double")
    ri = (b_i - F.col("__i")).cast("double")
    seg_sse_before = quantize(
        (b_q - a_q) - (b_s - a_s) * (b_s - a_s) / (b_i - a_i).cast("double"),
        round_to,
    )
    sse2 = (
        ((F.col("__q") - a_q) - (F.col("__s") - a_s) * (F.col("__s") - a_s) / li)
        + (
            (b_q - F.col("__q"))
            - (b_s - F.col("__s")) * (b_s - F.col("__s")) / ri
        )
    )
    cand2 = j.where(
        (F.col("__i") != F.col("__s1")) & (F.col("__i") < b_i)
    ).select(
        F.col(key),
        F.when(is_left, F.lit("left")).otherwise(F.lit("right")).alias("side"),
        seg_sse_before.alias("sse_before"),
        F.struct(
            quantize(sse2, round_to).alias("__sse"),
            F.col("__i").alias("__at"),
        ).alias("__c"),
    )
    seg_rows = (
        cand2.groupBy(key, "side", "sse_before")
        .agg(F.min("__c").alias("__b"))
        .select(
            F.col(key),
            F.lit(2).alias("level"),
            "side",
            F.col("__b.__at").alias("split_i"),
            "sse_before",
            F.col("__b.__sse").alias("sse_after"),
            quantize(F.col("sse_before") - F.col("__b.__sse"), round_to)
            .alias("gain"),
        )
    )
    return root_rows.unionByName(seg_rows)


def page_hinkley(
    df: DataFrame,
    *,
    key: str,
    order: Sequence[str],
    value: str,
    delta: float,
    lam: float,
    round_to: int = 6,
) -> DataFrame:
    """Page-Hinkley drift test per series: the adaptive-mean CUSUM.
    ``m_t = sum_{i<=t} (x_i - mean_i - delta)`` with ``mean_i`` the
    RUNNING mean, ``PH_t = m_t - min_{i<=t} m_i``, alarm when
    ``PH_t > lam`` -> input rows + ``(ph, alarm)``. Where
    :func:`cusum` needs a known target level, Page-Hinkley estimates
    it as it goes — the drift monitor you can deploy on series with
    unknown baselines.

    Plan: ONE Exchange on the series key and three stacked window
    passes over the same partitioning (running avg -> running sum of
    the term -> running min); no joins, no recursion (the O(1)-state
    recursion is the streaming twin's job,
    :func:`streaming.timeseries.page_hinkley_stream`).

    Parity: the statistic runs in EXACT INTEGER MICRO-UNITS end to
    end. Values are floor-quantized ONCE to BIGINT micro counts
    (stable: raw data sits off the half-micro boundary), the running
    mean is the INTEGER-DIVISION round ``(2*sx + n) div (2n)`` of the
    integer running sum (never a float ratio: a float mean quantized
    at 1e-6 lands EXACTLY on half-micro boundaries whenever the
    prefix count has a factor like 32 — measured 335/10k flipped
    digits between engines), and the term sum / running min / alarm
    compare are int64 arithmetic — bit-identical in any engine and
    any summation order. Only the final emitted ``ph`` divides back
    to a double. Nonnegative-value domain assumed (integer division
    conventions agree there). NULL values contribute nothing and
    carry the running statistic unchanged (the cusum convention).
    """
    if lam <= 0:
        raise ValueError("page_hinkley needs lam > 0")
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scale = float(10 ** round_to)
    x = F.col(value).cast("double")
    v_int = F.floor(x * scale + F.lit(0.5)).cast("long")
    delta_int = F.lit(int(round(float(delta) * scale)))
    with_s = df.withColumn("__vi", v_int).withColumn(
        "__sx", F.sum("__vi").over(w)
    ).withColumn("__n", F.count("__vi").over(w))
    mean_int = F.expr("(2 * __sx + __n) div (2 * __n)")
    term = F.when(
        F.col("__vi").isNotNull(), F.col("__vi") - mean_int - delta_int
    )
    with_m = with_s.withColumn("__t", term).withColumn(
        "__m", F.sum("__t").over(w)
    )
    ph_int = F.col("__m") - F.min("__m").over(w)
    lam_int = int(round(float(lam) * scale))
    return (
        with_m.withColumn("ph", ph_int.cast("double") / F.lit(scale))
        .withColumn("alarm", ph_int > F.lit(lam_int))
        .drop("__vi", "__sx", "__n", "__t", "__m")
    )
