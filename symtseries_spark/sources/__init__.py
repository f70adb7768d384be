"""Table loaders for the driver's testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet``. Reads are
plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning, and partition coalescing; never collect here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    # rejects; read it as raw nanosecond longs instead. Ordering (its only
    # role in the engine) is identical to the native nanosecond timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_series(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Generic long-form series loader for parquet / csv / json sources.

    CSV/JSON require an explicit ``schema`` (DDL string) — schema
    inference needs an extra full scan and produces drifting types, both
    wrong at 100 TB. Readers stay declarative so Catalyst keeps
    predicate pushdown and column pruning (CSV/JSON prune columns and
    push filters at the parser level; parquet also skips row groups).
    """
    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} sources require an explicit schema")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_words_bucketed(
    words: DataFrame,
    path: str,
    *,
    c: int,
    coarse_c: int = 2,
    word_col: str = "sax_word",
    mode: str = "overwrite",
) -> None:
    """Sink: persist a word table partitioned by its iSAX coarse bucket
    (``isax_bucket=<coarse word>/`` directories). At rest this is the
    iSAX prefix-tree root level: similarity queries that prune on the
    coarse bucket (:func:`..operators.search.isax_topk`'s prefilter)
    become PARTITION-PRUNED scans — Spark reads only the matching
    directories, ~1/coarse_c^w of the data, before any row is touched.
    """
    from ..functions.sax import sax_coarsen

    (
        words.withColumn("isax_bucket", sax_coarsen(F.col(word_col), c, coarse_c))
        .write.mode(mode)
        .partitionBy("isax_bucket")
        .parquet(path)
    )


def read_words_bucket(
    spark: SparkSession,
    path: str,
    pattern: str,
    *,
    c: int,
    coarse_c: int = 2,
) -> DataFrame:
    """Read back only the iSAX bucket matching ``pattern``'s coarse form
    — the filter lands on the partition column, so non-matching
    directories are never opened (check ``PartitionFilters`` in the
    scan node)."""
    from .. import pykernel as pk

    coarse = pk.coarsen(pattern, c, coarse_c)
    return spark.read.parquet(path).where(F.col("isax_bucket") == coarse)
