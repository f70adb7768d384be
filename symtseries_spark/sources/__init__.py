"""Table loaders for the driver's testdata layout.

One parquet file per table under ``{sf_dir}/{name}.parquet``. Reads are
plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning, and partition coalescing; never collect here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
