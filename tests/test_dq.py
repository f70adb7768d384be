"""Data-quality constraint audit (operators/dq.py) — hand-computed
batteries on tiny frames, comparator/validation errors, and the
FK orphan audit's null/duplicate-parent semantics."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators.dq import (
    Check,
    audit,
    check_completeness,
    check_distinctness,
    check_in_set,
    check_max,
    check_min,
    check_predicate,
    check_regex,
    referential_orphans,
)


@pytest.fixture(scope="module")
def frame(spark):
    # 5 rows: one null name, one dup id, one out-of-set lang,
    # one regex miss, one broken cross-column rule
    return spark.createDataFrame(
        [
            Row(id=1, name="alpha", lang="en", n=5, text="alpha"),
            Row(id=2, name=None, lang="en", n=4, text="beta"),
            Row(id=3, name="gamma", lang="xx", n=5, text="gamma"),
            Row(id=3, name="delta", lang="de", n=5, text=" pad"),
            Row(id=5, name="eps", lang="fr", n=99, text="epsi"),
        ]
    )


def test_audit_metrics_hand_computed(frame):
    rows = {
        (r["check_name"], r["col_name"]): r
        for r in audit(
            frame,
            [
                check_completeness("name"),
                check_distinctness("id"),  # 4 distinct / 5 rows
                check_min("n", 1.0),
                check_max("n", 10.0),
                check_in_set("lang", ["en", "de", "fr"]),
                check_regex("text", r"^\S", 0.99),
                check_predicate(
                    "len_match", "n", F.length("text") == F.col("n"), 1.0
                ),
            ],
        ).collect()
    }
    assert len(rows) == 7
    c = rows[("completeness", "name")]
    assert c["metric"] == 4 / 5 and c["passed"] is False
    d = rows[("distinctness", "id")]
    assert d["metric"] == 4 / 5 and d["passed"] is False
    lo = rows[("min", "n")]
    assert lo["metric"] == 4.0 and lo["passed"] is True
    hi = rows[("max", "n")]
    assert hi["metric"] == 99.0 and hi["passed"] is False
    s = rows[("in_set", "lang")]
    assert s["metric"] == 4 / 5 and s["passed"] is False
    r = rows[("regex", "text")]
    assert r["metric"] == 4 / 5 and r["passed"] is False
    p = rows[("len_match", "n")]
    # alpha(5==5), beta(4==4), gamma(5==5), " pad"(4!=5), epsi(4!=99)
    assert p["metric"] == 3 / 5 and p["passed"] is False


def test_audit_all_pass_and_le_threshold(frame):
    rows = audit(
        frame.where(F.col("name").isNotNull()),
        [check_completeness("name"), check_max("n", 99.0)],
    ).collect()
    assert all(r["passed"] for r in rows)


def test_audit_null_metric_fails_closed(spark):
    # min over an all-null column -> null metric -> passed stays null
    df = spark.createDataFrame([Row(v=None)], "v: int")
    (r,) = audit(df, [check_min("v", 0.0)]).collect()
    assert r["metric"] is None and r["passed"] is None


def test_audit_validation_errors(frame):
    with pytest.raises(ValueError, match="at least one"):
        audit(frame, [])
    with pytest.raises(ValueError, match="comparator"):
        audit(frame, [Check("x", "n", F.min("n"), "gt", 0.0)])
    with pytest.raises(ValueError, match="duplicate"):
        audit(frame, [check_min("n", 0.0), check_min("n", 1.0)])


def test_referential_orphans_hand_computed(spark):
    child = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=2), Row(k=7), Row(k=None)]
    )
    # duplicate parent key must NOT fan the child out
    parent = spark.createDataFrame([Row(p=1), Row(p=1), Row(p=2), Row(p=3)])
    (r,) = referential_orphans(
        [("c->p", child, "k", parent, "p")]
    ).collect()
    assert (r["edge"], r["n_child"], r["n_null_keys"], r["n_orphans"]) == (
        "c->p",
        5,
        1,
        1,
    )


def test_referential_orphans_multiple_edges(spark):
    child = spark.createDataFrame([Row(k=1), Row(k=9)])
    parent = spark.createDataFrame([Row(p=1)])
    out = referential_orphans(
        [
            ("e1", child, "k", parent, "p"),
            ("e2", parent, "p", child, "k"),
        ]
    ).collect()
    by = {r["edge"]: r for r in out}
    assert by["e1"]["n_orphans"] == 1 and by["e2"]["n_orphans"] == 0
    with pytest.raises(ValueError, match="at least one edge"):
        referential_orphans([])


def test_audit_streaming_complete_mode_accumulates(spark, tmp_path):
    """The battery is ONE global agg, so it runs on a stream in
    complete mode; after two micro-batches the metrics equal the
    batch audit over the union."""
    import time as _time

    b0 = [(1, "alpha", 5), (2, None, 4)]
    b1 = [(3, "beta", 4), (4, "x", 99)]
    in_dir = str(tmp_path / "in")
    import os

    os.makedirs(in_dir)
    spark.createDataFrame(
        b0, "id long, name string, n long"
    ).coalesce(1).write.parquet(f"{in_dir}/b0")
    _time.sleep(1.1)
    spark.createDataFrame(
        b1, "id long, name string, n long"
    ).coalesce(1).write.parquet(f"{in_dir}/b1")
    stream = (
        spark.readStream.schema("id long, name string, n long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/b*")
    )
    checks = [check_completeness("name"), check_max("n", 10.0)]
    q = (
        audit(stream, checks)
        .writeStream.format("memory")
        .queryName("dq_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["check_name"], r["col_name"]): (r["metric"], r["passed"])
        for r in spark.sql("SELECT * FROM dq_stream_test").collect()
    }
    batch = spark.createDataFrame(
        b0 + b1, "id long, name string, n long"
    )
    want = {
        (r["check_name"], r["col_name"]): (r["metric"], r["passed"])
        for r in audit(batch, checks).collect()
    }
    assert got == want
    assert got[("completeness", "name")] == (3 / 4, False)
    assert got[("max", "n")] == (99.0, False)
