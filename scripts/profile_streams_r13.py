#!/usr/bin/env python3
"""Round-13 streaming-family profiler (VERDICT r12 item #1).

For each named streaming query: time the declared query function
end-to-end (the bench number), and split the wall into
  - pre-stream setup (staging writes, scalar aggs) = time until the
    StreamingQuery object exists,
  - stream replay = start() .. stop() wall,
  - post-stream (the final batch aggregation over the memory sink +
    noop drain),
and dump the per-micro-batch ``durationMs`` breakdown from
``StreamingQuery.recentProgress`` (addBatch / getBatch / queryPlanning /
triggerExecution / walCommit / commitOffsets / stateful operator
metrics) so "micro-batch floor" stops being a guess.

Implementation: monkey-patch DataStreamWriter.start and
StreamingQuery.processAllAvailable/stop to capture timestamps and
progress without touching the query functions themselves.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

import __spark_entry__ as E
from symtseries_spark.cache import release_persisted

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("profile-streams-r13")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config(
        "spark.driver.extraJavaOptions",
        "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
    )
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from symtseries_spark.sources import load  # noqa: E402

load(spark, SF, "events").limit(1000).write.format("noop").mode("overwrite").save()

# one streaming-machinery warm, like the bench
import tempfile
import uuid

from symtseries_spark.streaming.dedup import streaming_exact_dedup

wdir = tempfile.mkdtemp(prefix="prof_warm_")
docs = load(spark, SF, "documents").select("doc_id", "text").limit(256)
docs.coalesce(1).write.parquet(f"{wdir}/in")
wstream = streaming_exact_dedup(
    spark.readStream.schema(docs.schema).parquet(f"{wdir}/in")
)
wq = (
    wstream.writeStream.format("memory")
    .queryName(f"warm_{uuid.uuid4().hex[:8]}")
    .outputMode("append")
    .option("checkpointLocation", f"{wdir}/chk")
    .start()
)
wq.processAllAvailable()
wq.stop()

CAP = {}


def _patch():
    orig_start = DataStreamWriter.start
    orig_stop = StreamingQuery.stop

    def start(self, *a, **kw):
        CAP["t_start"] = time.perf_counter()
        q = orig_start(self, *a, **kw)
        CAP["q"] = q
        return q

    def stop(self):
        CAP.setdefault("t_stop", time.perf_counter())
        try:
            CAP["progress"] = [json.loads(str(p)) for p in self.recentProgress]
        except Exception as ex:
            CAP["progress_err"] = str(ex)
        return orig_stop(self)

    DataStreamWriter.start = start
    StreamingQuery.stop = stop
    return orig_start, orig_stop


def _unpatch(saved):
    DataStreamWriter.start, StreamingQuery.stop = saved


qdict = E.queries()
for name in sys.argv[1:]:
    fn = qdict[name]
    CAP.clear()
    saved = _patch()
    t0 = time.perf_counter()
    df = fn(spark, SF)
    t_built = time.perf_counter()
    if "progress" not in CAP and CAP.get("q") is not None:
        # self-terminating streams (listener-stopped) never route
        # through the patched stop — read progress off the handle
        try:
            CAP["progress"] = [
                json.loads(str(p)) for p in CAP["q"].recentProgress
            ]
            CAP.setdefault("t_stop", t_built)
        except Exception as ex:
            CAP["progress_err"] = str(ex)
    df.write.format("noop").mode("overwrite").save()
    t_end = time.perf_counter()
    _unpatch(saved)
    release_persisted()

    total = t_end - t0
    setup = CAP.get("t_start", t_built) - t0
    replay = CAP.get("t_stop", CAP.get("t_start", t_built)) - CAP.get("t_start", t_built)
    post = t_end - CAP.get("t_stop", t_built)
    print(f"\n=== {name}: total {total:.2f}s  setup {setup:.2f}s  "
          f"replay {replay:.2f}s  post(build+drain) {post:.2f}s  "
          f"(load={open('/proc/loadavg').read().split()[0]})")
    prog = CAP.get("progress") or []
    print(f"  micro-batches: {len(prog)}")
    for p in prog:
        d = p.get("durationMs", {})
        rows = p.get("numInputRows")
        ops = p.get("stateOperators") or []
        st = ""
        if ops:
            o = ops[0]
            st = (f" stateRows={o.get('numRowsTotal')}"
                  f" commitMs={o.get('allUpdatesTimeMs', 0) + o.get('commitTimeMs', 0)}")
        print(f"   batch {p.get('batchId')}: rows={rows} trigger={d.get('triggerExecution')}ms "
              f"addBatch={d.get('addBatch')}ms getBatch={d.get('getBatch')}ms "
              f"latestOffset={d.get('latestOffset')}ms plan={d.get('queryPlanning')}ms "
              f"wal={d.get('walCommit')}ms commitOff={d.get('commitOffsets')}ms{st}")
spark.stop()
