#!/usr/bin/env python3
"""Round-13 optimization measurement harness.

For each query name given on argv: replicate the bench protocol
(fresh-ish session, warm the SAME plan at sf0.001, then time
construction + noop drain at $SPARK_GRAFT_SF_DIR), and dump
``.explain("formatted")`` to ``plans/r13/<query>_<tag>.txt``.

Usage: measure_r13.py [--tag before|after] [--no-plan] q1 q2 ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from symtseries_spark.cache import release_persisted

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

args = sys.argv[1:]
tag = "before"
if "--tag" in args:
    i = args.index("--tag")
    tag = args[i + 1]
    del args[i : i + 2]
noplan = "--no-plan" in args
if noplan:
    args.remove("--no-plan")
reps = 1
if "--reps" in args:
    i = args.index("--reps")
    reps = int(args[i + 1])
    del args[i : i + 2]

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("measure-r13")
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

qdict = E.queries()
warm_sf = os.path.join(os.path.dirname(SF.rstrip("/")), "sf0.001")
plandir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
os.makedirs(plandir, exist_ok=True)

for name in args:
    fn = qdict[name]
    is_stream = "stream" in name or name == "events_late_drop"
    if not is_stream and os.path.isdir(warm_sf):
        try:
            fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
        except Exception as ex:
            print(f"[measure] warm {name} FAILED: {ex}", file=sys.stderr)
        release_persisted()
    for rep in range(reps):
        spark.sparkContext.setJobDescription(f"{name} timed")
        t0 = time.perf_counter()
        df = fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if not noplan and rep == 0:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plandir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        release_persisted()
        print(f"[measure] {name}: {dt:.3f}s  (load={open('/proc/loadavg').read().split()[0]})")
spark.stop()
