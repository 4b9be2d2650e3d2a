"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

bench.py is FROZEN for measurement; this file holds the iteration harness:
per-query timing with the same methodology (pinned fresh process, warm-up
+ min-of-N), optional noop-sink isolation, and .explain("formatted")
capture for plans/r06/.

Usage:
    python bench_extra.py queries tpch_q1 minhash_lsh      # subset
    python bench_extra.py queries --all                    # all 13
    python bench_extra.py assign [replicate]               # assign_geo
    python bench_extra.py knn                              # kernel only
    python bench_extra.py hugeworld
    python bench_extra.py explain <name> <outfile>         # plan dump

Each prints one JSON line per query: {"name": ..., "sec": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pin(cores: int) -> None:
    try:
        total = os.cpu_count() or cores
        os.sched_setaffinity(0, set(range(max(0, total - cores), total)))
    except (AttributeError, OSError, ValueError):
        pass


def build_session(cores: int):
    from tzengine.session import get_spark

    return get_spark(
        f"tzengine-bench-extra-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(2, cores),
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.execution.arrow.maxRecordsPerBatch": os.environ.get(
                "SPARK_GRAFT_ARROW_BATCH", "131072"
            ),
        },
    )


def timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def measure(spark, name, run, n_timed=3):
    spark.sparkContext.setJobDescription(f"bench_extra: {name}")
    run()  # warm-up
    el = min(timed(run) for _ in range(n_timed))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"name": name, "sec": round(el, 3),
                      "loadavg": round(os.getloadavg()[0], 2)}), flush=True)
    return el


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_queries(names, noop=False):
    _pin(CORES)
    spark = build_session(CORES)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        if noop:
            measure(spark, name, lambda f=fn: _noop(f(spark, SF_DIR)))
        else:
            measure(spark, name, lambda f=fn: f(spark, SF_DIR).count())
    spark.stop()


def run_assign(replicate=10, impl=None):
    _pin(CORES)
    spark = build_session(CORES)
    from bench import assign_job

    if impl:
        os.environ["SPARK_GRAFT_PROBE_IMPL"] = impl
    el, n, _ = assign_job(spark, SF_DIR, CORES, replicate=replicate)
    print(json.dumps({"name": "assign_geo", "sec": round(el, 3),
                      "rows": n, "rows_per_sec": round(n / el)}), flush=True)
    spark.stop()


def run_world454():
    _pin(CORES)
    spark = build_session(CORES)
    from pyspark.sql import functions as F

    from bench import probe_points
    from tzengine.bigworld import big_world
    from tzengine.engine import TzEngine

    eng = TzEngine.for_everywhere(spark, big_world(), world_version="big1")
    pts = (
        probe_points(spark, SF_DIR)
        .select((F.col("lat") * 12.0 - 60.0).alias("lat"),
                (F.col("lon") * 12.0 - 60.0).alias("lon"))
        .repartition(CORES).cache()
    )
    n = pts.count()
    out = eng.assign_timezones(pts, mode="strict")
    el = measure(spark, "assign_world454",
                 lambda: out.groupBy("tzid").count().collect())
    print(json.dumps({"name": "assign_world454_rps", "rows_per_sec": round(n / el)}),
          flush=True)
    spark.stop()


def run_first_only():
    _pin(CORES)
    spark = build_session(CORES)
    from bench import probe_points
    from tzengine.engine import TzEngine
    from tzengine.zones import synthetic_world

    eng = TzEngine.for_everywhere(spark, synthetic_world(), world_version="synth1")
    pts = probe_points(spark, SF_DIR).repartition(CORES).cache()
    pts.count()
    out = eng.assign_timezones(pts, mode="strict", include_all=False)
    measure(spark, "assign_first_only",
            lambda: out.groupBy("tzid").count().collect())
    spark.stop()


def run_knn(n_pts=20000, k=3):
    _pin(CORES)
    import numpy as np

    from tzengine import index as indexmod, probe as probemod
    from tzengine.bigworld import big_world

    idx = indexmod.compile_index(big_world(), -90, -180, 90, 180, "big1")
    rng = np.random.default_rng(3)
    lats = rng.uniform(-60, 60, n_pts)
    lons = rng.uniform(-60, 60, n_pts)
    probemod.knn_zones_batch(idx, lats, lons, k=k)  # warm-up
    best = min(
        timed(lambda: probemod.knn_zones_batch(idx, lats, lons, k=k))
        for _ in range(2)
    )
    print(json.dumps({"name": "knn_kernel", "sec": round(best, 3),
                      "rows_per_sec": round(n_pts / best)}), flush=True)


def run_hugeworld():
    _pin(CORES)
    import subprocess

    res = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "bench.py"), "--hugeworld-only",
         str(CORES), SF_DIR],
        capture_output=True, text=True, timeout=2400,
    )
    for line in reversed(res.stdout.strip().splitlines()):
        if line.startswith("{"):
            print(line)
            return
    print(res.stdout[-2000:], res.stderr[-2000:])


def dump_explain(name, outfile):
    _pin(CORES)
    spark = build_session(CORES)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    df = qs[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(outfile, "w") as f:
        f.write(plan)
    print(f"wrote {outfile} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        args = sys.argv[2:]
        noop = "--noop" in args
        args = [a for a in args if not a.startswith("--")]
        if not args:
            args = [
                "tpch_q1", "topk_per_group", "bbox_agg", "pip_assign_rect",
                "dedup_exact", "minhash_lsh", "ann_topk", "explode_tokens",
            ]
        run_queries(args, noop=noop)
    elif mode == "assign":
        rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        run_assign(rep, impl=(sys.argv[3] if len(sys.argv) > 3 else None))
    elif mode == "world454":
        run_world454()
    elif mode == "first_only":
        run_first_only()
    elif mode == "knn":
        run_knn()
    elif mode == "hugeworld":
        run_hugeworld()
    elif mode == "explain":
        dump_explain(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown mode {mode}")
