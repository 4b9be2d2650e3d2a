"""Profiling harness for the probe path (not part of the bench contract).

Measures, separately:
  1. pure numpy kernel throughput (probe_arrow) on one core
  2. the pandas-UDF wrapper cost (same batches through the UDF body)
  3. Spark end-to-end assign throughput at local[N]

Usage: python scripts/profile_probe.py [cores ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def kernel_only(n_batches=20, batch=131072):
    from tzengine.engine import TzEngine  # noqa: F401 (import parity)
    from tzengine.index import compile_index
    from tzengine.zones import synthetic_world
    from tzengine import probe as probemod, cells as cellmod

    idx = compile_index(synthetic_world(), -90, -180, 90, 180, "synth1")
    rng = np.random.default_rng(0)
    lats = rng.uniform(0, 9.935, size=batch)
    lons = rng.uniform(0, 9.965, size=batch)
    # warm
    probemod.probe_arrow(idx, lats, lons, mode="strict")
    t0 = time.time()
    for _ in range(n_batches):
        probemod.probe_arrow(idx, lats, lons, mode="strict")
    el = time.time() - t0
    print(f"kernel probe_arrow: {n_batches * batch / el / 1e6:.2f}M rows/s/core")

    # stage breakdown
    for name, fn in [
        ("probe_ranks", lambda: probemod.probe_ranks(idx, lats, lons, "strict")),
        ("cell_of(res7)", lambda: cellmod.cell_of(lons, lats, 7)),
    ]:
        fn()
        t0 = time.time()
        for _ in range(n_batches):
            fn()
        el = time.time() - t0
        print(f"  {name}: {n_batches * batch / el / 1e6:.2f}M rows/s/core")


def spark_assign(cores: int):
    from bench import build_session, assign_job

    s = build_session(cores)
    el, n = assign_job(s, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), cores)
    s.stop()
    print(f"spark local[{cores}]: {n / el / 1e6:.2f}M rows/s  ({el:.3f}s, {n} rows)")
    return n / el


if __name__ == "__main__":
    kernel_only()
    rates = {}
    for c in [int(x) for x in (sys.argv[1:] or ["2", "8"])]:
        rates[c] = spark_assign(c)
    if 2 in rates and 8 in rates:
        print(f"eff 2->8: {rates[8] / (4 * rates[2]):.3f}")
