"""Local mirror of the driver's correctness check: run each
__spark_entry__.queries() entry and its oracle_sql() through DuckDB at a
given sf, compare row-count + column names + order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]

Every full run (no query filter) also tees its report — including the
first differing row of any hash mismatch — to ORACLE_DIFF.md at the repo
root (VERDICT r4 #5: a red driver row must come with its first differing
row committed in the repo, not just a bare hash_match=false)."""

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    report: list[str] = []

    def emit(msg: str) -> None:
        print(msg)
        report.append(msg)

    from tzengine.session import get_spark

    spark = get_spark("check_entry", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:  # noqa: BLE001
            emit(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            emit(f"rows  {name}: {len(rows)} rows, {len(cols)} cols ({el:.1f}s) [rows-only]")
            if len(rows) == 0 and name != "noop":
                emit(f"      WARNING: zero rows from {name}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            emit(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ok_n = len(rows) == len(orows)
        ok_c = sorted(cols) == sorted(ocols)
        ok_h = False
        if ok_n and ok_c:
            ok_h = table_hash(rows, cols) == table_hash(orows, ocols)
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        emit(
            f"{status}  {name}: spark {len(rows)}x{len(cols)} vs duck "
            f"{len(orows)}x{len(ocols)} cols_match={ok_c} hash_match={ok_h} ({el:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_n and ok_c and not ok_h:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                a = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                b = sorted("\x1f".join(norm_cell(r[i]) for i in oorder) for r in orows)
                for x, y in zip(a, b):
                    if x != y:
                        emit(f"      spark: {x[:200]}")
                        emit(f"      duck : {y[:200]}")
                        break
    # entry smoke
    t0 = time.time()
    edf = entrymod.entry(spark)
    erows = edf.collect()
    emit(f"entry: {len(erows)} rows ({time.time()-t0:.1f}s) schema={edf.columns}")
    emit(f"FAILURES: {failures or 'none'}")
    spark.stop()
    if only is None:
        # tee the full-run report so any red row's first differing values
        # are a committed artifact (VERDICT r4 #5)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo_root, "ORACLE_DIFF.md"), "w") as f:
            f.write(
                "# ORACLE_DIFF — last full local driver-mirror run\n\n"
                f"sf_dir: `{sf_dir}`\n\n```\n" + "\n".join(report) + "\n```\n"
            )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
