"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship geo pipeline on sf0.001. ``queries`` maps
every operator family from SURVEY.md §2 (+ the training-data pipeline
ops) to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql`` gives a
DuckDB mirror for EVERY query (round 4: 42/42 value-oracled, zero
rows-only). Ops that are not directly ANSI-SQL-expressible are verified
by one of two techniques:

- STAGE-ORACLES: the Spark query materializes its non-SQL-portable
  intermediate (xxhash64/pandas-UDF signatures, decoded pixels/samples/
  frames, FFT spectra) to Parquet, and the oracle reads the SAME bytes
  with read_parquet and mirrors all downstream logic by value — the
  non-portable computation itself stays pytest-pinned (reference
  goldens, real-pixel/tone fixtures, bit-exact round-trips).
- ITERATIVE MIRRORS: the WGS84 Vincenty inverse runs as a recursive CTE
  (fixed-iteration variant; cross-engine agreement <= 5e-10 m), with
  floor-quantized integer outputs where libm ulps preclude bit equality.

Column names are aliased identically on both sides; float-producing
expressions use the same IEEE double arithmetic in both engines
(sequential folds mirrored with list_reduce; floor() quantization —
never round(), whose half-up implementations differ).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tzengine.engine import TzEngine
from tzengine.zones import synthetic_world, make_piece, _rect

_ENGINES: dict = {}


def _engine(spark: SparkSession) -> TzEngine:
    key = ("world", id(spark))
    if key not in _ENGINES:
        _ENGINES[key] = TzEngine.for_everywhere(
            spark, synthetic_world(), world_version="synth1"
        )
    return _ENGINES[key]


def _rect_engine(spark: SparkSession) -> TzEngine:
    """Rectangle-only zone world — PIP over rectangles is expressible as
    BETWEEN predicates, giving the core spatial-join operator a DuckDB
    oracle (inclusivity semantics match: on-edge is inside both ways)."""
    key = ("rect", id(spark))
    if key not in _ENGINES:
        pieces = [
            make_piece("Zone/Small", 0, 0, [_rect(4, 4, 5, 5)]),
            make_piece("Zone/Big", 0, 1, [_rect(3, 3, 6, 6)]),
            make_piece("Zone/Filler", 0, 2, [_rect(0, 0, 10, 10)]),
        ]
        _ENGINES[key] = TzEngine.for_everywhere(
            spark, pieces, world_version="rect1"
        )
    return _ENGINES[key]


def _events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic probe points derived from the events table (same
    arithmetic as the DuckDB oracle)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        ((F.col("event_id") % 1987) / 200.0).alias("lat"),
        ((F.col("event_id") * 7 % 1993) / 200.0).alias("lon"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geo broadcast-index join over sf0.001-derived points →
    per-zone counts with hot-cell stats."""
    pts = _events_points(spark, "/root/testdata/sf0.001")
    assigned = _engine(spark).assign_timezones(pts, mode="pipeline")
    return (
        assigned.groupBy("tzid")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("cell_id").alias("n_cells"),
            F.countDistinct("zone_shard").alias("n_shards"),
        )
        .orderBy("tzid")
    )


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------


def q_pip_assign_rect(spark, sf_dir):
    """Core operator (SURVEY Q1/Q4): broadcast spatial join, rect world."""
    pts = _events_points(spark, sf_dir)
    out = _rect_engine(spark).assign_timezones(pts, mode="strict")
    return out.select("event_id", "lat", "lon", "tzid")


def q_pip_assign_first_and_all(spark, sf_dir):
    """Q1+Q2 together on the rect world: tzid == head of tzids, plus the
    overlap count (array ops are hashable as a sorted join string)."""
    pts = _events_points(spark, sf_dir)
    out = _rect_engine(spark).assign_timezones(pts, mode="strict")
    return out.select(
        "event_id",
        "tzid",
        F.concat_ws("|", "tzids").alias("tzids_str"),
        F.size("tzids").alias("n_zones"),
    )


def q_pip_assign_first_only(spark, sf_dir):
    """Q1-only fast path (reference getOverlappingTimeZone via
    include_all=False): the rank LIST is neither built nor serialized
    across the Arrow boundary — a strictly narrower plan whose tzid must
    still match the full-path oracle exactly."""
    pts = _events_points(spark, sf_dir)
    out = _rect_engine(spark).assign_timezones(
        pts, mode="strict", include_all=False
    )
    return out.select("event_id", "tzid").orderBy("event_id")


def q_bbox_agg(spark, sf_dir):
    """SURVEY B6/I9: bounding-box min/max aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_discount").alias("min_disc"),
            F.max("l_discount").alias("max_disc"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q_envelope_prune(spark, sf_dir):
    """SURVEY I5/O1: interval-overlap prune filter (pushdown-friendly)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lo, hi = 50000.0, 100000.0
    return (
        o.filter(
            ~((F.col("o_totalprice") + 1000.0 < lo) | (F.col("o_totalprice") > hi))
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def q_area_rank(spark, sf_dir):
    """SURVEY I11: area-ascending rank with stable ordinal tie-break."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    return p.select(
        "p_brand", "p_partkey", "p_retailprice",
        F.row_number().over(w).alias("area_rank"),
    )


def q_topk_per_group(spark, sf_dir):
    """SURVEY Q1 top-1-under-sort generalized: top-3 orders per status."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "rk")
    )


def q_salted_count(spark, sf_dir):
    """SURVEY §4.3 skew handling: salted two-phase count == plain count."""
    from tzengine.functions import salted_count

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return salted_count(li, ["l_returnflag"], salt_src="l_orderkey").orderBy(
        "l_returnflag"
    )


def q_explode_tokens(spark, sf_dir):
    """SURVEY B2 explode + pipeline token_count."""
    from tzengine.pipeline.text import token_count

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_count(d).select("doc_id", "n_tokens", "n_tokens_bpe").orderBy("doc_id")


def q_dedup_exact(spark, sf_dir):
    from tzengine.pipeline.dedup import exact_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(d).orderBy("content_hash")


def q_ngram_jaccard(spark, sf_dir):
    from tzengine.pipeline.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(d, threshold=0.8).orderBy("id_a", "id_b")


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the exact n-gram near-dup pairs: every
    doc mapped to the min id of its duplicate cluster (iterative label
    propagation — the keep/drop decision step of a dedup pipeline)."""
    from tzengine.pipeline.dedup import dedup_clusters, ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(d, threshold=0.8)
    return dedup_clusters(d.select("doc_id"), pairs).orderBy("doc_id")


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-k (double-precision both sides; rank only —
    no float column in the compared output)."""
    from tzengine.pipeline.similarity import brute_force_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return (
        brute_force_topk(e, q, k=5)
        .select("query_id", "vec_id", "rank")
        .orderBy("query_id", "rank")
    )


def q_quality_score(spark, sf_dir):
    from tzengine.pipeline.text import quality_score

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_score(d).select(
        "doc_id", F.col("n_words").cast("long").alias("n_words"), "quality_score"
    ).orderBy("doc_id")


def q_lang_id(spark, sf_dir):
    from tzengine.pipeline.text import lang_id

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lang_id(d).select("doc_id", "lang_pred").orderBy("doc_id")


def q_length_stats(spark, sf_dir):
    """Corpus profiling rollup: per-language doc counts + mean + EXACT
    p50/p90 length (Spark percentile == SQL quantile_cont interpolation)."""
    from tzengine.pipeline.text import length_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return length_stats(d)


def q_asof_join(spark, sf_dir):
    """As-of join (functions.asof_join — the time-series operator Spark
    lacks natively, built as union-tag + struct carry-forward with ONE
    shuffle and no range-join explosion): every event picks up the
    value of the user's latest purchase at-or-before its timestamp.
    Value-oracled against DuckDB's native ASOF LEFT JOIN."""
    from tzengine.functions import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    upd = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("upd_value"))
    )
    left = ev.select("event_id", "user_id", "ts")
    out = asof_join(left, upd, key="user_id", ts="ts")
    return out.select("event_id", "asof_upd_value").orderBy("event_id")


def q_range_join(spark, sf_dir):
    """Range join (functions.range_join — interval bucketing turns the
    point-in-interval theta join into a hash equi-join on bucket ids):
    orders matched to OVERLAPPING price bands derived from the nation
    table (step 6000, width 9000 — every order can hit 0-2 bands).
    Value-oracled against DuckDB's plain inequality join."""
    from tzengine.functions import range_join

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    bands = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 6000.0).alias("lo"),
        (F.col("n_nationkey") * 6000.0 + 9000.0).alias("hi"),
    )
    out = range_join(o, bands, "o_totalprice", "lo", "hi", bucket_width=4500.0)
    return out.select("o_orderkey", "band_id").orderBy("o_orderkey", "band_id")


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3-shaped 3-way join (customer ⋈ orders ⋈ lineitem) +
    grouped revenue — the explicit multi-join entry of the relational
    family (AQE picks broadcast joins for the small sides; see
    PLANS.md). No LIMIT: the full result set avoids any float-cutoff
    sensitivity; order dates compare as days-since-epoch (tz-free)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cutoff = "1995-03-15"
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(cutoff))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit(cutoff))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).cast("long").alias("order_epoch_day"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy("l_orderkey")
    )


def q_windowed_zone_counts(spark, sf_dir):
    """Tumbling-window per-zone counts — the BATCH equivalent of
    streaming.streaming_cell_counts (same assign + window + agg plan
    without the watermark), giving the time-window operator family a
    value oracle. The ts column is TIMESTAMP_NTZ; window starts are
    compared as DAYS-SINCE-EPOCH via pure DATE arithmetic (bigint), so
    no timezone conversion exists on either engine's path (NTZ tumbling
    windows align to naive midnight = the row's own date)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        "ts",
        ((F.col("event_id") % 1987) / 200.0).alias("lat"),
        ((F.col("event_id") * 7 % 1993) / 200.0).alias("lon"),
    )
    out = _engine(spark).assign_timezones(pts, mode="strict")
    return (
        out.groupBy(F.window("ts", "1 day").alias("w"), "tzid")
        .agg(F.count("*").alias("n"))
        .select(
            F.datediff(
                F.col("w.start").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).cast("long").alias("epoch_day"),
            "tzid",
            "n",
        )
        .orderBy("epoch_day", "tzid")
    )


def q_tpch_q1(spark, sf_dir):
    """Generic relational capability: TPC-H Q1-shaped aggregation."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---- rows-only entries (hash-seeded or geodesic ops: no portable SQL) -----


def q_assign_full_world(spark, sf_dir):
    """Full synthetic world (holes, islands, enclaves, overlaps,
    multipolygons). Every piece ring is an axis-aligned rectangle on the
    float32 grid, so the boundary-inclusive even-odd containment IS
    ANSI-SQL-expressible with the exact f32-widened constants — the
    flagship spatial join gets a DuckDB value-hash oracle (cell_id /
    zone_shard are xxhash64-derived and checked in pytest instead)."""
    pts = _events_points(spark, sf_dir)
    out = _engine(spark).assign_timezones(pts, mode="strict")
    return out.select(
        "event_id", "tzid", F.concat_ws("|", "tzids").alias("tzids_str"),
        F.size("tzids").alias("n_zones"),
    ).orderBy("event_id")


def _full_world_contains_sql() -> list[tuple[str, str]]:
    """(zone_name, containment predicate SQL) per piece in rank order
    (pre-clip area asc, ordinal ties), generated from the same pieces the
    engine ingests — constants are the exact f32-widened doubles.

    Boundary-inclusive even-odd over axis-aligned rings:
    contained := on any ring edge OR strictly inside an odd number of
    rings (holes flip out, islands flip back in)."""
    from tzengine.zones import synthetic_world
    from tzengine import geom

    pieces = sorted(synthetic_world(), key=lambda p: (p.area2d, p.ordinal))
    out = []
    for p in pieces:
        on_bnd = []
        strict = []
        for r in p.rings:
            lo_lon, lo_lat, hi_lon, hi_lat = geom.rings_bbox([r])
            between = (
                f"(lon >= {lo_lon!r} AND lon <= {hi_lon!r} "
                f"AND lat >= {lo_lat!r} AND lat <= {hi_lat!r})"
            )
            st = (
                f"(lon > {lo_lon!r} AND lon < {hi_lon!r} "
                f"AND lat > {lo_lat!r} AND lat < {hi_lat!r})"
            )
            on_bnd.append(f"({between} AND NOT {st})")
            strict.append(f"CAST({st} AS INT)")
        pred = (
            "(" + " OR ".join(on_bnd)
            + f" OR ((({' + '.join(strict)}) % 2) = 1))"
        )
        out.append((p.zone_id, pred))
    return out


def q_distance_boundary_planar(spark, sf_dir):
    """Q5's planar nearest-boundary kernel on the rect world: every
    intermediate (perpendicular foot, squared distance, sqrt) is pure
    IEEE arithmetic that the SQL oracle mirrors AST-for-AST, so the
    DOUBLE output hash-matches bit-for-bit. The geodesic (Vincenty)
    variant stays pytest-golden-pinned (iterative, not SQL-portable)."""
    pts = _events_points(spark, sf_dir)
    eng = _rect_engine(spark)
    out = eng.assign_timezones(pts, mode="strict")
    return eng.distance_from_boundary(
        out, mode="strict", metric="planar_deg", out_col="dist_deg"
    ).select("event_id", "tzid", "dist_deg").orderBy("event_id")


def q_distance_boundary(spark, sf_dir):
    """Q5 geodesic on the FULL synthetic world — VALUE-ORACLED (round
    4): zone selection exercises holes/islands (SquareIsland), the
    MultiPolygon zone, enclave-in-host, and overlap ordering; the DuckDB
    oracle picks the first containing piece with the even-odd boundary-
    inclusive predicates, mirrors the nearest-foot argmin over ALL of
    that piece's segments (clip/hole edges count), and runs the full
    recursive-CTE Vincenty chain. DEFAULT metric (round 5: "geodesic"
    IS the fixed-iteration Vincenty — this row now value-oracles the
    exact code path real callers hit with no arguments) + floor 0.1 mm
    quantization as in distance_boundary_geodesic. Raw-meter output
    remains pinned by the ±1 mm reference goldens in test_geom.py."""
    pts = _events_points(spark, sf_dir)
    eng = _engine(spark)
    out = eng.assign_timezones(pts, mode="strict")
    d = eng.distance_from_boundary(out, mode="strict")
    return d.select(
        "event_id",
        "tzid",
        F.floor(F.col("boundary_dist_m") * 10000.0).alias("dist_tenthmm"),
    ).orderBy("event_id")


def _world_distance_oracle_sql(iterations: int = 50) -> str:
    """Synthetic-world Q5 geodesic mirror: first-containing-piece CASE
    (rank order) -> that piece's nearest-foot argmin -> Vincenty chain."""
    from tzengine.zones import synthetic_world

    pieces = sorted(synthetic_world(), key=lambda p: (p.area2d, p.ordinal))
    preds = _full_world_contains_sql()  # same rank order
    pr_case = (
        "CASE "
        + " ".join(
            f"WHEN {pred} THEN {i}" for i, (_z, pred) in enumerate(preds)
        )
        + " END"
    )
    feet = [_piece_nearest_foot_sql(p) for p in pieces]
    fx = (
        "CASE pr "
        + " ".join(f"WHEN {i} THEN {fx_i}" for i, (fx_i, _) in enumerate(feet))
        + " END"
    )
    fy = (
        "CASE pr "
        + " ".join(f"WHEN {i} THEN {fy_i}" for i, (_, fy_i) in enumerate(feet))
        + " END"
    )
    tz = (
        "CASE pr "
        + " ".join(
            f"WHEN {i} THEN '{z}'" for i, (z, _p) in enumerate(preds)
        )
        + " END"
    )
    return f"""
        WITH RECURSIVE pts AS (
          SELECT event_id,
                 (event_id % 1987) / 200.0 AS lat,
                 (event_id * 7 % 1993) / 200.0 AS lon
          FROM events),
        zoned AS (SELECT event_id, lat, lon, {pr_case} AS pr FROM pts),
        vbase AS (SELECT event_id, pr, lat, lon,
                         {fx} AS fx2, {fy} AS fy2 FROM zoned),
        {_vincenty_chain_sql("event_id, pr", iterations)}
        SELECT event_id, {tz} AS tzid,
               CAST(floor({_vincenty_dist_expr()} * 10000.0) AS BIGINT)
                 AS dist_tenthmm
        FROM vdist ORDER BY event_id
    """


def q_distance_boundary_geodesic(spark, sf_dir):
    """Q5's GEODESIC (WGS84 Vincenty) path value-oracled end-to-end
    (round 4): the DuckDB oracle runs the full Vincenty inverse as a
    49-step RECURSIVE CTE mirroring the kernel's fixed-iteration
    variant — since round 5 the DEFAULT metric (deterministic pure-row
    function; the adaptive per-row-freeze variant, now opt-in
    "geodesic_freeze", would let trig-ulp differences flip the freeze
    iteration across engines). Cross-engine agreement
    measured at <= 5.2e-10 m over 10k points (sin/cos/sqrt are
    bit-identical between numpy and DuckDB here; tan/atan/atan2 differ
    by ulps), so the output is quantized to 0.1 mm integer units with
    floor() — IEEE-exact in both engines, and 6-7 significant digits of
    the geodesic chain verified by value."""
    pts = _events_points(spark, sf_dir)
    eng = _rect_engine(spark)
    out = eng.assign_timezones(pts, mode="strict")
    d = eng.distance_from_boundary(out, mode="strict")
    return d.select(
        "event_id",
        "tzid",
        F.floor(F.col("boundary_dist_m") * 10000.0).alias("dist_tenthmm"),
    ).orderBy("event_id")


def _rect_nearest_foot_sql(lat0, lon0, lat1, lon1):
    from tzengine.zones import make_piece, _rect

    return _piece_nearest_foot_sql(
        make_piece("Z", 0, 0, [_rect(lat0, lon0, lat1, lon1)])
    )


def _piece_nearest_foot_sql(piece):
    """(fx, fy) SQL exprs for the planar-nearest boundary coordinate of
    one zone piece (ANY ring count — holes/islands contribute segments
    too, TimeZone.kt:26-28) — same per-segment foot AST as
    _rect_planar_dist_sql, with numpy-argmin FIRST-minimum tie-break
    mirrored as a sequential CASE (branch i wins iff d_i <= every LATER
    d_j; an earlier equal minimum would have matched its own earlier
    branch)."""
    from tzengine import geom

    seg_a, seg_b = geom._segments(piece.rings)
    feet = []
    for (ax, ay), (bx, by) in zip(seg_a, seg_b):
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        t = (
            f"least(greatest((((lon - {ax!r}) * {dx!r} "
            f"+ (lat - {ay!r}) * {dy!r}) / {len2!r}), 0.0), 1.0)"
        )
        fx = f"({ax!r} + {t} * {dx!r})"
        fy = f"({ay!r} + {t} * {dy!r})"
        d2 = f"((lon - {fx}) * (lon - {fx}) + (lat - {fy}) * (lat - {fy}))"
        feet.append((fx, fy, d2))
    n = len(feet)

    def casewhen(sel):
        whens = []
        for i in range(n - 1):
            cond = " AND ".join(
                f"{feet[i][2]} <= {feet[j][2]}" for j in range(i + 1, n)
            )
            whens.append(f"WHEN {cond} THEN {feet[i][sel]}")
        return "CASE " + " ".join(whens) + f" ELSE {feet[n - 1][sel]} END"

    return casewhen(0), casewhen(1)


def _vincenty_chain_sql(keys: str, iterations: int = 50) -> str:
    """Recursive-CTE mirror of geom.geodesic_distance_wgs84
    (freeze=False): ``iterations-1`` λ updates, then the iteration body
    once more on the final λ (matching the numpy loop, whose post-loop
    values come from the body evaluated on λ before its last update).
    Every constant is the exact repr double the kernel uses; np.where
    guards become CASE.

    Expects a CTE named ``vbase`` with columns ``{keys}, lat, lon, fx2,
    fy2`` and emits CTEs ending in ``vdist`` with ``{keys}, same, ss,
    cs, c2m, sg, u_sq`` — feed those to _vincenty_dist_expr()."""
    import numpy as np

    from tzengine import geom

    A_, B_, F_ = geom.WGS84_A, geom.WGS84_B, geom.WGS84_F
    DEG = np.deg2rad(1.0)
    body = """
      SELECT *, CASE WHEN csa <> 0 THEN cs - 2.0 * sinU1 * sinU2 / csa
                     ELSE 0.0 END AS c2m,
                (FVAL / 16.0) * csa * (4.0 + FVAL * (4.0 - 3.0 * csa)) AS cc
      FROM (
        SELECT *, 1.0 - sa * sa AS csa
        FROM (
          SELECT *, CASE WHEN ss <> 0 THEN cosU1 * cosU2 * sl / ss
                         ELSE 0.0 END AS sa
          FROM (
            SELECT *,
              sqrt((cosU2 * sl) * (cosU2 * sl)
                   + (cosU1 * sinU2 - sinU1 * cosU2 * clm)
                     * (cosU1 * sinU2 - sinU1 * cosU2 * clm)) AS ss,
              sinU1 * sinU2 + cosU1 * cosU2 * clm AS cs
            FROM (SELECT *, sin(lam) AS sl, cos(lam) AS clm FROM SRC) q1
          ) q2
        ) q3
      ) q4
    """.replace("FVAL", repr(F_))
    return f"""
        vini AS (
          SELECT {keys}, (lat = fy2 AND lon = fx2) AS same,
                 atan((1.0 - {F_!r}) * tan(lat * {DEG!r})) AS U1,
                 atan((1.0 - {F_!r}) * tan(fy2 * {DEG!r})) AS U2,
                 (fx2 - lon) * {DEG!r} AS L
          FROM vbase),
        vc AS (
          SELECT {keys}, same, sin(U1) AS sinU1, cos(U1) AS cosU1,
                 sin(U2) AS sinU2, cos(U2) AS cosU2, L FROM vini),
        vit AS (
          SELECT {keys}, same, sinU1, cosU1, sinU2, cosU2, L,
                 L AS lam, 0 AS i FROM vc
          UNION ALL
          SELECT {keys}, same, sinU1, cosU1, sinU2, cosU2, L,
                 L + (1.0 - cc) * {F_!r} * sa
                   * (atan2(ss, cs) + cc * ss
                      * (c2m + cc * cs * (-1.0 + 2.0 * c2m * c2m))) AS lam,
                 i + 1
          FROM ({body.replace("SRC", "vit")}) stepped
          WHERE i < {iterations - 1}
        ),
        vfin AS ({body.replace(
            "SRC", f"(SELECT * FROM vit WHERE i = {iterations - 1}) last_it"
        )}),
        vdist AS (
          SELECT {keys}, same, ss, cs, c2m, atan2(ss, cs) AS sg,
                 csa * ({A_!r} * {A_!r} - {B_!r} * {B_!r})
                   / ({B_!r} * {B_!r}) AS u_sq
          FROM vfin)
    """


def _vincenty_dist_expr() -> str:
    """Final Vincenty distance (meters, DOUBLE) over vdist's columns."""
    from tzengine import geom

    B_ = geom.WGS84_B
    bpoly = (
        "(u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq "
        "* (74.0 - 47.0 * u_sq))))"
    )
    return f"""(CASE WHEN same THEN 0.0 ELSE
                 {B_!r} * (1.0 + u_sq / 16384.0 * (4096.0 + u_sq
                   * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))))
                 * (sg - {bpoly} * ss * (c2m + {bpoly} / 4.0
                    * (cs * (-1.0 + 2.0 * c2m * c2m)
                       - {bpoly} / 6.0 * c2m
                         * (-3.0 + 4.0 * ss * ss)
                         * (-3.0 + 4.0 * c2m * c2m))))
               END)"""


def _vincenty_geodesic_oracle_sql(iterations: int = 50) -> str:
    """Rect-world Q5 geodesic oracle: nearest-foot CASE + the recursive
    Vincenty chain, floor-quantized to 0.1 mm units (see
    q_distance_boundary_geodesic)."""
    fx_s, fy_s = _rect_nearest_foot_sql(4, 4, 5, 5)
    fx_b, fy_b = _rect_nearest_foot_sql(3, 3, 6, 6)
    fx_f, fy_f = _rect_nearest_foot_sql(0, 0, 10, 10)
    case_z = (
        "CASE WHEN lat BETWEEN 4 AND 5 AND lon BETWEEN 4 AND 5 THEN 0 "
        "WHEN lat BETWEEN 3 AND 6 AND lon BETWEEN 3 AND 6 THEN 1 ELSE 2 END"
    )
    fx = f"CASE z WHEN 0 THEN {fx_s} WHEN 1 THEN {fx_b} ELSE {fx_f} END"
    fy = f"CASE z WHEN 0 THEN {fy_s} WHEN 1 THEN {fy_b} ELSE {fy_f} END"
    tz = (
        "CASE z WHEN 0 THEN 'Zone/Small' WHEN 1 THEN 'Zone/Big' "
        "ELSE 'Zone/Filler' END"
    )
    return f"""
        WITH RECURSIVE pts AS (
          SELECT event_id,
                 (event_id % 1987) / 200.0 AS lat,
                 (event_id * 7 % 1993) / 200.0 AS lon
          FROM events),
        zoned AS (SELECT event_id, lat, lon, {case_z} AS z FROM pts),
        vbase AS (SELECT event_id, z, lat, lon,
                         {fx} AS fx2, {fy} AS fy2 FROM zoned),
        {_vincenty_chain_sql("event_id, z", iterations)}
        SELECT event_id, {tz} AS tzid,
               CAST(floor({_vincenty_dist_expr()} * 10000.0) AS BIGINT)
                 AS dist_tenthmm
        FROM vdist ORDER BY event_id
    """


def q_knn_zones(spark, sf_dir):
    """kNN fallback with the GEODESIC metric — VALUE-ORACLED (round 4):
    the DuckDB oracle computes every (point, piece) boundary distance
    (0 when contained, else nearest-foot argmin + the recursive-CTE
    Vincenty chain), reduces to the best (distance, rank) per zone
    (nearest piece wins — the MultiPolygon zone exercises this), and
    takes the top-3 zones by (distance, rank) — exactly the dense
    semantics the pruned kNN is pytest-pinned against. Deterministic
    event_id<200 subset (limit() is order-dependent); DEFAULT metric
    (round 5: "geodesic" IS the fixed-iteration Vincenty, so this row
    oracles the no-argument path) for cross-engine iteration parity.
    String output: floats only decide the order, and inter-zone
    distance gaps (meters) dwarf the ~5e-10 m cross-engine jitter."""
    pts = _events_points(spark, sf_dir).filter(F.col("event_id") < 200)
    return (
        _engine(spark)
        .knn_zones(pts, k=3)
        .select("event_id", F.concat_ws("|", "nearest_tzids").alias("knn_str"))
        .orderBy("event_id")
    )


def _world_knn_oracle_sql(iterations: int = 50) -> str:
    """kNN mirror: per (point, piece) distance via the Vincenty chain
    (or 0 when the even-odd predicate contains the point), per-zone best
    by (d, rank), zones ordered by (d, rank), top 3 concatenated."""
    from tzengine.zones import synthetic_world

    pieces = sorted(synthetic_world(), key=lambda p: (p.area2d, p.ordinal))
    preds = _full_world_contains_sql()
    n = len(pieces)
    feet = [_piece_nearest_foot_sql(p) for p in pieces]
    fx = (
        "CASE pr "
        + " ".join(f"WHEN {i} THEN {fx_i}" for i, (fx_i, _) in enumerate(feet))
        + " END"
    )
    fy = (
        "CASE pr "
        + " ".join(f"WHEN {i} THEN {fy_i}" for i, (_, fy_i) in enumerate(feet))
        + " END"
    )
    inz = (
        "CASE pr "
        + " ".join(f"WHEN {i} THEN {pred}" for i, (_z, pred) in enumerate(preds))
        + " END"
    )
    tz = (
        "CASE pr "
        + " ".join(f"WHEN {i} THEN '{z}'" for i, (z, _p) in enumerate(preds))
        + " END"
    )
    return f"""
        WITH RECURSIVE pts AS (
          SELECT event_id,
                 (event_id % 1987) / 200.0 AS lat,
                 (event_id * 7 % 1993) / 200.0 AS lon
          FROM events WHERE event_id < 200),
        cand AS (
          SELECT event_id, lat, lon, CAST(t.pr AS INT) AS pr
          FROM pts, range(0, {n}) t(pr)),
        vbase AS (SELECT event_id, pr, lat, lon, {inz} AS inz,
                         {fx} AS fx2, {fy} AS fy2 FROM cand),
        {_vincenty_chain_sql("event_id, pr, inz", iterations)}
        , pd AS (
          SELECT event_id, pr, {tz} AS zname,
                 CASE WHEN inz THEN 0.0 ELSE {_vincenty_dist_expr()} END AS d
          FROM vdist),
        zbest AS (
          SELECT event_id, zname, d, pr,
                 row_number() OVER (PARTITION BY event_id, zname
                                    ORDER BY d, pr) AS zr
          FROM pd),
        ranked AS (
          SELECT event_id, zname, d, pr,
                 row_number() OVER (PARTITION BY event_id
                                    ORDER BY d, pr) AS rk
          FROM zbest WHERE zr = 1)
        SELECT event_id,
               string_agg(zname, '|' ORDER BY rk) AS knn_str
        FROM ranked WHERE rk <= 3
        GROUP BY event_id ORDER BY event_id
    """


def q_knn_zones_planar(spark, sf_dir):
    """kNN fallback operator VALUE-ORACLED end-to-end (round 4): the
    planar_deg metric orders zones by the same planar kernel the
    bit-exact distance_boundary_planar oracle mirrors AST-for-AST, so
    the full (distance, rank) ordering is DuckDB-verifiable on the rect
    world — the output is pure strings, floats only decide the order,
    and both engines compute those doubles bit-identically. The
    geodesic default stays rows-only (Vincenty is iterative, no SQL
    analogue)."""
    pts = _events_points(spark, sf_dir)
    return (
        _rect_engine(spark)
        .knn_zones(pts, k=3, metric="planar_deg")
        .select("event_id", F.concat_ws("|", "nearest_tzids").alias("knn_str"))
        .orderBy("event_id")
    )


def _knn_planar_oracle_sql() -> str:
    """Mirror of q_knn_zones_planar: per-piece distance = 0 when
    contained (boundary-inclusive BETWEEN on the f32 grid) else the
    bit-exact planar segment-distance AST; order by (dist, area rank)."""
    ds = _rect_planar_dist_sql(4, 4, 5, 5)
    db = _rect_planar_dist_sql(3, 3, 6, 6)
    dfl = _rect_planar_dist_sql(0, 0, 10, 10)
    return f"""
        WITH pts AS (SELECT event_id,
                            (event_id % 1987) / 200.0 AS lat,
                            (event_id * 7 % 1993) / 200.0 AS lon
                     FROM events),
        d AS (SELECT event_id,
                     CASE WHEN lat BETWEEN 4 AND 5 AND lon BETWEEN 4 AND 5
                          THEN 0.0 ELSE {ds} END AS d0,
                     CASE WHEN lat BETWEEN 3 AND 6 AND lon BETWEEN 3 AND 6
                          THEN 0.0 ELSE {db} END AS d1,
                     CASE WHEN lat BETWEEN 0 AND 10 AND lon BETWEEN 0 AND 10
                          THEN 0.0 ELSE {dfl} END AS d2
              FROM pts),
        ex AS (
          SELECT event_id, 'Zone/Small' AS z, d0 AS dist, 0 AS rk FROM d
          UNION ALL SELECT event_id, 'Zone/Big', d1, 1 FROM d
          UNION ALL SELECT event_id, 'Zone/Filler', d2, 2 FROM d)
        SELECT event_id, string_agg(z, '|' ORDER BY dist, rk) AS knn_str
        FROM ex GROUP BY event_id ORDER BY event_id
    """


def _stage(spark, df, name: str, persist: bool = True):
    """Materialize a Spark-computed signature table to Parquet at a fixed
    path so a DuckDB oracle can read the very same values the pair-join
    consumes (VERDICT r3 #4/#5: the non-SQL-portable part — xxhash64 /
    pandas-UDF signatures — stays pytest-pinned; the join logic that
    could silently drop pairs becomes value-verified).

    The returned DataFrame is the PERSISTED in-memory signature table:
    the write fills the cache and the join reuses it, so staging costs
    one small coalesced Parquet write over the unstaged pipeline (a
    read-back would be equivalent — the computation is deterministic —
    but slower). Returns (staged_df, glob_path).

    The path is keyed by THIS process's pid: queries() and oracle_sql()
    run in one driver process, so the oracle reads the bytes its own
    query staged, while a concurrently-running second harness (e.g. a
    bench child) writes its own files instead of clobbering these
    mid-compare."""
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(), f"tz_stage_oracle_pid{os.getpid()}", name
    )
    if persist:  # pass persist=False when the caller only needs the file
        df = df.persist()
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df, f"{path}/*.parquet"


def _stage_glob(name: str) -> str:
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"tz_stage_oracle_pid{os.getpid()}", name,
        "*.parquet",
    )


def q_minhash_lsh(spark, sf_dir):
    """MinHash + banded LSH — STAGE-ORACLED: signatures (xxhash64, non-
    SQL-portable, pytest-pinned in test_pipeline) are materialized to
    Parquet; the banding candidate join + estimate filter runs over the
    staged table, and the DuckDB oracle mirrors it on the same file
    (band-bucket equality == equality of the band's raw signature
    values)."""
    from tzengine.pipeline.dedup import minhash_band_pairs, minhash_signatures

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged, _ = _stage(spark, minhash_signatures(d), "minhash_sigs")
    return minhash_band_pairs(staged, verify_threshold=0.5).orderBy(
        "id_a", "id_b"
    )


def q_simhash(spark, sf_dir):
    """SimHash pairs — STAGE-ORACLED: the bit-vote signature (pandas
    UDF, pytest-pinned) is staged; the (d+1)-block pigeonhole join runs
    over the staged table. The pigeonhole is LOSSLESS, so the oracle is
    the stronger direct quadratic hamming join over the same file — it
    verifies both the join and the losslessness claim."""
    from tzengine.pipeline.dedup import hamming_block_pairs, simhash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged, _ = _stage(spark, simhash(d), "simhash_sigs")
    return (
        hamming_block_pairs(staged, "doc_id", "simhash", max_dist=3)
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    )


def q_embedding_neardup(spark, sf_dir):
    """Near-dup detection fires on injected exact duplicates (the natural
    corpus has no cos>=0.9 pairs — verified; an empty result would be a
    vacuous check). STAGE-ORACLED: hyperplane sketches (pandas UDF,
    pytest-pinned) staged with DOUBLE embeddings; the sketch equi-join +
    cosine verify is mirrored in DuckDB with the SAME sequential-fold
    double AST (products of float-derived doubles are exact, both folds
    are left-to-right), so the cosine matches bit-for-bit."""
    from tzengine.pipeline.dedup import embedding_sketches, sketch_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    dup = e.filter(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    staged, _ = _stage(
        spark, embedding_sketches(e.unionByName(dup)), "embedding_sketches"
    )
    return sketch_neardup_pairs(staged, cos_threshold=0.99).orderBy(
        "id_a", "id_b"
    )


def q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k: deterministic id-picked centroids, argmax-
    cosine bucketing, top-nprobe probes, exact cosine within probed
    buckets. Double-precision both sides (like ann_topk); the DuckDB
    oracle mirrors centroid choice, bucket argmax (sim DESC, centroid
    ASC), probe ranking, and the final (cosine DESC, vec_id ASC) order —
    rank-only output, so ulp-level cosine differences don't matter."""
    from tzengine.pipeline.similarity import (
        deterministic_centroids, ivf_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = deterministic_centroids(e, 8)
    return ivf_topk(e, q, cents, k=5, nprobe=3).select(
        "query_id", "vec_id", "rank"
    ).orderBy("query_id", "rank")


def q_fingerprint(spark, sf_dir):
    """Document fingerprinting — STAGE-ORACLED (round 4): the xxhash64
    gram-hash table (pytest-pinned computation) is staged to Parquet;
    the winnowing aggregation (min over the gram-hash windows) plus the
    exact-hash pass-through run over the STAGED table and DuckDB mirrors
    them on the same file with list_min."""
    from tzengine.pipeline.text import fingerprint_gram_hashes

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = fingerprint_gram_hashes(d).select(
        "doc_id", "fingerprint", "gram_hashes"
    )
    staged, _ = _stage(spark, sig, "fingerprint_grams")
    return staged.select(
        "doc_id",
        "fingerprint",
        F.array_min("gram_hashes").alias("fingerprint_min_ngram"),
    ).orderBy("doc_id")


def q_assign_bigworld(spark, sf_dir):
    """Reference-scale world (~175 star pieces / 11k vertices at the
    driver-checked grid): the same assign operator over a multi-MB
    broadcast index. Value-oracled: the DuckDB oracle ray-casts every
    point against an edge VALUES table (same even-odd arithmetic as
    geom.points_in_rings_evenodd) and takes the min-rank match, so the
    mixed-resolution cell index is verified by value at reference scale,
    not just row-counted (the pytest sweep in test_bigworld.py
    additionally pins the full 454-piece world)."""
    from tzengine.bigworld import big_world

    key = ("big", id(spark))
    if key not in _ENGINES:
        _ENGINES[key] = TzEngine.for_everywhere(
            spark, big_world(grid=13, verts=64), world_version="big1"
        )
    pts = _events_points(spark, sf_dir).select(
        "event_id",
        (F.col("lat") * 12.0 - 60.0).alias("lat"),
        (F.col("lon") * 12.0 - 60.0).alias("lon"),
    )
    out = _ENGINES[key].assign_timezones(pts, mode="strict")
    return out.select(
        "event_id", "tzid", F.size("tzids").alias("n_zones")
    ).orderBy("event_id")


def q_image_features(spark, sf_dir):
    """Multimodal: decode real pixels (raw/PNG/q6) and extract features
    via mapInPandas. Input images are the deterministic fixture table
    (row-index-seeded; sf only varies the other queries).

    STAGE-ORACLED (round 4): the decode table (numpy-computed features
    PLUS the decoded per-channel pixel lists) is staged to Parquet; the
    query returns the operator's own numpy features, and the DuckDB
    oracle RECOMPUTES them from the staged pixels — channel means are
    integer-exact (sum of uint8 values is exact in both engines at any
    summation order), the gray std agrees to ~1e-13 rel (numpy pairwise
    vs DuckDB sequential summation) and is floor-quantized to 1e-6
    units. The binary DECODE itself stays pytest-pinned against real
    pixel goldens (DuckDB cannot decode PNG/q6)."""
    from tzengine.fixtures import geo_images_df
    from tzengine.pipeline.multimodal import image_decode_table

    df = geo_images_df(spark, 200, partitions=8)
    staged, _ = _stage(spark, image_decode_table(df), "image_decode")
    return staged.select(
        "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
        F.floor(F.col("std_gray") * 1000000.0).alias("std_gray_u"),
        "phash_decoded",
    ).orderBy("image_id")


def q_image_resize(spark, sf_dir):
    """Multimodal: nearest-neighbor resize (16x12) of real decoded
    pixels, re-encoded in the row's own format (q6 re-encodes as raw —
    multimodal.resize_images).

    STAGE-ORACLED (round 5): the SOURCE decode table is staged; the
    query runs the real resize operator, decodes the operator's own
    output bytes, and emits integer position-weighted channel checksums
    (sum and Σ px[i]·(i+1) — position-sensitive, so any wrong gather
    index changes the value); the DuckDB oracle recomputes the expected
    resized pixels from the staged source pixels with the same integer
    index math (yi = (oy*h)//12, xi = (ox*w)//16, src = yi*w+xi) in
    pure SQL. All quantities are integer-exact in both engines; the
    binary encode/decode round-trip stays pytest-pinned."""
    from tzengine import images as imagesmod
    from tzengine.fixtures import geo_images_df
    from tzengine.pipeline.multimodal import image_decode_table, resize_images

    df = geo_images_df(spark, 120, partitions=8)
    _stage(spark, image_decode_table(df), "resize_src", persist=False)
    out = resize_images(df, 16, 12)

    def sums(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = imagesmod.decode(
                    bytes(r.bytes), r.fmt, int(r.w), int(r.h)
                )
                flat = img.reshape(-1, 3).astype(np.int64)
                wgt = np.arange(1, flat.shape[0] + 1, dtype=np.int64)
                rows.append(
                    (
                        r.image_id, r.fmt, flat.shape[0],
                        int(flat[:, 0].sum()), int((flat[:, 0] * wgt).sum()),
                        int(flat[:, 1].sum()), int((flat[:, 1] * wgt).sum()),
                        int(flat[:, 2].sum()), int((flat[:, 2] * wgt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "fmt", "n_px", "sum_r", "wsum_r",
                    "sum_g", "wsum_g", "sum_b", "wsum_b",
                ],
            )

    schema = (
        "image_id string, fmt string, n_px long, sum_r long, wsum_r long, "
        "sum_g long, wsum_g long, sum_b long, wsum_b long"
    )
    return out.mapInPandas(sums, schema).orderBy("image_id")


def q_phash_neardup(spark, sf_dir):
    """Image near-dup pairs on the perceptual hash ((d+1)-block pigeonhole
    bucketing + exact bit_count verify) — STAGE-ORACLED: the xxhash64
    phash table is staged to Parquet; the block-bucket join runs over the
    staged table and the DuckDB oracle is the direct quadratic hamming
    join on the same file (pigeonhole losslessness verified by value)."""
    from tzengine.pipeline.multimodal import phash_neardup_pairs

    base = spark.range(2000).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        F.xxhash64(F.col("id")).alias("phash"),
    )
    dup = base.limit(10).select(
        F.concat(F.col("image_id"), F.lit("_d")).alias("image_id"),
        F.col("phash").bitwiseXOR(F.lit(2)).alias("phash"),
    )
    staged, _ = _stage(spark, base.unionByName(dup), "phash_sigs")
    return (
        phash_neardup_pairs(staged, max_dist=2)
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    )


def q_audio_features(spark, sf_dir):
    """REAL WAV/PCM decode (stdlib wave + numpy): sr, duration, RMS, ZCR,
    spectral centroid per clip.

    STAGE-ORACLED (round 4): the decode table (features PLUS the decoded
    sample vector and the rfft magnitude spectrum) is staged; the query
    returns the operator's own numpy features and the DuckDB oracle
    RECOMPUTES duration (exact int/int division), ZCR (integer-exact
    sign-change count), RMS from the samples and the spectral centroid
    from the staged spectrum (both floor-quantized against summation-
    order ulps). The WAV parse and the FFT itself stay pytest-pinned
    against tone-frequency goldens (no SQL FFT exists)."""
    from tzengine.fixtures import audio_clips_df
    from tzengine.pipeline.multimodal import audio_decode_table

    staged, _ = _stage(
        spark,
        audio_decode_table(audio_clips_df(spark, 128, partitions=4)),
        "audio_decode",
    )
    return staged.select(
        "clip_id", "sample_rate", "n_samples", "duration_s",
        F.floor(F.col("rms") * 1000000000.0).alias("rms_nano"),
        "zcr",
        F.floor(F.col("spectral_centroid_hz") * 1000000.0).alias("centroid_u"),
    ).orderBy("clip_id")


def q_video_frame_sample(spark, sf_dir):
    """REAL raw-frame container parsing: every 5th frame extracted and
    PNG-re-encoded (actual pixels).

    STAGE-ORACLED (round 4): the FULL decode table (every frame, through
    the same operator at every_n=1) is staged; the query runs the real
    every_n=5 operator and the DuckDB oracle reproduces its output by
    SQL-sampling frame_no % 5 = 0 from the staged table, comparing the
    complete re-encoded frame payload via hex() — so the sampling loop
    and payload integrity are value-verified while the container parse
    stays pinned by the bit-exact round-trip test."""
    from tzengine.fixtures import raw_videos_df
    from tzengine.pipeline.multimodal import sample_video_frames

    vids = raw_videos_df(spark, 32, frames=12, partitions=4)
    # write-only staging (persist=False): the oracle reads the file; the
    # query output must come from the REAL every_n=5 operator run, not a
    # filter of the staged table — that's precisely what the oracle checks
    _stage(
        spark, sample_video_frames(vids, every_n=1), "video_frames",
        persist=False,
    )
    out = sample_video_frames(vids, every_n=5)
    return out.select(
        "video_id", "frame_no", "w", "h",
        F.hex("bytes").alias("frame_hex"),
    ).orderBy("video_id", "frame_no")


def q_payload_verify(spark, sf_dir):
    """Per-row payload fidelity (input_hint invariant): decoded-pixel
    exact/PSNR>=40dB + caption equality + phash stability, aggregated.

    STAGE-ORACLED (round 4): the verify table is staged WITH its raw
    ingredients (decoded + expected pixel lists, both captions, both
    hashes); the query aggregates the operator's own numpy verdicts,
    and the DuckDB oracle RECOMPUTES every verdict from the staged
    values — exact list equality, integer-exact MSE → PSNR threshold,
    caption equality, xor/bit_count hamming — then mirrors the
    aggregation. The fidelity magnitude is reported as the INTEGER MSE
    numerator (sum of squared uint8 differences — exact in both
    engines), not a floored PSNR: round 4's driver run showed a libm
    log10 within an ulp of an integer millidB can floor differently
    across numpy/DuckDB builds (VERDICT r4 #2); the >=40 dB check
    survives as the pixels_ok boolean (actuals ~46 dB, nowhere near
    the threshold boundary). Only the binary decode + deterministic
    synth stay pytest-pinned."""
    from tzengine.fixtures import geo_images_df
    from tzengine.payload import verify_payload_table

    v = verify_payload_table(geo_images_df(spark, 120, partitions=8))
    staged, _ = _stage(spark, v, "payload_verify")
    mse_num = F.aggregate(
        F.zip_with("px", "ex", lambda a, b: ((a - b) * (a - b)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        staged.withColumn("mse_num", mse_num)
        .withColumn("n_px", F.size("px").cast("long"))
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("pixels_ok").cast("long")).alias("n_pixels_ok"),
            F.sum(F.col("caption_ok").cast("long")).alias("n_caption_ok"),
            F.sum((F.col("phash_dist") <= 2).cast("long")).alias("n_phash_ok"),
            F.max("mse_num").alias("max_mse_num"),
            F.max("n_px").alias("n_px"),
        )
        .orderBy("fmt")
    )


def q_hot_cells(spark, sf_dir):
    """Skew diagnostic: salted per-cell counts over the assigned table.
    Oracled: the res-7 Morton cell id is 14 bit-interleave terms in ANSI
    SQL, so DuckDB reproduces cell_id + counts exactly."""
    from tzengine.functions import hot_cell_histogram

    pts = _events_points(spark, sf_dir)
    assigned = _engine(spark).assign_timezones(
        pts.withColumn("image_id", F.col("event_id").cast("string")),
        mode="strict",
    )
    return hot_cell_histogram(assigned, top=20)


def _hot_cells_oracle_sql() -> str:
    """Morton encode at res 7 in SQL: ix/iy = truncate((coord+off)/span *
    128), interleave 7 bits each (ix even positions, iy odd), OR in the
    resolution tag (7 << 58) — same IEEE double AST as cells.cell_of."""
    ix = "CAST(trunc(((lon + 180.0) / 360.0) * 128.0) AS BIGINT)"
    iy = "CAST(trunc(((lat + 90.0) / 180.0) * 128.0) AS BIGINT)"
    terms = []
    for b in range(7):
        terms.append(f"((({ix} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({iy} >> {b}) & 1) << {2 * b + 1})")
    morton = " | ".join(terms)
    return f"""
        WITH pts AS (SELECT event_id,
                            (event_id % 1987) / 200.0 AS lat,
                            (event_id * 7 % 1993) / 200.0 AS lon
                     FROM events),
        cellids AS (
          SELECT (CAST(7 AS BIGINT) << 58) | ({morton}) AS cell_id
          FROM pts)
        SELECT cell_id, count(*) AS n FROM cellids
        GROUP BY cell_id ORDER BY n DESC, cell_id LIMIT 20
    """


def q_tar_archive_roundtrip(spark, sf_dir):
    """Reference archive-format round-trip (B7/B9 + I2/I3/I6/I7): write
    the synthetic world in the reference tar layout (version marker +
    FlatBuffers entries), reload it through the version gate + envelope
    prune, and assign points with the reloaded engine. Value-oracled:
    the reload must reproduce the SAME containment the direct engine
    computes, so the DuckDB oracle is the full-world boundary-inclusive
    even-odd SQL grouped per zone — the binary ingest path (tar +
    FlatBuffers decode + f32 grid + area sort) is verified end-to-end by
    value, not just row count. Byte-level format parity is additionally
    pinned in tests/test_tararchive.py incl. the reference's own
    fixtures."""
    import tempfile

    from tzengine.zones import synthetic_world as _sw

    key = ("tar", id(spark))
    if key not in _ENGINES:
        path = os.path.join(tempfile.gettempdir(), "tz_entry_world.tar")
        from tzengine import tararchive

        tararchive.write_tar_archive(_sw(), path, "1:entrytar")
        _ENGINES[key] = TzEngine.from_tar_archive(spark, path)
    # deterministic subset (limit() is order-dependent): the DuckDB oracle
    # uses the same event_id predicate
    pts = _events_points(spark, sf_dir).filter(F.col("event_id") < 2000)
    out = _ENGINES[key].assign_timezones(pts, mode="strict")
    return (
        out.groupBy("tzid")
        .agg(F.count("*").alias("n"))
        .orderBy("tzid")
    )


def q_tiling_roundtrip(spark, sf_dir):
    """Raster → vector round-trip summary per zone piece. Value-oracled:
    the synthetic world's rings are axis-aligned, so the res-7 raster
    classification (edge-touches-cell => partial, center-parity => full)
    and the bottom-up sibling-quad merge of vectorize_coverage are both
    ANSI-SQL-expressible (see _tiling_oracle_sql)."""
    from tzengine import tiling

    raster = tiling.rasterize_zones(spark, synthetic_world(), res=7)
    vector = tiling.vectorize_coverage(raster)
    return (
        raster.groupBy("zone_id", "polygon_id", "kind")
        .agg(F.count("*").alias("n_raster"))
        .join(
            vector.groupBy("zone_id", "polygon_id", "kind").agg(
                F.count("*").alias("n_vector")
            ),
            ["zone_id", "polygon_id", "kind"],
        )
        .orderBy("zone_id", "polygon_id", "kind")
    )


def _windowed_zone_counts_oracle_sql() -> str:
    """Tumbling day-window mirror: NTZ day windows align to naive
    midnight, so the window start's DATE is the row's own date —
    days-since-epoch via date_diff, no timezone anywhere; tzid via the
    full-world containment CASE."""
    zp = _full_world_contains_sql()
    first = (
        "CASE "
        + " ".join(f"WHEN {pred} THEN '{name}'" for name, pred in zp)
        + " END"
    )
    return f"""
        WITH pts AS (SELECT ts,
                            (event_id % 1987) / 200.0 AS lat,
                            (event_id * 7 % 1993) / 200.0 AS lon
                     FROM events)
        SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS epoch_day,
               {first} AS tzid,
               count(*) AS n
        FROM pts GROUP BY 1, 2 ORDER BY epoch_day, tzid
    """


def _tar_roundtrip_oracle_sql() -> str:
    """The tar-reloaded engine must assign exactly like the direct
    engine, so the oracle is the full-world containment SQL (first-match
    CASE in rank order) grouped per zone over the same deterministic
    event_id < 2000 subset."""
    zp = _full_world_contains_sql()
    first = (
        "CASE "
        + " ".join(f"WHEN {pred} THEN '{name}'" for name, pred in zp)
        + " END"
    )
    return f"""
        WITH pts AS (SELECT event_id,
                            (event_id % 1987) / 200.0 AS lat,
                            (event_id * 7 % 1993) / 200.0 AS lon
                     FROM events WHERE event_id < 2000)
        SELECT {first} AS tzid, count(*) AS n
        FROM pts GROUP BY 1 ORDER BY tzid
    """


def _ivf_topk_oracle_sql() -> str:
    """Mirrors ivf_topk exactly: centroids = the 8 smallest-id vectors
    (centroid_id = matrix row = rank by vec_id); bucket assignment =
    argmax cosine (ties -> lowest centroid id, np.argmax semantics);
    probes = top-3 centroids per query (sim DESC, centroid ASC); final
    rank = (cosine DESC, vec_id ASC) within probed buckets. Output is
    rank-only, so the cosine rounding-path difference (normalize-then-
    dot vs dot-over-norms) cannot flip anything short of an exact tie."""
    return """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        cents AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, emb AS cv
          FROM e ORDER BY vec_id LIMIT 8),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.emb, c.cv) DESC,
                              c.cid ASC) AS r
            FROM e, cents c) WHERE r = 1),
        q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 5),
        probes AS (
          SELECT query_id, cid FROM (
            SELECT q.query_id, c.cid,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                              c.cid ASC) AS r
            FROM q, cents c) WHERE r <= 3),
        cand AS (
          SELECT p.query_id, a.vec_id
          FROM probes p JOIN assign a ON a.cid = p.cid),
        scored AS (
          SELECT c.query_id, c.vec_id,
                 row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY list_cosine_similarity(e.emb, q2.qv) DESC,
                            c.vec_id ASC) AS rank
          FROM cand c
          JOIN e ON e.vec_id = c.vec_id
          JOIN q q2 ON q2.query_id = c.query_id)
        SELECT query_id, vec_id, rank FROM scored
        WHERE rank <= 5 ORDER BY query_id, rank
    """


def _tiling_oracle_sql(res: int = 7) -> str:
    """Res-``res`` raster + vectorize mirror for the axis-aligned
    synthetic world.

    Raster classification per candidate cell (tiling.raster_mask_for_
    rings): an axis-aligned edge touches/crosses a cell iff their bboxes
    overlap INCLUSIVELY (for axis-aligned segments the Cohen-Sutherland
    test in geom.segments_intersect_box degenerates to exactly this);
    'full' = not crossed AND cell center strictly inside an odd number
    of rings (centers at (k+0.5)*cellsize offsets never land on the
    world's integer-grid edges, so strict BETWEEN == the even-odd ray
    cast). Candidate ix/iy ranges mirror cells_covering_bbox's floor
    arithmetic (computed on the same doubles).

    Vector counts mirror vectorize_coverage's bottom-up sibling merge:
    level r cells group by (ix//2, iy//2); groups of 4 promote, the rest
    emit — pure (ix, iy) arithmetic, no Morton interleave needed since
    siblings under a parent are exactly the 2x2 (ix, iy) block."""
    from tzengine import geom
    from tzengine.zones import synthetic_world as _sw

    import numpy as np

    n = 1 << res
    lon_w = 360.0 / n
    lat_w = 180.0 / n
    piece_sql = []
    for p in _sw():
        lo_lon, lo_lat, hi_lon, hi_lat = geom.rings_bbox(p.rings)
        ix0 = int(np.clip(np.floor((lo_lon + 180.0) / 360.0 * n), 0, n - 1))
        ix1 = int(np.clip(np.floor((hi_lon + 180.0) / 360.0 * n), 0, n - 1))
        iy0 = int(np.clip(np.floor((lo_lat + 90.0) / 180.0 * n), 0, n - 1))
        iy1 = int(np.clip(np.floor((hi_lat + 90.0) / 180.0 * n), 0, n - 1))
        seg_a, seg_b = geom._segments(p.rings)
        crossed_terms = []
        for (ax, ay), (bx, by) in zip(seg_a, seg_b):
            exmin, exmax = min(ax, bx), max(ax, bx)
            eymin, eymax = min(ay, by), max(ay, by)
            crossed_terms.append(
                f"({exmin!r} <= x0 + {lon_w!r} AND {exmax!r} >= x0 "
                f"AND {eymin!r} <= y0 + {lat_w!r} AND {eymax!r} >= y0)"
            )
        parity_terms = []
        for r in p.rings:
            rlo_lon, rlo_lat, rhi_lon, rhi_lat = geom.rings_bbox([r])
            parity_terms.append(
                f"CAST((cx > {rlo_lon!r} AND cx < {rhi_lon!r} "
                f"AND cy > {rlo_lat!r} AND cy < {rhi_lat!r}) AS INT)"
            )
        piece_sql.append(f"""
          SELECT '{p.zone_id}' AS zone_id,
                 CAST({p.polygon_id} AS INT) AS polygon_id,
                 ix, iy,
                 CASE WHEN {' OR '.join(crossed_terms)} THEN 'partial'
                      WHEN (({' + '.join(parity_terms)}) % 2) = 1 THEN 'full'
                 END AS kind
          FROM (
            SELECT CAST(t1.range AS BIGINT) AS ix, CAST(t2.range AS BIGINT) AS iy,
                   (CAST(t1.range AS DOUBLE) / {float(n)!r}) * 360.0 - 180.0 AS x0,
                   (CAST(t2.range AS DOUBLE) / {float(n)!r}) * 180.0 - 90.0 AS y0,
                   ((CAST(t1.range AS DOUBLE) / {float(n)!r}) * 360.0 - 180.0
                     + ((CAST(t1.range AS DOUBLE) / {float(n)!r}) * 360.0 - 180.0
                        + {lon_w!r})) / 2.0 AS cx,
                   ((CAST(t2.range AS DOUBLE) / {float(n)!r}) * 180.0 - 90.0
                     + ((CAST(t2.range AS DOUBLE) / {float(n)!r}) * 180.0 - 90.0
                        + {lat_w!r})) / 2.0 AS cy
            FROM range({ix0}, {ix1 + 1}) t1 CROSS JOIN range({iy0}, {iy1 + 1}) t2
          )""")
    rast = " UNION ALL ".join(piece_sql)

    # sibling-quad merge, res levels res..1 (vectorize_coverage mirror)
    merge_ctes = []
    keep_selects = []
    prev = "full_r"
    for lvl in range(res, 0, -1):
        g = f"g{lvl - 1}"
        merge_ctes.append(
            f"{g} AS (SELECT zone_id, polygon_id, ix // 2 AS ix, "
            f"iy // 2 AS iy, count(*) AS n4 FROM {prev} "
            f"GROUP BY 1, 2, 3, 4)"
        )
        keep_selects.append(
            f"SELECT zone_id, polygon_id, n4 AS n FROM {g} WHERE n4 < 4"
        )
        nxt = f"full{lvl - 1}"
        merge_ctes.append(
            f"{nxt} AS (SELECT zone_id, polygon_id, ix, iy FROM {g} "
            f"WHERE n4 = 4)"
        )
        prev = nxt
    keep_selects.append(
        f"SELECT zone_id, polygon_id, CAST(1 AS BIGINT) AS n FROM {prev}"
    )
    keeps = " UNION ALL ".join(keep_selects)

    return f"""
        WITH rast AS ({rast}),
        rastk AS (SELECT * FROM rast WHERE kind IS NOT NULL),
        rastcnt AS (
          SELECT zone_id, polygon_id, kind, count(*) AS n_raster
          FROM rastk GROUP BY 1, 2, 3),
        full_r AS (SELECT zone_id, polygon_id, ix, iy FROM rastk
                   WHERE kind = 'full'),
        {', '.join(merge_ctes)},
        veccnt AS (
          SELECT zone_id, polygon_id, 'full' AS kind,
                 CAST(sum(n) AS BIGINT) AS n_vector
          FROM ({keeps}) GROUP BY 1, 2
          UNION ALL
          SELECT zone_id, polygon_id, 'partial', count(*)
          FROM rastk WHERE kind = 'partial' GROUP BY 1, 2)
        SELECT r.zone_id, r.polygon_id, r.kind, r.n_raster, v.n_vector
        FROM rastcnt r
        JOIN veccnt v ON v.zone_id = r.zone_id
                     AND v.polygon_id = r.polygon_id AND v.kind = r.kind
        ORDER BY r.zone_id, r.polygon_id, r.kind
    """


SCOPED_REGION = (0.5, 0.5, 8.7, 9.5)  # (min_lat, min_lon, max_lat, max_lon)


def q_assign_region_scoped(spark, sf_dir):
    """Region-scoped engine (I12 clip + split at driver-check level):
    zones are CLIPPED to an init region whose bounds cut Zone/Host and
    Zone/Filler (8.7 is not even f32-representable, so the clipped index
    exercises the f64-segment fallback too). Value-oracled: clipped
    axis-aligned rings are exactly the clamped rectangles (Sutherland-
    Hodgman intersection of an axis-aligned edge with a clip line is
    exact), so containment is BETWEEN over region-clamped bounds and the
    rank order is the PRE-clip area sort the engine preserves."""
    min_lat, min_lon, max_lat, max_lon = SCOPED_REGION
    key = ("scoped", id(spark))
    if key not in _ENGINES:
        _ENGINES[key] = TzEngine.for_region(
            spark, synthetic_world(), min_lat, min_lon, max_lat, max_lon,
            world_version="synth1",
        )
    pts = _events_points(spark, sf_dir).filter(
        F.col("lat").between(min_lat, max_lat)
        & F.col("lon").between(min_lon, max_lon)
    )
    out = _ENGINES[key].assign_timezones(pts, mode="strict")
    return out.select(
        "event_id", "tzid", F.concat_ws("|", "tzids").alias("tzids_str"),
        F.size("tzids").alias("n_zones"),
    ).orderBy("event_id")


def _region_scoped_oracle_sql() -> str:
    """Scoped-assign oracle: the full-world containment SQL with every
    ring bbox CLAMPED to the init region (python max/min on the exact
    doubles — no arithmetic, so constants match the engine's clipped
    vertices bit-for-bit), pieces dropped when their clamp is empty,
    rank order = (pre-clip area, ordinal) like compile_index."""
    from tzengine import geom
    from tzengine.zones import synthetic_world as _sw

    min_lat, min_lon, max_lat, max_lon = SCOPED_REGION
    pieces = sorted(_sw(), key=lambda p: (p.area2d, p.ordinal))
    zp = []
    for p in pieces:
        on_bnd, strict = [], []
        for r in p.rings:
            lo_lon, lo_lat, hi_lon, hi_lat = geom.rings_bbox([r])
            lo_lon, lo_lat = max(lo_lon, min_lon), max(lo_lat, min_lat)
            hi_lon, hi_lat = min(hi_lon, max_lon), min(hi_lat, max_lat)
            if hi_lon < lo_lon or hi_lat < lo_lat:
                continue  # ring clipped away entirely
            between = (
                f"(lon >= {lo_lon!r} AND lon <= {hi_lon!r} "
                f"AND lat >= {lo_lat!r} AND lat <= {hi_lat!r})"
            )
            st = (
                f"(lon > {lo_lon!r} AND lon < {hi_lon!r} "
                f"AND lat > {lo_lat!r} AND lat < {hi_lat!r})"
            )
            on_bnd.append(f"({between} AND NOT {st})")
            strict.append(f"CAST({st} AS INT)")
        if not on_bnd:
            continue
        pred = (
            "(" + " OR ".join(on_bnd)
            + f" OR ((({' + '.join(strict)}) % 2) = 1))"
        )
        zp.append((p.zone_id, pred))
    first = (
        "CASE "
        + " ".join(f"WHEN {pred} THEN '{name}'" for name, pred in zp)
        + " END"
    )
    all_str = (
        "concat_ws('|', "
        + ", ".join(f"CASE WHEN {pred} THEN '{name}' END" for name, pred in zp)
        + ")"
    )
    n = " + ".join(f"CAST({pred} AS INT)" for _, pred in zp)
    return f"""
        WITH pts AS (SELECT event_id,
                            (event_id % 1987) / 200.0 AS lat,
                            (event_id * 7 % 1993) / 200.0 AS lon
                     FROM events),
        rp AS (SELECT * FROM pts
               WHERE lat BETWEEN {min_lat!r} AND {max_lat!r}
                 AND lon BETWEEN {min_lon!r} AND {max_lon!r})
        SELECT event_id, {first} AS tzid, {all_str} AS tzids_str,
               {n} AS n_zones
        FROM rp ORDER BY event_id
    """


def _bigworld_oracle_sql() -> str:
    """Reference-scale assign oracle: every (point, piece) containment
    decided by an even-odd ray cast over an edge VALUES table — the
    SAME IEEE arithmetic as geom.points_in_rings_evenodd (straddle test
    + x_at = ax + (py-ay)*(bx-ax)/(by-ay), strict <). Pieces carry their
    (pre-clip area, ordinal) rank so first-match = min rank. Strict
    even-odd (no on-edge clause) equals the engine's boundary-INCLUSIVE
    semantics for every probe point not exactly on an edge — the
    rational probe grid never lands on the star polygons' cos/sin
    vertices' edges."""
    from tzengine import geom
    from tzengine.bigworld import big_world

    pieces = sorted(
        big_world(grid=13, verts=64), key=lambda p: (p.area2d, p.ordinal)
    )
    edge_rows = []
    name_rows = []
    for rk, p in enumerate(pieces):
        sa, sb = geom._segments(p.rings)
        for (ax, ay), (bx, by) in zip(sa, sb):
            edge_rows.append(
                f"({rk},{float(ax)!r},{float(ay)!r},"
                f"{float(bx)!r},{float(by)!r})"
            )
        name_rows.append(f"({rk},'{p.zone_id}')")
    return f"""
        WITH pts AS (
          SELECT event_id,
                 ((event_id % 1987) / 200.0) * 12.0 - 60.0 AS lat,
                 ((event_id * 7 % 1993) / 200.0) * 12.0 - 60.0 AS lon
          FROM events),
        edges(rk, ax, ay, bx, by) AS (VALUES {', '.join(edge_rows)}),
        zmap(rk, zname) AS (VALUES {', '.join(name_rows)}),
        hits AS (
          SELECT p.event_id, e.rk
          FROM pts p JOIN edges e
            ON ((e.ay > p.lat) != (e.by > p.lat))
           AND p.lon < e.ax + (p.lat - e.ay) * (e.bx - e.ax) / (e.by - e.ay)
          GROUP BY p.event_id, e.rk
          HAVING count(*) % 2 = 1),
        best AS (
          SELECT event_id, min(rk) AS rk, count(*) AS n_zones
          FROM hits GROUP BY event_id)
        SELECT b.event_id, z.zname AS tzid, CAST(b.n_zones AS INT) AS n_zones
        FROM best b JOIN zmap z ON z.rk = b.rk
        ORDER BY b.event_id
    """


def _minhash_stage_oracle_sql(num_hashes: int = 32, bands: int = 8) -> str:
    """Mirror of minhash_band_pairs over the staged signature Parquet:
    docs share a band bucket iff their rows_per_band signature values in
    that band are ALL equal (xxhash64 bucket collisions are ~2^-64), and
    est_jaccard = agreeing-minhash fraction. Integer/int division is
    double in both engines; /num_hashes is exact (numerator <= 32)."""
    rpb = num_hashes // bands
    band_preds = [
        "("
        + " AND ".join(
            f"a.mh_{b * rpb + r} = b.mh_{b * rpb + r}" for r in range(rpb)
        )
        + ")"
        for b in range(bands)
    ]
    est = " + ".join(
        f"CAST(a.mh_{i} = b.mh_{i} AS INT)" for i in range(num_hashes)
    )
    return f"""
        WITH sig AS (SELECT * FROM read_parquet('{_stage_glob("minhash_sigs")}'))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               (({est}) / {num_hashes}.0)::DOUBLE AS est_jaccard
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE ({" OR ".join(band_preds)})
          AND ({est}) / {num_hashes}.0 >= 0.5
        ORDER BY id_a, id_b
    """


def _simhash_stage_oracle_sql() -> str:
    """Direct quadratic hamming join over the staged simhash Parquet —
    deliberately STRONGER than mirroring the pigeonhole blocks: equality
    with the Spark result proves the (d+1)-block bucketing is lossless."""
    return f"""
        WITH sig AS (SELECT * FROM read_parquet('{_stage_glob("simhash_sigs")}'))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY id_a, id_b
    """


def _phash_stage_oracle_sql() -> str:
    return f"""
        WITH sig AS (SELECT * FROM read_parquet('{_stage_glob("phash_sigs")}'))
        SELECT a.image_id AS id_a, b.image_id AS id_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
        ORDER BY id_a, id_b
    """


def _embedding_stage_oracle_sql(dim: int = 64) -> str:
    """Sketch equi-join + cosine verify over the staged sketch Parquet.
    The cosine mirrors sketch_neardup_pairs' AST exactly: embeddings are
    staged as DOUBLE[], every product of float-derived doubles is exact
    (<=48 mantissa bits), and both engines fold left-to-right
    (F.aggregate with 0.0 init == list_reduce starting at the first
    element, since 0.0 + v1 is exact) — so dot, norms, and the final
    divide round identically and the DOUBLE output matches bit-for-bit."""
    prods = f"list_transform(range(1, {dim + 1}), i -> a.embedding[i] * b.embedding[i])"
    dot = f"list_reduce({prods}, (x, y) -> x + y)"
    na = "sqrt(list_reduce(list_transform(a.embedding, v -> v * v), (x, y) -> x + y))"
    nb = "sqrt(list_reduce(list_transform(b.embedding, v -> v * v), (x, y) -> x + y))"
    return f"""
        WITH sk AS (SELECT * FROM read_parquet('{_stage_glob("embedding_sketches")}'))
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ({dot} / ({na} * {nb}))::DOUBLE AS cosine
        FROM sk a JOIN sk b
          ON a.sketch = b.sketch AND a.vec_id < b.vec_id
        WHERE {dot} / ({na} * {nb}) >= 0.99
        ORDER BY id_a, id_b
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # geo core (SQL-oracled via rect world)
        "pip_assign_rect": q_pip_assign_rect,
        "pip_assign_first_and_all": q_pip_assign_first_and_all,
        "pip_assign_first_only": q_pip_assign_first_only,
        # relational operator families (SURVEY §2)
        "bbox_agg": q_bbox_agg,
        "envelope_prune": q_envelope_prune,
        "area_rank": q_area_rank,
        "topk_per_group": q_topk_per_group,
        "salted_count": q_salted_count,
        "explode_tokens": q_explode_tokens,
        "tpch_q1": q_tpch_q1,
        "tpch_q3_join": q_tpch_q3,
        "windowed_zone_counts": q_windowed_zone_counts,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        # training-data pipeline (SQL-oracled)
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "ann_topk": q_ann_topk,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "length_stats": q_length_stats,
        "distance_boundary_planar": q_distance_boundary_planar,
        "ivf_topk": q_ivf_topk,
        "tar_archive_roundtrip": q_tar_archive_roundtrip,
        "tiling_roundtrip": q_tiling_roundtrip,
        "assign_full_world": q_assign_full_world,
        "assign_bigworld": q_assign_bigworld,
        "assign_region_scoped": q_assign_region_scoped,
        "knn_zones_planar": q_knn_zones_planar,
        "distance_boundary_geodesic": q_distance_boundary_geodesic,
        # stage-oracled (signature table staged to Parquet; the pair-join
        # over it is mirrored by DuckDB on the same file)
        "minhash_lsh": q_minhash_lsh,
        "simhash_pairs": q_simhash,
        "embedding_neardup": q_embedding_neardup,
        "phash_neardup": q_phash_neardup,
        "fingerprint": q_fingerprint,
        # geodesic ops (round 4: recursive-CTE Vincenty mirror)
        "distance_boundary": q_distance_boundary,
        "knn_zones": q_knn_zones,
        # multimodal (round 4: stage-oracled — binary decode/FFT stay
        # pytest-pinned; all downstream math value-verified on the
        # staged decode tables)
        "image_features": q_image_features,
        "image_resize": q_image_resize,
        "audio_features": q_audio_features,
        "video_frame_sample": q_video_frame_sample,
        "payload_verify": q_payload_verify,
        "hot_cells": q_hot_cells,
    }


def rect_case_sql() -> str:
    return """CASE
          WHEN lat BETWEEN 4 AND 5 AND lon BETWEEN 4 AND 5 THEN 'Zone/Small'
          WHEN lat BETWEEN 3 AND 6 AND lon BETWEEN 3 AND 6 THEN 'Zone/Big'
          ELSE 'Zone/Filler'
        END"""


def _rect_planar_dist_sql(lat0, lon0, lat1, lon1) -> str:
    """SQL mirroring geom.planar_distance_from_boundary AST-for-AST on
    one rectangle piece: per segment t = clip(((p-a)·d)/len2), foot =
    a + t*d, d² = |p-foot|²; sqrt(min d²). Every constant is the exact
    double the engine computes (len2 included), and every operation
    appears in the same order, so DuckDB reproduces the DOUBLE output
    bit-for-bit — simplified formulas (|lat-edge|) drift by ulps on
    long edges where t's rounding feeds back into the foot."""
    from tzengine import geom
    from tzengine.zones import make_piece, _rect

    piece = make_piece("Z", 0, 0, [_rect(lat0, lon0, lat1, lon1)])
    seg_a, seg_b = geom._segments(piece.rings)
    d2_terms = []
    for (ax, ay), (bx, by) in zip(seg_a, seg_b):
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        t = (
            f"least(greatest((((lon - {ax!r}) * {dx!r} "
            f"+ (lat - {ay!r}) * {dy!r}) / {len2!r}), 0.0), 1.0)"
        )
        fx = f"({ax!r} + {t} * {dx!r})"
        fy = f"({ay!r} + {t} * {dy!r})"
        d2_terms.append(
            f"((lon - {fx}) * (lon - {fx}) + (lat - {fy}) * (lat - {fy}))"
        )
    return "sqrt(least(" + ", ".join(d2_terms) + "))"


def _full_world_oracle_sql() -> str:
    zp = _full_world_contains_sql()
    first = (
        "CASE "
        + " ".join(f"WHEN {pred} THEN '{name}'" for name, pred in zp)
        + " END"
    )
    all_str = (
        "concat_ws('|', "
        + ", ".join(f"CASE WHEN {pred} THEN '{name}' END" for name, pred in zp)
        + ")"
    )
    n = " + ".join(f"CAST({pred} AS INT)" for _, pred in zp)
    return f"""
        WITH pts AS (SELECT event_id,
                            (event_id % 1987) / 200.0 AS lat,
                            (event_id * 7 % 1993) / 200.0 AS lon
                     FROM events)
        SELECT event_id,
               {first} AS tzid,
               {all_str} AS tzids_str,
               {n} AS n_zones
        FROM pts ORDER BY event_id
    """


def oracle_sql() -> dict[str, str]:
    rect_case = """
        CASE
          WHEN lat BETWEEN 4 AND 5 AND lon BETWEEN 4 AND 5 THEN 'Zone/Small'
          WHEN lat BETWEEN 3 AND 6 AND lon BETWEEN 3 AND 6 THEN 'Zone/Big'
          ELSE 'Zone/Filler'
        END
    """
    rect_all = """
        concat_ws('|',
          CASE WHEN lat BETWEEN 4 AND 5 AND lon BETWEEN 4 AND 5
               THEN 'Zone/Small' END,
          CASE WHEN lat BETWEEN 3 AND 6 AND lon BETWEEN 3 AND 6
               THEN 'Zone/Big' END,
          'Zone/Filler')
    """
    return {
        "pip_assign_rect": f"""
            SELECT event_id,
                   (event_id % 1987) / 200.0 AS lat,
                   (event_id * 7 % 1993) / 200.0 AS lon,
                   {rect_case} AS tzid
            FROM (SELECT event_id,
                         (event_id % 1987) / 200.0 AS lat,
                         (event_id * 7 % 1993) / 200.0 AS lon
                  FROM events)
            ORDER BY event_id
        """,
        "pip_assign_first_only": f"""
            WITH pts AS (SELECT event_id,
                                (event_id % 1987) / 200.0 AS lat,
                                (event_id * 7 % 1993) / 200.0 AS lon
                         FROM events)
            SELECT event_id, {rect_case} AS tzid
            FROM pts ORDER BY event_id
        """,
        "pip_assign_first_and_all": f"""
            WITH pts AS (SELECT event_id,
                                (event_id % 1987) / 200.0 AS lat,
                                (event_id * 7 % 1993) / 200.0 AS lon
                         FROM events)
            SELECT event_id,
                   {rect_case} AS tzid,
                   {rect_all} AS tzids_str,
                   length({rect_all}) - length(replace({rect_all}, '|', ''))
                     + 1 AS n_zones
            FROM pts ORDER BY event_id
        """,
        "bbox_agg": """
            SELECT l_returnflag,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price,
                   min(l_discount) AS min_disc,
                   max(l_discount) AS max_disc,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "envelope_prune": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE NOT (o_totalprice + 1000.0 < 50000.0 OR o_totalprice > 100000.0)
            ORDER BY o_orderkey
        """,
        "area_rank": """
            SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice ASC, p_partkey ASC)
                     AS area_rank
            FROM part
        """,
        "topk_per_group": """
            SELECT o_orderstatus, o_orderkey, o_totalprice, rk FROM (
              SELECT o_orderstatus, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderstatus
                                        ORDER BY o_totalprice DESC, o_orderkey ASC)
                       AS rk
              FROM orders) WHERE rk <= 3
        """,
        "salted_count": """
            SELECT l_returnflag, count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "explode_tokens": r"""
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                     AS n_tokens,
                   CAST(list_sum(list_transform(
                     regexp_split_to_array(trim(text), '\s+'),
                     w -> CAST(ceil(length(w) / 4.0) AS INT))) AS BIGINT)
                     AS n_tokens_bpe
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact": """
            SELECT sha256(text) AS content_hash,
                   min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY sha256(text) ORDER BY content_hash
        """,
        "ngram_jaccard": r"""
            WITH sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                         i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
                         AS shingle
                FROM documents)
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
            ORDER BY id_a, id_b
        """,
        "dedup_clusters": r"""
            WITH RECURSIVE
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                         i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
                         AS shingle
                FROM documents)
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
            prs AS (
              SELECT id_a, id_b FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE)
                      / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
            edges AS (SELECT id_a AS a, id_b AS b FROM prs
                      UNION SELECT id_b, id_a FROM prs),
            reach(node, lbl) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.a, reach.lbl FROM edges e JOIN reach ON e.b = reach.node
            )
            SELECT node AS doc_id, min(lbl) AS canonical_id
            FROM reach GROUP BY node ORDER BY doc_id
        """,
        "ann_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
            q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(e.emb, q.qv) DESC,
                                e.vec_id ASC) AS rank
              FROM e, q)
            SELECT query_id, vec_id, rank FROM scored
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   avg(l_quantity) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        # planar boundary distance: mirror the engine's per-segment AST
        # (perpendicular foot -> squared -> sqrt) so doubles match
        # bit-for-bit; the containing piece per zone is its one rectangle
        "distance_boundary_planar": f"""
            WITH pts AS (SELECT event_id,
                                (event_id % 1987) / 200.0 AS lat,
                                (event_id * 7 % 1993) / 200.0 AS lon
                         FROM events)
            SELECT event_id,
                   {rect_case_sql()} AS tzid,
                   CASE {rect_case_sql()}
                     WHEN 'Zone/Small' THEN {_rect_planar_dist_sql(4, 4, 5, 5)}
                     WHEN 'Zone/Big' THEN {_rect_planar_dist_sql(3, 3, 6, 6)}
                     ELSE {_rect_planar_dist_sql(0, 0, 10, 10)}
                   END AS dist_deg
            FROM pts ORDER BY event_id
        """,
        "length_stats": r"""
            WITH t AS (
              SELECT doc_id, length(text) AS len,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS w
              FROM documents),
            h AS (
              SELECT doc_id, len,
                     len(list_filter(w, x -> list_contains(
                       ['der','die','das','und','ist','ein','zu'], x))) AS hde,
                     len(list_filter(w, x -> list_contains(
                       ['the','a','and','of','to','in','is'], x))) AS hen,
                     len(list_filter(w, x -> list_contains(
                       ['el','la','los','y','de','un','es'], x))) AS hes,
                     len(list_filter(w, x -> list_contains(
                       ['le','la','et','les','des','un','est'], x))) AS hfr
              FROM t),
            lp AS (
              SELECT len,
                     CASE WHEN greatest(hde, hen, hes, hfr) = 0 THEN 'und'
                          WHEN hfr = greatest(hde, hen, hes, hfr) THEN 'fr'
                          WHEN hes = greatest(hde, hen, hes, hfr) THEN 'es'
                          WHEN hen = greatest(hde, hen, hes, hfr) THEN 'en'
                          ELSE 'de' END AS lang_pred
              FROM h)
            SELECT lang_pred,
                   count(*) AS n_docs,
                   avg(len) AS mean_len,
                   quantile_cont(len, 0.5) AS p50_len,
                   quantile_cont(len, 0.9) AS p90_len
            FROM lp GROUP BY lang_pred ORDER BY lang_pred
        """,
        # full synthetic world: even-odd + boundary-inclusive containment
        # over axis-aligned f32-grid rectangles, generated from the same
        # pieces the engine ingests
        "assign_full_world": _full_world_oracle_sql(),
        "hot_cells": _hot_cells_oracle_sql(),
        # round-3 additions: the binary tar ingest path verified by VALUE
        # (same containment SQL as assign_full_world, grouped per zone),
        # the IVF approximate path (centroid choice + bucketing + probes
        # + final order all mirrored), and the raster<->vector tiling
        # round-trip (axis-aligned raster classification + sibling-quad
        # merge in pure SQL)
        "tar_archive_roundtrip": _tar_roundtrip_oracle_sql(),
        "ivf_topk": _ivf_topk_oracle_sql(),
        "tiling_roundtrip": _tiling_oracle_sql(),
        # round-4: stage-oracles — the hash-signature computations stay
        # pytest-pinned (xxhash64 / pandas UDFs aren't DuckDB-portable),
        # but the pair-joins over them are value-verified on the staged
        # signature Parquet the Spark query itself wrote (VERDICT r3 #4/#5)
        "minhash_lsh": _minhash_stage_oracle_sql(),
        "simhash_pairs": _simhash_stage_oracle_sql(),
        "phash_neardup": _phash_stage_oracle_sql(),
        "embedding_neardup": _embedding_stage_oracle_sql(),
        "knn_zones_planar": _knn_planar_oracle_sql(),
        "distance_boundary_geodesic": _vincenty_geodesic_oracle_sql(),
        "distance_boundary": _world_distance_oracle_sql(),
        "knn_zones": _world_knn_oracle_sql(),
        "audio_features": f"""
            WITH t AS (SELECT * FROM read_parquet('{_stage_glob("audio_decode")}')),
            r AS (
              SELECT clip_id, sample_rate, n_samples,
                CAST(n_samples AS DOUBLE) / sample_rate AS duration_s,
                CASE WHEN len(samples) > 0 THEN
                  sqrt(list_sum(list_transform(samples, v -> v * v))
                       / len(samples))
                ELSE 0.0 END AS rms,
                CASE WHEN len(samples) > 1 THEN
                  CAST(list_sum(list_transform(range(1, len(samples)),
                         i -> CAST(((samples[i + 1] < 0) <> (samples[i] < 0))
                                   AS INT))) AS DOUBLE)
                    / (len(samples) - 1)
                ELSE 0.0 END AS zcr,
                CASE WHEN list_sum(spec) <> 0 THEN
                  list_sum(list_transform(range(1, len(spec) + 1),
                           i -> freqs[i] * spec[i])) / list_sum(spec)
                ELSE 0.0 END AS centroid
              FROM t)
            SELECT clip_id, sample_rate, n_samples, duration_s,
                   CAST(floor(rms * 1000000000.0) AS BIGINT) AS rms_nano,
                   zcr,
                   CAST(floor(centroid * 1000000.0) AS BIGINT) AS centroid_u
            FROM r ORDER BY clip_id
        """,
        "video_frame_sample": f"""
            SELECT video_id, frame_no, w, h, hex(bytes) AS frame_hex
            FROM read_parquet('{_stage_glob("video_frames")}')
            WHERE frame_no % 5 = 0
            ORDER BY video_id, frame_no
        """,
        # payload_verify: every verdict recomputed from the staged raw
        # ingredients. The fidelity magnitude is the INTEGER MSE
        # numerator (sum of squared uint8 diffs — exact in both engines,
        # any summation order); NO libm output is compared (r4's one red
        # row was a log10-within-an-ulp-of-a-millidB floor flip)
        "payload_verify": f"""
            WITH t AS (SELECT * FROM read_parquet('{_stage_glob("payload_verify")}')),
            m AS (
              SELECT *,
                CAST(list_sum(list_transform(range(1, len(px) + 1),
                       i -> CAST((px[i] - ex[i]) * (px[i] - ex[i]) AS BIGINT)))
                  AS BIGINT) AS mse_num
              FROM t),
            v AS (
              SELECT fmt, mse_num, CAST(len(px) AS BIGINT) AS n_px,
                CASE WHEN fmt IN ('raw', 'png') THEN px = ex
                     ELSE (CASE WHEN mse_num = 0 THEN 999.0
                           ELSE 10.0 * log10(65025.0 * len(px) / mse_num) END)
                          >= 40.0
                END AS pixels_ok,
                caption = exp_caption AS caption_ok,
                bit_count(xor(phash_decoded, phash)) <= 2 AS phash_ok
              FROM m)
            SELECT fmt, count(*) AS n,
                   SUM(CAST(pixels_ok AS BIGINT)) AS n_pixels_ok,
                   SUM(CAST(caption_ok AS BIGINT)) AS n_caption_ok,
                   SUM(CAST(phash_ok AS BIGINT)) AS n_phash_ok,
                   max(mse_num) AS max_mse_num,
                   max(n_px) AS n_px
            FROM v GROUP BY fmt ORDER BY fmt
        """,
        # image_resize: expected output pixels recomputed from the STAGED
        # source decode table with the operator's integer index math
        # (yi=(oy*h)//12, xi=(ox*w)//16, row-major src=yi*w+xi); the
        # position-weighted checksums make any wrong gather index change
        # the value. All integer-exact.
        "image_resize": f"""
            WITH t AS (SELECT image_id, w, h, fmt, r_px, g_px, b_px
                       FROM read_parquet('{_stage_glob("resize_src")}')),
            e AS (
              SELECT image_id,
                     CASE WHEN fmt = 'q6' THEN 'raw' ELSE fmt END AS fmt,
                     list_transform(range(0, 192), i ->
                        ((i // 16) * h) // 12 * w + ((i % 16) * w) // 16 + 1
                     ) AS src_i,
                     r_px, g_px, b_px
              FROM t)
            SELECT image_id, fmt, CAST(192 AS BIGINT) AS n_px,
              CAST(list_sum(list_transform(src_i, s -> r_px[s])) AS BIGINT) AS sum_r,
              CAST(list_sum(list_transform(range(1, 193),
                   j -> r_px[src_i[j]] * j)) AS BIGINT) AS wsum_r,
              CAST(list_sum(list_transform(src_i, s -> g_px[s])) AS BIGINT) AS sum_g,
              CAST(list_sum(list_transform(range(1, 193),
                   j -> g_px[src_i[j]] * j)) AS BIGINT) AS wsum_g,
              CAST(list_sum(list_transform(src_i, s -> b_px[s])) AS BIGINT) AS sum_b,
              CAST(list_sum(list_transform(range(1, 193),
                   j -> b_px[src_i[j]] * j)) AS BIGINT) AS wsum_b
            FROM e ORDER BY image_id
        """,
        "image_features": f"""
            WITH t AS (SELECT * FROM read_parquet('{_stage_glob("image_decode")}')),
            g AS (
              SELECT *, list_reduce(gray, (x, y) -> x + y) / len(gray) AS gm
              FROM t)
            SELECT image_id, w, h, fmt,
                   CAST(list_sum(r_px) AS DOUBLE) / len(r_px) AS mean_r,
                   CAST(list_sum(g_px) AS DOUBLE) / len(g_px) AS mean_g,
                   CAST(list_sum(b_px) AS DOUBLE) / len(b_px) AS mean_b,
                   CAST(floor(sqrt(
                     list_reduce(list_transform(gray, v -> (v - gm) * (v - gm)),
                                 (x, y) -> x + y) / len(gray)
                   ) * 1000000.0) AS BIGINT) AS std_gray_u,
                   phash_decoded
            FROM g ORDER BY image_id
        """,
        "fingerprint": f"""
            SELECT doc_id, fingerprint,
                   list_min(gram_hashes) AS fingerprint_min_ngram
            FROM read_parquet('{_stage_glob("fingerprint_grams")}')
            ORDER BY doc_id
        """,
        "assign_bigworld": _bigworld_oracle_sql(),
        "assign_region_scoped": _region_scoped_oracle_sql(),
        "windowed_zone_counts": _windowed_zone_counts_oracle_sql(),
        "tpch_q3_join": """
            SELECT l_orderkey,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT)
                     AS order_epoch_day,
                   o_orderpriority,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_orderkey = o_orderkey
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY l_orderkey
        """,
        "asof_join": """
            WITH upd AS (
              SELECT user_id, ts, max(value) AS upd_value
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id, ts),
            l AS (SELECT event_id, user_id, ts FROM events)
            SELECT l.event_id, u.upd_value AS asof_upd_value
            FROM l ASOF LEFT JOIN upd u
              ON l.user_id = u.user_id AND l.ts >= u.ts
            ORDER BY l.event_id
        """,
        "range_join": """
            WITH bands AS (
              SELECT n_nationkey AS band_id,
                     n_nationkey * 6000.0 AS lo,
                     n_nationkey * 6000.0 + 9000.0 AS hi
              FROM nation)
            SELECT o.o_orderkey, b.band_id
            FROM orders o JOIN bands b
              ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
            ORDER BY o.o_orderkey, b.band_id
        """,
        # quality_score: \w and \s classes agree between Java regex and
        # RE2 for this ASCII corpus; integer/integer division yields
        # double in both engines; the composite score is a sum of 0.25
        # steps (exact in binary)
        "quality_score": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS words,
                     length(text) AS n_chars,
                     length(text)
                       - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS punct
              FROM documents),
            m AS (
              SELECT doc_id, n_chars, punct,
                     len(words) AS n_words,
                     len(list_intersect(words,
                       ['the','a','and','of','to','in','is',
                        'it','that','for','on','with'])) AS n_stop
              FROM t)
            SELECT doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   (CASE WHEN n_words >= 10 AND n_words <= 100000
                         THEN 0.25 ELSE 0.0 END
                    + CASE WHEN (n_chars - n_words + 1)
                                  / greatest(n_words, 1) >= 2.0
                            AND (n_chars - n_words + 1)
                                  / greatest(n_words, 1) <= 12.0
                           THEN 0.25 ELSE 0.0 END
                    + CASE WHEN punct / greatest(n_chars, 1) <= 0.2
                           THEN 0.25 ELSE 0.0 END
                    + CASE WHEN n_stop / greatest(n_words, 1) >= 0.01
                           THEN 0.25 ELSE 0.0 END)::DOUBLE AS quality_score
            FROM m ORDER BY doc_id
        """,
        # lang_id: per-language profile-word occurrence counts; argmax
        # tie-break = lexicographically larger language id (the Spark
        # side's array_max over (hits, lang) structs)
        "lang_id": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS w
              FROM documents),
            h AS (
              SELECT doc_id,
                     len(list_filter(w, x -> list_contains(
                       ['der','die','das','und','ist','ein','zu'], x))) AS hde,
                     len(list_filter(w, x -> list_contains(
                       ['the','a','and','of','to','in','is'], x))) AS hen,
                     len(list_filter(w, x -> list_contains(
                       ['el','la','los','y','de','un','es'], x))) AS hes,
                     len(list_filter(w, x -> list_contains(
                       ['le','la','et','les','des','un','est'], x))) AS hfr
              FROM t)
            SELECT doc_id,
                   CASE WHEN greatest(hde, hen, hes, hfr) = 0 THEN 'und'
                        WHEN hfr = greatest(hde, hen, hes, hfr) THEN 'fr'
                        WHEN hes = greatest(hde, hen, hes, hfr) THEN 'es'
                        WHEN hen = greatest(hde, hen, hes, hfr) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM h ORDER BY doc_id
        """,
    }
