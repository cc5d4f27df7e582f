"""Round-9 second-wave query faces.

A mergeable Bloom-filter membership store (the set-membership sibling
of the KMV/HLL/CM sketch family, md5-positional and therefore fully
SQL-replayable — sketch, merge, membership, AND estimate), a robust
MAD outlier screen (exact lower medians via the value-histogram
cumulative method), and a two-sample Kolmogorov–Smirnov drift test
whose statistic is found by EXACT INTEGER maximization (one double
division at the very end).

Registered into the same ``QUERIES``/``ORACLES`` registry as
:mod:`datawarehousefinal_spark.queries` (imported from its tail, before
the driver-window reorder — these faces land after the frozen round-9
window and enter the rotation next round). Reference parity: these
extend the reference's analytics layer (machineLearning.py:118-131
class-balance / distribution reporting) with the membership-audit,
robust-outlier, and distribution-drift screens a warehouse team runs
on the same facts; all three belong equally to the beyond-reference
LLM-data-pipeline surface (ingest membership dedup, quality outlier
pruning, corpus drift gates).

Hash-stability discipline (module contract, same as queries_r8): every
double reaching the driver hash is a single division/ln of exact
integers, raw input values through order-invariant folds, or a
positive product of those — no cancellation, no transcendental feeding
an ORDER BY cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehousefinal_spark.queries import query
from datawarehousefinal_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Bloom filter membership store
# ---------------------------------------------------------------------------

_BLOOM_M = 8192
_BLOOM_K = 4
_BLOOM_SEED = 42
_BLOOM_PROBE_PRESENT = 1  # a user id that exists in every fixture sf
_BLOOM_PROBE_ABSENT = -987654321  # outside the generator's id space


def _bloom_probe_sqls() -> tuple[str, str, int, int]:
    """Literal position lists for the two probes, computed ONCE with the
    driver-side md5 twin and embedded in both the Spark face and the
    SQL oracle (the frozen-centroid pattern: identical literals on both
    engines; the bitsets they are tested against are still derived
    engine-side from raw md5)."""
    from datawarehousefinal_spark.operators.sketches import (
        bloom_probe_positions,
    )

    pa = bloom_probe_positions(
        _BLOOM_PROBE_PRESENT, _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    pb = bloom_probe_positions(
        _BLOOM_PROBE_ABSENT, _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    return (
        ", ".join(str(p) for p in pa),
        ", ".join(str(p) for p in pb),
        len(pa),
        len(pb),
    )


def _bloom_oracle() -> str:
    pa_sql, pb_sql, n_pa, n_pb = _bloom_probe_sqls()
    return f"""
    WITH pos AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             ('0x' || substr(md5(user_id::VARCHAR || ':{_BLOOM_SEED}:'
                                 || u.j::VARCHAR), 1, 15))::BIGINT
               % {_BLOOM_M} AS p
      FROM events, unnest([{", ".join(map(str, range(_BLOOM_K)))}]) AS u(j)
    ),
    bits AS (
      SELECT day, p FROM pos
      UNION ALL
      SELECT DISTINCT 'ALL' AS day, p FROM pos
    ),
    srv AS (SELECT day, count(*)::BIGINT AS bits_set FROM bits GROUP BY 1),
    ma AS (
      SELECT day, count(DISTINCT p)::BIGINT AS hit FROM bits
      WHERE p IN ({pa_sql}) GROUP BY 1
    ),
    mb AS (
      SELECT day, count(DISTINCT p)::BIGINT AS hit FROM bits
      WHERE p IN ({pb_sql}) GROUP BY 1
    )
    SELECT s.day,
           coalesce(ma.hit, 0) = {n_pa} AS has_probe_present,
           coalesce(mb.hit, 0) = {n_pb} AS has_probe_absent,
           s.bits_set,
           s.bits_set / {_BLOOM_M}.0 AS fill_ratio,
           CASE WHEN s.bits_set < {_BLOOM_M}
                THEN -{_BLOOM_M / _BLOOM_K} * ln(1 - s.bits_set / {_BLOOM_M}.0)
           END AS distinct_est
    FROM srv s
    LEFT JOIN ma ON s.day = ma.day
    LEFT JOIN mb ON s.day = mb.day
    """


@query("bloom_filter_store_daily", oracle=_bloom_oracle())
def bloom_filter_store_daily_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Bloom membership store, ORACLE-EXACT end-to-end: per-day
    filters over distinct event users (md5-positional — the engine-
    portable construction shared with the KMV/CM stores), PLUS the
    all-period row obtained by MERGING the daily filters, which the
    oracle rebuilds directly from the full stream — hash equality IS
    the merge ≡ rebuild proof (position-set union = bitwise OR). Each
    row also serves two membership probes (a present user id, an
    impossible one — positions are frozen literals on both engines, the
    bitsets they test against are engine-derived), the fill ratio, and
    the Swamidass–Baldi cardinality estimate (-(m/k)·ln(1-fill), one
    ln of an exact rational). 100 TB shape: a group's state is ≤ m
    ints regardless of data volume; build is one distinct + bounded
    k-way fan-out, map-side combined; merge never touches raw data."""
    from datawarehousefinal_spark.operators.sketches import (
        bloom_build_store,
        bloom_contains_literal,
        bloom_estimate,
        bloom_merge,
        bloom_probe_positions,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"), "user_id"
    )
    store = bloom_build_store(
        ev, ["day"], "user_id", _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    merged = bloom_merge(store.withColumn("day", F.lit("ALL")), ["day"])
    both = store.unionByName(merged.select(*store.columns))
    pa = bloom_probe_positions(
        _BLOOM_PROBE_PRESENT, _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    pb = bloom_probe_positions(
        _BLOOM_PROBE_ABSENT, _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    probed = both.select(
        "day",
        bloom_contains_literal(F.col("bits"), pa).alias(
            "has_probe_present"
        ),
        bloom_contains_literal(F.col("bits"), pb).alias("has_probe_absent"),
        "bits",
        "bits_set",
    )
    return bloom_estimate(probed, _BLOOM_M, _BLOOM_K)


# ---------------------------------------------------------------------------
# KMV set algebra: day-over-day user overlap from the sketch store
# ---------------------------------------------------------------------------

@query(
    "kmv_day_overlap",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(concat('0x', substr(md5(user_id::VARCHAR || ':42'),
                  1, 15)) AS BIGINT) AS h
      FROM events
    ),
    rk AS (
      SELECT day, h,
             row_number() OVER (PARTITION BY day ORDER BY h) AS rn
      FROM h
    ),
    sk AS (
      SELECT day, list_sort(list(h)) AS kmv, count(*)::BIGINT AS n_seen
      FROM rk WHERE rn <= 64 GROUP BY 1
    ),
    pr AS (
      SELECT a.day AS day_a, b.day AS day_b,
             a.n_seen AS n_a, b.n_seen AS n_b,
             a.kmv AS ka, b.kmv AS kb
      FROM sk a JOIN sk b
        ON CAST(b.day AS DATE) = CAST(a.day AS DATE) + INTERVAL 1 DAY
    ),
    est AS (
      SELECT day_a, day_b, n_a, n_b, ka, kb,
             list_sort(list_distinct(ka || kb)) AS uni
      FROM pr
    ),
    est2 AS (SELECT *, uni[1:64] AS u_k FROM est)
    SELECT day_a, day_b, n_a, n_b,
           len(list_intersect(list_intersect(u_k, ka), kb))
             / (1.0 * len(u_k)) AS est_jaccard,
           CASE WHEN len(uni) < 64 THEN len(uni)::DOUBLE
                ELSE 63.0 / (u_k[64] / 1152921504606846976.0)
           END AS est_union,
           len(list_intersect(list_intersect(u_k, ka), kb))
             / (1.0 * len(u_k))
             * (CASE WHEN len(uni) < 64 THEN len(uni)::DOUBLE
                     ELSE 63.0 / (u_k[64] / 1152921504606846976.0)
                END) AS est_intersection
    FROM est2
    """,
)
def kmv_day_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day user overlap straight from the KMV sketch store
    (sketches.kmv_overlap — Beyer et al. 2007's set-algebra result):
    for each consecutive-day pair, estimated Jaccard, union size, and
    intersection size of the two days' user sets, computed from ≤ k
    longs per day — the retention question ("how many of yesterday's
    users came back") answered WITHOUT rescanning events, which at
    100 TB is the whole point of keeping a sketch store. md5 hashing
    makes every estimate SQL-replayable; the estimators are exact
    integer-array algebra plus single divisions, hash-stable by
    construction."""
    from datawarehousefinal_spark.operators.sketches import (
        kmv_build_store,
        kmv_overlap,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"), "user_id"
    )
    store = kmv_build_store(ev, ["day"], "user_id", k=64)
    a = store.select(
        F.col("day").alias("day_a"),
        F.col("kmv").alias("__ka"),
        F.col("n_seen").alias("n_a"),
    )
    b = store.select(
        F.col("day").alias("day_b"),
        F.col("kmv").alias("__kb"),
        F.col("n_seen").alias("n_b"),
    )
    pairs = a.join(
        b,
        F.date_add(F.to_date("day_a"), 1) == F.to_date("day_b"),
    ).select("day_a", "day_b", "n_a", "n_b", "__ka", "__kb")
    return kmv_overlap(pairs, "__ka", "__kb", k=64).drop("__ka", "__kb")


# ---------------------------------------------------------------------------
# Bloom runtime-filter semi-join
# ---------------------------------------------------------------------------

@query(
    "bloom_semijoin_revenue",
    oracle="""
    SELECT count(*)::BIGINT AS n_lineitems,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def bloom_semijoin_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic RUNTIME-FILTER join as an explicit store-backed
    operator: urgent-order revenue where the fact side is pre-filtered
    by the md5-positional Bloom filter of the selective dim side's keys
    BEFORE the exact join (sketches.bloom_prefilter — k broadcast LEFT
    SEMI hash joins on the sparse positions table, all map-side). At
    100 TB the dim's key set can be too big to broadcast, but its Bloom
    filter is bounded by m_bits rows forever, so the fact shuffle moves
    only the may-match fraction; a persisted store row prefilters
    tomorrow's ingest with no recomputation (Catalyst's
    InjectRuntimeFilter applies the same trick when it can prove it —
    this face makes it a reusable, storable surface). The filter is
    only a MAY-CONTAIN prefilter — the exact join follows — so the
    result is exactly the plain join's, and the oracle IS the plain
    join: hash equality proves the prefilter is semantically
    transparent, false positives and all. A runtime guard asserts the
    semi-join probes made it into the physical plan."""
    from datawarehousefinal_spark.operators.sketches import (
        bloom_build_store,
        bloom_prefilter,
    )
    from datawarehousefinal_spark.plans import physical_plan
    from datawarehousefinal_spark.queries import _money_sum

    m_bits, k = 262144, 2
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    store = bloom_build_store(
        keys.withColumn("__g", F.lit(1)), ["__g"], "o_orderkey", m_bits, k
    )
    positions = store.select(F.explode("bits").alias("p"))
    li = bloom_prefilter(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ),
        "l_orderkey",
        positions,
        m_bits,
        k,
    )
    res = li.join(
        keys, li["l_orderkey"] == keys["o_orderkey"]
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        _money_sum("l_extendedprice").alias("revenue"),
    )
    if physical_plan(res).count("LeftSemi") < k:
        raise RuntimeError("bloom prefilter semi-joins missing from plan")
    return res


# ---------------------------------------------------------------------------
# MAD robust outlier screen
# ---------------------------------------------------------------------------

@query(
    "mad_outlier_report",
    oracle="""
    WITH v AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    h1 AS (SELECT event_type, value, count(*)::BIGINT AS c
           FROM v GROUP BY 1, 2),
    c1 AS (
      SELECT event_type, value,
             sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM h1
    ),
    med AS (
      SELECT event_type, min(value) AS med FROM c1
      WHERE cum * 2 >= n GROUP BY 1
    ),
    d AS (
      SELECT v.event_type, abs(v.value - m.med) AS dev, m.med
      FROM v JOIN med m USING (event_type)
    ),
    h2 AS (SELECT event_type, dev, count(*)::BIGINT AS c
           FROM d GROUP BY 1, 2),
    c2 AS (
      SELECT event_type, dev,
             sum(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM h2
    ),
    mad AS (
      SELECT event_type, min(dev) AS mad FROM c2
      WHERE cum * 2 >= n GROUP BY 1
    )
    SELECT d.event_type,
           count(*)::BIGINT AS n_rows,
           min(d.med) AS median_value,
           min(md.mad) AS mad_value,
           sum(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers
    FROM d JOIN mad md USING (event_type)
    GROUP BY 1
    """,
)
def mad_outlier_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event type: exact lower median of the
    value, the MAD (lower median of |x − median|), and how many rows sit
    beyond the classic 3×MAD fence — the quality gate that survives the
    heavy tails that wreck a mean/stddev z-score. Both medians use the
    value-histogram cumulative method (analytics.grouped_exact_median —
    windows over |distinct values| per group, never rows; no
    interpolation, so no new floats: every hashed double is a raw input
    value, an |x − med| single subtraction, or an exact count)."""
    from datawarehousefinal_spark.operators.analytics import (
        grouped_exact_median,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    med = grouped_exact_median(ev, ["event_type"], "value").withColumnRenamed(
        "median", "__med"
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "__dev", F.abs(F.col("value") - F.col("__med"))
    )
    mad = grouped_exact_median(
        dev.select("event_type", "__dev"), ["event_type"], "__dev"
    ).withColumnRenamed("median", "__mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__med").alias("median_value"),
            F.min("__mad").alias("mad_value"),
            F.sum(
                (F.col("__dev") > 3 * F.col("__mad")).cast("bigint")
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test
# ---------------------------------------------------------------------------

@query(
    "ks_drift_report",
    oracle="""
    WITH v AS (
      SELECT o_totalprice AS val, (o_orderkey % 2 = 0) AS is_a FROM orders
    ),
    h AS (
      SELECT val,
             sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS ca,
             sum(CASE WHEN is_a THEN 0 ELSE 1 END)::BIGINT AS cb
      FROM v GROUP BY 1
    ),
    c AS (
      SELECT sum(ca) OVER (ORDER BY val)::BIGINT AS cum_a,
             sum(cb) OVER (ORDER BY val)::BIGINT AS cum_b
      FROM h
    ),
    t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM h),
    m AS (
      SELECT max(abs(cum_a * (SELECT nb FROM t)
                     - cum_b * (SELECT na FROM t)))::BIGINT AS d_num
      FROM c
    )
    SELECT (SELECT na FROM t) AS n_a,
           (SELECT nb FROM t) AS n_b,
           d_num,
           CAST(d_num AS DOUBLE)
             / ((SELECT na FROM t) * (SELECT nb FROM t)) AS d_stat,
           CAST(d_num AS DOUBLE)
             / ((SELECT na FROM t) * (SELECT nb FROM t))
             > 1.36 * sqrt(((SELECT na FROM t) + (SELECT nb FROM t))
                           / (1.0 * (SELECT na FROM t)
                              * (SELECT nb FROM t))) AS drifted
    FROM m
    """,
)
def ks_drift_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between the even- and
    odd-orderkey halves of the order-price distribution — the
    distribution-shift gate (training-vs-serving, last-month-vs-this-
    month) that PSI bucketing approximates and KS answers exactly. The
    statistic D = max|ECDF_a − ECDF_b| is found by EXACT INTEGER
    maximization: collapse to the pooled value histogram (map-side
    combined), cumulative (ca, cb) via the distributed two-phase prefix
    sum (packing.distributed_cumsum — no global single-partition
    window), then maximize |ca·nb − cb·na| in BIGINT; ONE double
    division serves D, and the α=0.05 verdict compares against the
    1.36·sqrt((na+nb)/(na·nb)) critical value. Cross-engine-safe: the
    argmax value is exact, so no ulp can move the reported maximum."""
    from datawarehousefinal_spark.operators.packing import distributed_cumsum

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("val"),
        (F.col("o_orderkey") % 2 == 0).alias("is_a"),
    )
    h = orders.groupBy("val").agg(
        F.sum(F.col("is_a").cast("bigint")).alias("ca"),
        F.sum((~F.col("is_a")).cast("bigint")).alias("cb"),
    )
    # ONE two-phase pass cumulates both halves (was: two chained passes,
    # the second one's boundary sample re-running the first's whole chain)
    c = distributed_cumsum(h, ["val"], ["ca", "cb"], ["cum_a", "cum_b"])
    t = h.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    m = (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("nb")
                    - F.col("cum_b") * F.col("na")
                )
            ).alias("d_num")
        )
    )
    d_stat = F.col("d_num").cast("double") / (F.col("na") * F.col("nb"))
    crit = F.lit(1.36) * F.sqrt(
        (F.col("na") + F.col("nb"))
        / (F.lit(1.0) * F.col("na") * F.col("nb"))
    )
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "d_num",
            d_stat.alias("d_stat"),
            (d_stat > crit).alias("drifted"),
        )
    )
