"""Mergeable sketch stores — HLL distinct counts and KLL quantiles
maintained incrementally, no history rescan.

Beyond-reference scale surface (SURVEY.md §7 P7). At 100 TB the question
"how many distinct users ever / what's the p99 so far" cannot re-scan
history nightly; the standard answer is a *mergeable sketch store*: one
small binary sketch per partition (day), merged on demand for any
grouping, appended per batch. Spark ships Apache DataSketches aggregates
(`hll_sketch_agg` / `hll_union_agg`, `kll_sketch_agg_double` /
`kll_sketch_merge_double`, Spark 3.5+) — everything here is a JVM-side
aggregate over those, so sketches merge map-side and the store's row
count is the number of partitions, not the number of events.

Error contracts (public DataSketches bounds): HLL relative standard
error ≈ 1.04 / sqrt(2^lgk) (~1.6% at lgk=12); KLL rank error ~1.65% at
k=200. Estimates are deterministic for a fixed input multiset and
parameters (the sketches hash values, no run-time randomness), so
append-vs-rebuild equality is an exact assertion, not a tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_build_store(
    df: DataFrame,
    key_col: str,
    part_cols: list[str],
    lgk: int = 12,
) -> DataFrame:
    """Per-partition HLL sketch store: one row per ``part_cols`` group
    holding a binary sketch of the distinct ``key_col`` values plus its
    estimate. The aggregate partial-combines map-side — only sketches
    cross the wire, never keys."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    ).withColumn(
        "distinct_est", F.hll_sketch_estimate("sketch").cast("long")
    )


def hll_append(store: DataFrame, batch_sketches: DataFrame,
               part_cols: list[str]) -> DataFrame:
    """Merge a new batch's per-partition sketches into the store —
    sketch-union per partition key, counts added. Partitions seen only
    on one side pass through; history is never rescanned."""
    merged = (
        store.select(*part_cols, "sketch", "n_rows")
        .unionByName(batch_sketches.select(*part_cols, "sketch", "n_rows"))
        .groupBy(*part_cols)
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
    )
    return merged.withColumn(
        "distinct_est", F.hll_sketch_estimate("sketch").cast("long")
    )


def hll_rollup(store: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct estimate at a coarser grain by sketch-union (e.g. daily
    store → monthly / global distincts) — the merge that a raw
    count(distinct) would need a full re-shuffle of history for."""
    agg = [
        F.hll_union_agg("sketch").alias("sketch"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    ]
    g = store.groupBy(*group_cols).agg(*agg) if group_cols else store.agg(*agg)
    return g.withColumn(
        "distinct_est", F.hll_sketch_estimate("sketch").cast("long")
    )


def kll_build_store(
    df: DataFrame,
    value_col: str,
    part_cols: list[str],
    k: int = 200,
) -> DataFrame:
    """Per-partition KLL quantile sketch store over a double column."""
    return df.filter(F.col(value_col).isNotNull()).groupBy(*part_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def _kll_fold(sketches: Column) -> Column:
    """Fold an array of KLL sketches with the pairwise merge scalar
    (``kll_sketch_merge_double`` is binary, not an aggregate): first
    element seeds the fold, the rest merge in. KLL merge is
    order-insensitive for the readouts we expose. Fan-in per group is
    the store's partition count for that group — sketches are ~KB, so
    even a 10k-day global rollup folds a few MB on one task."""
    rest = F.slice(sketches, 2, F.greatest(F.size(sketches) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        F.element_at(sketches, 1),
        lambda acc, s: F.kll_sketch_merge_double(acc, s),
    )


def kll_quantiles(
    store: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge the store's sketches (optionally per group) and read out
    quantiles — one row per group with ``q_<pct>`` double columns."""
    group_cols = group_cols or []
    agg = [
        F.collect_list("sketch").alias("__sketches"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    ]
    g = store.groupBy(*group_cols).agg(*agg) if group_cols else store.agg(*agg)
    g = g.withColumn("sketch", _kll_fold(F.col("__sketches")))
    cols = [
        F.kll_sketch_get_quantile_double("sketch", F.lit(float(q)))
        .alias(f"q_{int(round(q * 100)):02d}")
        for q in quantiles
    ]
    return g.select(*group_cols, F.col("n_rows"), *cols)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (two-pass exact)
# ---------------------------------------------------------------------------

def misra_gries_summaries(
    df: DataFrame, value_col: str, summary_size: int = 4096
) -> DataFrame:
    """Per-task Misra-Gries frequency summaries over ``value_col``.

    One Arrow batch at a time: exact in-batch ``value_counts`` merged
    into a running per-task summary; whenever the summary exceeds
    ``summary_size`` entries, the (m+1)-th largest weight is subtracted
    from every entry and non-positive entries drop — the classic MG
    decrement, vectorized. Emits one ``(value, mg_weight)`` frame per
    task.

    Guarantees (Misra-Gries / mergeable-summaries, public results):
    weights UNDERCOUNT, and for any value
    ``true_count - total_n/(summary_size+1) <= mg_weight <= true_count``
    — summing summaries across tasks preserves the bound because MG
    summaries are mergeable. Memory is O(summary_size) per task
    regardless of stream length or distinct cardinality; the long tail
    of distinct values never reaches the shuffle.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    field = df.schema[value_col]
    out_schema = StructType(
        [
            StructField(value_col, field.dataType, True),
            StructField("mg_weight", LongType(), False),
        ]
    )
    m = int(summary_size)

    def gen(batches):
        s = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[value_col].dropna().value_counts()
            s = s.add(vc, fill_value=0) if len(s) else vc.astype("int64")
            if len(s) > m:
                thr = s.nlargest(m + 1).iloc[-1]
                s = s[s > thr] - thr
        if len(s):
            yield pd.DataFrame(
                {value_col: s.index, "mg_weight": s.to_numpy("int64")}
            )

    return df.select(value_col).mapInPandas(gen, out_schema)


def heavy_hitters_exact(
    df: DataFrame,
    value_col: str,
    k: int,
    summary_size: int = 4096,
    slack: int = 4,
) -> DataFrame:
    """Exact top-``k`` heavy hitters without shuffling the long tail.

    Pass 1 (candidates): per-task Misra-Gries summaries
    (``misra_gries_summaries``) are sum-merged — only O(tasks x
    summary_size) rows cross the wire — and the top ``k*slack`` values
    by merged weight are collected (tiny by contract). Pass 2 (exact):
    the input is re-scanned filtered to the candidate set (an `isin`
    literal — pushes to the parquet scan) and counted exactly; output is
    ordered (count desc, value) and limited to ``k``.

    The result equals a full ``GROUP BY``-everything top-k whenever the
    k-th item's true frequency exceeds ``n/(summary_size+1)`` (the MG
    error bound) — size ``summary_size`` for the target scale
    accordingly. A plain groupBy-count top-k shuffles every distinct
    value; at 100 TB of tokens (billions of distincts) that shuffle IS
    the job, while this shape moves a few thousand rows per task and
    re-reads the (columnar, pruned) input once more. The caller may
    ``persist`` ``df`` if it is expensive to recompute.
    """
    summaries = misra_gries_summaries(df, value_col, summary_size)
    approx = summaries.groupBy(value_col).agg(
        F.sum("mg_weight").alias("mg_weight")
    )
    cands = [
        r[0]
        for r in approx.orderBy(F.desc("mg_weight"), value_col)
        .limit(int(k) * int(slack))
        .collect()
    ]
    return (
        df.filter(F.col(value_col).isin(cands))
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), value_col)
        .limit(int(k))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — mergeable AND SQL-replayable
# ---------------------------------------------------------------------------


def kmv_build_store(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Per-group KMV distinct sketch: the ``k`` smallest md5-derived
    hash values of the distinct ``value_col`` set (Bar-Yossef et al.'s
    k-minimum-values estimator). The HLL store's replayable sibling:
    same mergeable-store role, slightly worse accuracy per byte — but
    the hash is the engine-portable md5 construction
    (curation.sample_hash), so a SQL oracle can reproduce the sketch
    AND the estimate bit-for-bit, which no engine-internal HLL allows.

    Output: ``*group_cols, kmv (array<long>, ascending), n_seen
    (long — distinct values if < k, else k)``.
    """
    from datawarehousefinal_spark.operators.curation import sample_hash

    from pyspark.sql import Window

    hashes = (
        # NULL values carry no identity — a NULL would hash to NULL and
        # sort into the sketch with engine-dependent NULL ordering
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, sample_hash(value_col, seed).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = hashes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= int(k)
    )
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )


def kmv_merge(store: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge KMV sketches down to a coarser grouping: union the hash
    sets, keep the ``k`` smallest again. ``merge(kmv(A), kmv(B)) ≡
    kmv(A ∪ B)`` exactly (the k smallest of a union are among the k
    smallest of each side), so rollups over any dimension subset come
    from the store alone. The per-output-group window here runs over
    SKETCH rows (≤ |input groups|·k per output group — a global rollup
    of a year of daily sketches is 365·k rows in one task), never over
    the data the sketches summarize."""
    from pyspark.sql import Window

    exploded = store.select(
        *group_cols, F.explode("kmv").alias("__h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = exploded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= int(k)
    )
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )


_KMV_HASH_SPACE = float(1 << 60)  # sample_hash's range


def kmv_estimate(store: DataFrame, k: int = 64) -> DataFrame:
    """Serve distinct-count estimates from a KMV store: EXACT when the
    group held fewer than ``k`` distinct values (the sketch then IS the
    value set), else the classic (k-1)/U(k) estimator with U(k) = the
    k-th smallest normalized hash. Deterministic for fixed inputs — the
    SQL oracle replays estimates exactly — with the published
    ~1/sqrt(k-2) relative error in the estimated regime.

    Output: the group columns + ``n_seen`` + ``distinct_est (double)``.
    """
    kth = F.element_at("kmv", -1).cast("double") / F.lit(_KMV_HASH_SPACE)
    group_cols = [c for c in store.columns if c not in ("kmv", "n_seen")]
    est = F.when(
        F.col("n_seen") < int(k), F.col("n_seen").cast("double")
    ).otherwise((F.lit(float(k)) - 1.0) / kth)
    return store.select(
        *group_cols, "n_seen", est.alias("distinct_est")
    )


def _cm_hash(value_col, j_col, seed: int, width: int):
    """Engine-portable CM row hash: md5(value ':seed:' j) folded to a
    column index — the same md5→BIGINT construction as
    curation.sample_hash, so a SQL oracle reproduces every cell."""
    tagged = F.concat(
        F.col(value_col).cast("string"),
        F.lit(f":{seed}:"),
        F.col(j_col).cast("string"),
    )
    h = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
    return h % width


def cm_build_store(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
    part_cols: list[str] | None = None,
) -> DataFrame:
    """Count–Min sketch of a value column's frequency distribution
    (Cormode & Muthukrishnan 2005): ``depth`` hash rows × ``width``
    counters, stored SPARSE as (j, col, cnt) rows — the mergeable
    frequency-store sibling of the KMV/HLL distinct stores: merging two
    stores is summing cells, and a point estimate min(row_j[h_j(x)])
    NEVER undercounts.

    One pass: each input row fans out to ``depth`` cells (bounded map),
    then one map-side-combined count per (j, col). The md5 cell hash is
    engine-portable, so the whole sketch — not just its answers — is
    SQL-replayable.

    ``part_cols`` makes it a PARTITIONED store (one sketch per group —
    e.g. per day), the build grain that :func:`cm_rollup` climbs.

    Output: *part_cols, j (int), col (long), cnt (long).
    """
    part_cols = part_cols or []
    fanned = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *part_cols,
            value_col,
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        )
        .select(
            *part_cols, "j", _cm_hash(value_col, "j", seed, width).alias("col")
        )
    )
    return fanned.groupBy(*part_cols, "j", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cm_merge(*stores: DataFrame) -> DataFrame:
    """Merge CM stores built with identical (depth, width, seed):
    cell-wise count sum — the property that makes the sketch a STORE
    (daily partials roll up without touching raw data)."""
    out = stores[0]
    for s in stores[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))


def cm_rollup(store: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll a partitioned CM store up a grain (day→month, day→ALL):
    cell-wise count sum within each coarser group. CM merge is exactly
    linear, so the rolled-up store is IDENTICAL to one built directly
    at the coarser grain — the identity the month-rollup face's oracle
    hash-proves. Touches sketch rows only (≤ groups × depth × width),
    never raw data."""
    return store.groupBy(*group_cols, "j", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cm_point_estimates(
    store: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point frequency estimates for ``items`` from a CM store:
    est(x) = min_j store[j, h_j(x)] — an upper bound on the true count
    (collisions only ADD). Items fan out to their depth cells and join
    the store on (j, col); the store is broadcast when small (its size
    is depth × width cells max per group, independent of data volume).

    ``group_cols`` queries a PARTITIONED store: items must carry the
    same group columns, and each estimate reads its own group's sketch.

    Output: *group_cols, item_col, est (long).
    """
    group_cols = group_cols or []
    fanned = items.select(
        *group_cols,
        item_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).select(
        *group_cols,
        item_col,
        "j",
        _cm_hash(item_col, "j", seed, width).alias("col"),
    )
    return (
        fanned.join(F.broadcast(store), [*group_cols, "j", "col"])
        .groupBy(*group_cols, item_col)
        .agg(F.min("cnt").alias("est"))
    )


def kmv_overlap(
    pairs: DataFrame,
    kmv_a: str,
    kmv_b: str,
    k: int = 64,
) -> DataFrame:
    """Set-OVERLAP estimates between two KMV sketches carried on one row
    (Beyer et al. 2007 §5, the KMV set-algebra result): with
    ``U_k`` = the k smallest hashes of A ∪ B,

    - ``est_jaccard  = |U_k ∩ A ∩ B| / |U_k|`` (each union k-min is a
      uniform sample of A ∪ B; the fraction landing in both sketches
      estimates J),
    - ``est_union``   = the KMV cardinality estimator on U_k (exact
      when the union's distinct hashes number fewer than k — both
      sketches are then complete sets),
    - ``est_intersection = est_jaccard × est_union``.

    This is what makes a KMV STORE more than a distinct counter: day-
    over-day user overlap, retention, and audience-intersection
    questions are answered from the sketch rows alone — array algebra
    on ≤ k longs per pair, no raw-data rescan, and md5-portable so a
    SQL oracle replays every estimate bit-for-bit. Appends the three
    estimate columns to ``pairs``.
    """
    a, b = F.col(kmv_a), F.col(kmv_b)
    uni_all = F.array_union(a, b)  # distinct by construction
    u_k = F.slice(F.sort_array(uni_all), 1, k)
    inter = F.size(F.array_intersect(F.array_intersect(u_k, a), b))
    jac = inter.cast("double") / F.size(u_k)
    kth = F.element_at(u_k, k).cast("double") / F.lit(_KMV_HASH_SPACE)
    union_est = F.when(
        F.size(uni_all) < k, F.size(uni_all).cast("double")
    ).otherwise((F.lit(float(k)) - 1.0) / kth)
    return pairs.select(
        "*",
        jac.alias("est_jaccard"),
        union_est.alias("est_union"),
        (jac * union_est).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# Bloom filter membership store
# ---------------------------------------------------------------------------

def _bloom_pos(item_col, j_col, seed: int, m_bits: int):
    """Engine-portable Bloom bit position: md5(item ':seed:' j) folded
    to [0, m_bits) — the same md5→BIGINT construction as
    :func:`_cm_hash` / curation.sample_hash, so a SQL oracle (or any
    other engine) reproduces every set bit. ``j_col`` may be a column
    name or a literal Column."""
    j = F.col(j_col) if isinstance(j_col, str) else j_col
    tagged = F.concat(
        F.col(item_col).cast("string"),
        F.lit(f":{seed}:"),
        j.cast("string"),
    )
    h = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
    return h % m_bits


def bloom_probe_positions(
    value, m_bits: int = 8192, k_hashes: int = 4, seed: int = 42
) -> list[int]:
    """Driver-side twin of :func:`_bloom_pos` for literal probe values
    (identical md5 arithmetic — first 15 hex digits as an integer, mod
    m_bits), deduplicated and sorted so membership checks compare
    DISTINCT positions on both engines."""
    import hashlib

    out = {
        int(
            hashlib.md5(f"{value}:{seed}:{j}".encode()).hexdigest()[:15], 16
        )
        % m_bits
        for j in range(k_hashes)
    }
    return sorted(out)


def bloom_build_store(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Per-group Bloom filter membership store (Bloom 1970): ``k_hashes``
    md5-derived bit positions per distinct item, stored SPARSE as the
    ascending array of SET positions — the dense bitmap's mergeable,
    SQL-replayable twin (position-set union IS the bitwise OR, and a
    group's state is bounded by ``m_bits`` ints no matter how much data
    it summarizes). The set-membership sibling of the KMV/CM stores:
    "have we ever seen id X in partition P" without storing ids —
    no false negatives, false-positive rate ≈ fill_ratio^k.

    One pass, ONE shuffle: a bounded k-way fan-out straight into a
    map-side-combined ``collect_set`` per group. The partial sets are
    bounded by ``m_bits`` positions per group per map partition — the
    sketch's own bound — so the shuffle moves at most sketch-sized
    state no matter how many raw rows feed it, and the pre-aggregation
    ``distinct`` passes the old formulation paid (two extra full
    shuffles of (group, item) and (group, position)) buy nothing the
    set-union doesn't already do.

    Output: ``*group_cols, bits (array<long> ascending), bits_set
    (long)``.
    """
    fanned = (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, item_col)
        .withColumn("__j", F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))))
    )
    pos = fanned.select(
        *group_cols, _bloom_pos(item_col, "__j", seed, m_bits).alias("__p")
    )
    return (
        pos.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_set("__p")).alias("bits"))
        .withColumn("bits_set", F.size("bits").cast("long"))
    )


def bloom_merge(store: DataFrame, group_cols: list[str]) -> DataFrame:
    """OR Bloom filters down to a coarser grouping (e.g. daily store →
    global): union the position sets and re-count. ``merge(bloom(A),
    bloom(B)) ≡ bloom(A ∪ B)`` EXACTLY — set-bit union is associative
    and item positions don't depend on grouping — so rollups come from
    the store alone, like every sketch in this module. The explode runs
    over SKETCH rows (≤ |input groups| × m_bits), never the data; the
    union is ONE map-side-combined ``collect_set`` shuffle (the old
    separate ``distinct`` pass repeated the dedup the set already is)."""
    exploded = store.select(*group_cols, F.explode("bits").alias("__p"))
    return (
        exploded.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_set("__p")).alias("bits"))
        .withColumn("bits_set", F.size("bits").cast("long"))
    )


def bloom_contains_literal(bits_col, probe_positions: list[int]):
    """Membership Column for a LITERAL probe: true iff every one of the
    probe's (pre-computed, distinct) bit positions is present in the
    group's position array — the k array-membership tests a Bloom
    lookup is. No false negatives by construction."""
    probe = F.array(*[F.lit(int(p)).cast("long") for p in probe_positions])
    return F.size(F.array_except(probe, bits_col)) == 0


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    positions: DataFrame,
    m_bits: int = 8192,
    k_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """MAY-CONTAIN prefilter of ``df`` by a Bloom filter's set-position
    table (one ``p`` column — a store row's ``bits`` array exploded):
    keep only rows whose key could be in the set that built the filter.
    The runtime-filter join pattern as an explicit, store-backed
    operator: at 100 TB the build-side key set may be too large to
    broadcast, but its Bloom filter is bounded by ``m_bits`` rows
    FOREVER — so the prefilter is ``k_hashes`` successive broadcast
    LEFT SEMI hash joins on the row's j-th position, all map-side, no
    shuffle of ``df``; the exact join that follows then moves only the
    may-match fraction. False positives pass (the exact join removes
    them); false negatives cannot happen, so the composition is
    semantically transparent. A persisted store row prefilters
    tomorrow's ingest without recomputing anything."""
    pos = positions.select(F.col(positions.columns[0]).alias("__bfp"))
    out = df
    for j in range(k_hashes):
        out = (
            out.withColumn(
                "__bp", _bloom_pos(key_col, F.lit(j), seed, m_bits)
            )
            .join(
                F.broadcast(pos),
                F.col("__bp") == F.col("__bfp"),
                "left_semi",
            )
            .drop("__bp")
        )
    return out


def bloom_estimate(
    store: DataFrame, m_bits: int = 8192, k_hashes: int = 4
) -> DataFrame:
    """Serve cardinality estimates from the fill level (Swamidass &
    Baldi 2007): ``n̂ = -(m/k) · ln(1 - bits_set/m)``, NULL when the
    filter is saturated (every bit set — the estimator diverges).
    Deterministic for fixed inputs, so a SQL oracle replays estimates
    exactly. Non-sketch columns pass through untouched.

    Output: pass-through columns + ``bits_set, fill_ratio,
    distinct_est``.
    """
    group_cols = [c for c in store.columns if c not in ("bits", "bits_set")]
    fill = F.col("bits_set").cast("double") / F.lit(float(m_bits))
    est = F.when(
        F.col("bits_set") < m_bits,
        F.lit(-(float(m_bits) / float(k_hashes)))
        * F.log(F.lit(1.0) - fill),
    )
    return store.select(
        *group_cols,
        "bits_set",
        fill.alias("fill_ratio"),
        est.alias("distinct_est"),
    )
