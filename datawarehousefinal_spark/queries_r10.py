"""Round-10 query faces.

The Bloom store's month-grain rollup (completing the sketch-store
rollup symmetry with ``hll_rollup``: day filters OR-merged to months,
hash-proven against a direct month-grain rebuild), plus further
round-10 additions.

Registered into the same ``QUERIES``/``ORACLES`` registry as
:mod:`datawarehousefinal_spark.queries` (imported from its tail, before
the driver-window reorder — these faces land after the frozen round-10
window and enter the rotation next round). Reference parity: the rollup
face extends the reference's time-hierarchy aggregation surface
(Schema_Trabajo_Final.xml:60-68 — the Mondrian time dimension's
day→month→year climb) to the sketch-store world of the
beyond-reference LLM-data-pipeline surface.

Hash-stability discipline (module contract, same as queries_r8/r9):
every double reaching the driver hash is a single division/ln of exact
integers, raw input values through order-invariant folds, or a positive
product of those — no cancellation, no transcendental feeding an ORDER
BY cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehousefinal_spark.queries import query
from datawarehousefinal_spark.sources.testdata import load_table
from datawarehousefinal_spark.queries_r9 import (
    _BLOOM_K,
    _BLOOM_M,
    _BLOOM_PROBE_ABSENT,
    _BLOOM_PROBE_PRESENT,
    _BLOOM_SEED,
    _bloom_probe_sqls,
)

# ---------------------------------------------------------------------------
# Bloom store month-grain rollup
# ---------------------------------------------------------------------------


def _bloom_month_oracle() -> str:
    """Direct month-grain rebuild: the oracle never sees the daily
    stores, so hash equality proves ``merge(day filters) ≡ bloom(month
    stream)`` — the same merge≡rebuild contract as the daily face's ALL
    row, now at the intermediate grain of the time hierarchy. Probe
    positions are the shared frozen literals."""
    pa_sql, pb_sql, n_pa, n_pb = _bloom_probe_sqls()
    js = ", ".join(map(str, range(_BLOOM_K)))
    return f"""
    WITH pos AS (
      SELECT DISTINCT
             substr(CAST(CAST(ts AS DATE) AS VARCHAR), 1, 7) AS month,
             ('0x' || substr(md5(user_id::VARCHAR || ':{_BLOOM_SEED}:'
                                 || u.j::VARCHAR), 1, 15))::BIGINT
               % {_BLOOM_M} AS p
      FROM events, unnest([{js}]) AS u(j)
    ),
    days AS (
      SELECT substr(CAST(CAST(ts AS DATE) AS VARCHAR), 1, 7) AS month,
             count(DISTINCT CAST(ts AS DATE))::BIGINT AS n_days_merged
      FROM events GROUP BY 1
    ),
    srv AS (SELECT month, count(*)::BIGINT AS bits_set FROM pos GROUP BY 1),
    ma AS (
      SELECT month, count(DISTINCT p)::BIGINT AS hit FROM pos
      WHERE p IN ({pa_sql}) GROUP BY 1
    ),
    mb AS (
      SELECT month, count(DISTINCT p)::BIGINT AS hit FROM pos
      WHERE p IN ({pb_sql}) GROUP BY 1
    )
    SELECT s.month, d.n_days_merged,
           coalesce(ma.hit, 0) = {n_pa} AS has_probe_present,
           coalesce(mb.hit, 0) = {n_pb} AS has_probe_absent,
           s.bits_set,
           s.bits_set / {_BLOOM_M}.0 AS fill_ratio,
           CASE WHEN s.bits_set < {_BLOOM_M}
                THEN -{_BLOOM_M / _BLOOM_K} * ln(1 - s.bits_set / {_BLOOM_M}.0)
           END AS distinct_est
    FROM srv s
    JOIN days d ON s.month = d.month
    LEFT JOIN ma ON s.month = ma.month
    LEFT JOIN mb ON s.month = mb.month
    """


@query("bloom_month_rollup", oracle=_bloom_month_oracle())
def bloom_month_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-grain rollup of the DAILY Bloom membership store — the
    sketch-store counterpart of the Mondrian time hierarchy's
    day→month climb, and the missing rollup direction flagged by the
    round-9 verdict (``bloom_merge`` was exercised day→ALL only; the
    HLL store already had ``hll_rollup``). The Spark side derives the
    month filters EXCLUSIVELY by OR-merging the per-day filters
    (position-set union, sketches.bloom_merge); the oracle rebuilds
    each month directly from the raw stream — hash equality IS the
    ``merge(bloom(day₁..dayₙ)) ≡ bloom(month)`` proof at the grain a
    production rollup job actually materializes. Each month row serves
    the two frozen-literal membership probes, the merged-day count,
    fill ratio, and the Swamidass–Baldi estimate.

    100 TB shape: the daily build is the store build (distinct +
    bounded k-way fan-out, map-side combined); the rollup explodes
    SKETCH rows only (≤ days × m_bits), never raw data — a year of
    daily filters rolls up from ~365 × 8k ints regardless of corpus
    size."""
    from datawarehousefinal_spark.operators.sketches import (
        bloom_build_store,
        bloom_contains_literal,
        bloom_estimate,
        bloom_merge,
        bloom_probe_positions,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"), "user_id"
    ).withColumn("month", F.substring("day", 1, 7))
    daily = bloom_build_store(
        ev, ["month", "day"], "user_id", _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    n_days = daily.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_merged")
    )
    monthly = bloom_merge(daily, ["month"]).join(n_days, "month")
    pa = bloom_probe_positions(
        _BLOOM_PROBE_PRESENT, _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    pb = bloom_probe_positions(
        _BLOOM_PROBE_ABSENT, _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    )
    probed = monthly.select(
        "month",
        "n_days_merged",
        bloom_contains_literal(F.col("bits"), pa).alias(
            "has_probe_present"
        ),
        bloom_contains_literal(F.col("bits"), pb).alias("has_probe_absent"),
        "bits",
        "bits_set",
    )
    return bloom_estimate(probed, _BLOOM_M, _BLOOM_K)
