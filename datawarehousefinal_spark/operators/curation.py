"""End-to-end corpus curation — the LLM-training-data pipeline composed
from this engine's own operators, the way the star-ETL composition
(operators/star.py + tests/test_star_etl.py) composes the warehouse side.

Stage order is the standard funnel (cheap row-local filters first, the
expensive pairwise stage last, on the smallest surviving set):

1. rule filters — length bounds, quality score, language allow-list
   (textstats; all codegen, one pass)
2. exact dedup — content-hash keep-first (dedup.exact_dedup)
3. near-dup dedup — MinHash-LSH greedy pass via the incremental operator
   against an empty store (incremental.incremental_minhash_dedup)
4. deterministic train/val split — seeded hash bucket on the id, so the
   assignment is reproducible across runs and engines and never needs a
   stored split table

Every stage count lands in a FUNNEL REPORT built as a lazy union of
per-stage aggregates — no driver-side ``count()``/``collect()``; the
report is one DataFrame the caller materializes once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from datawarehousefinal_spark.operators.dedup import exact_dedup
from datawarehousefinal_spark.operators.incremental import (
    empty_minhash_store,
    incremental_minhash_dedup,
)
from datawarehousefinal_spark.operators.textstats import (
    language_id,
    quality_score,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    max_chars: int = 1_000_000,
    min_quality: float = 0.3,
    allowed_langs: list[str] | None = None,
    near_dup_threshold: float = 0.9,
    num_hashes: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    shingle_width: int = 5,
    val_pct: int = 1,
    seed: int = 42,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation funnel; returns ``(curated, report)``.

    ``curated`` is the surviving corpus with two added columns:
    ``lang_pred`` and ``split`` ('train' / 'val' by seeded hash bucket —
    ``val_pct`` of 100 buckets go to val). ``report`` is the lazy funnel
    frame ``(stage, n_rows)``, one row per stage in order.

    ``bands × rows_per_band`` must fit within ``num_hashes`` (validated
    by the banding layer with an explicit error) — lowering ``num_hashes``
    below 16 requires lowering the banding parameters with it.

    With ``persist`` (default), intermediate survivors cache at
    MEMORY_AND_DISK: each stage's frame feeds both the next stage and the
    report union, and the near-dup stage scans its input several times.
    The entries are bounded by the corpus row count (ids + text) and live
    until session teardown or LRU eviction; long-lived sessions invoking
    the funnel repeatedly should pass ``persist=False`` and manage
    caching themselves.
    """
    def _maybe_persist(df: DataFrame) -> DataFrame:
        return df.persist(StorageLevel.MEMORY_AND_DISK) if persist else df

    length_ok = docs.filter(
        (F.length(text_col) >= min_chars) & (F.length(text_col) <= max_chars)
    )
    scored = length_ok.withColumn("lang_pred", language_id(text_col)).withColumn(
        "__q", quality_score(text_col)
    )
    rules = scored.filter(F.col("__q") >= min_quality)
    if allowed_langs is not None:
        rules = rules.filter(F.col("lang_pred").isin(allowed_langs))
    rules = _maybe_persist(rules.drop("__q"))

    exact = _maybe_persist(
        exact_dedup(rules, text_col, [id_col], keep_count_col=None)
    )

    near, _delta = incremental_minhash_dedup(
        exact,
        empty_minhash_store(exact, id_col, num_hashes),
        id_col,
        text_col,
        threshold=near_dup_threshold,
        num_hashes=num_hashes,
        bands=bands,
        rows_per_band=rows_per_band,
        shingle_width=shingle_width,
    )
    near = _maybe_persist(near)

    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(100))
    curated = near.withColumn(
        "split", F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))
    )

    stages = [
        ("00_input", docs),
        ("01_length", length_ok),
        ("02_rules", rules),
        ("03_exact_dedup", exact),
        ("04_near_dedup", near),
    ]
    report = None
    for name, frame in stages:
        row = frame.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("stage"), "n_rows"
        )
        report = row if report is None else report.unionByName(row)
    return curated, report
