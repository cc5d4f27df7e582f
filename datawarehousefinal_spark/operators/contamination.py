"""Benchmark decontamination — word-n-gram overlap between a training
corpus and an evaluation/benchmark set.

The standard LLM-training hygiene pass: any training document sharing
enough contiguous word n-grams with a benchmark document is flagged (and
usually dropped) so evaluation stays uncontaminated. Beyond-reference
scale machinery in the family of :mod:`operators.dedup` (the reference
has nothing comparable).

Scale design: the benchmark side is SMALL (benchmarks are megabytes;
corpora are terabytes), so the gram set is built once, deduplicated, and
broadcast — the corpus side is a map-only shingling pass plus one
broadcast semi-join and a per-document groupBy. The corpus is never
shuffled on anything wider than (doc id, gram key); with ``hash_grams``
(default) the key is an 8-byte xxhash64 instead of the gram string, which
is what you want at 100 TB. Pass ``hash_grams=False`` to key on the gram
text itself — exactly replayable in any SQL engine (the oracle path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datawarehousefinal_spark.operators.textstats import whitespace_tokens


def word_ngrams(
    text_col: Column | str, n: int = 8, hash_grams: bool = True
) -> Column:
    """Distinct word ``n``-grams of a text column (array column).

    Documents shorter than ``n`` tokens contribute their whole token run
    as one gram, so no document maps to an empty set. Grams are
    space-joined token slices; with ``hash_grams`` each gram is reduced
    to its xxhash64.
    """
    toks = whitespace_tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n)))
    )
    if hash_grams:
        grams = F.transform(grams, lambda g: F.xxhash64(g))
    return F.array_distinct(grams)


def benchmark_grams(
    bench: DataFrame, text_col: str, n: int = 8, hash_grams: bool = True
) -> DataFrame:
    """The deduplicated gram set of the benchmark corpus — one column
    ``gram``. Build once per benchmark, broadcast everywhere."""
    return (
        bench.filter(F.col(text_col).isNotNull())
        .select(F.explode(word_ngrams(text_col, n, hash_grams)).alias("gram"))
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    bench_gram_set: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-training-document contamination: how many of its distinct word
    ``n``-grams appear in the benchmark gram set.

    Output: ``id_col, n_grams, n_hits`` for documents with ``n_hits >=
    min_hits``. ``n_grams`` (the document's distinct gram count) lets the
    caller threshold on a fraction instead of an absolute count. Drop
    policy is the caller's: an anti-join of the corpus against these ids.
    """
    grams = (
        train.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.explode(word_ngrams(text_col, n, hash_grams)).alias("gram")
        )
    )
    hits = (
        grams.join(F.broadcast(bench_gram_set), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    totals = train.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(word_ngrams(text_col, n, hash_grams)).cast("long").alias("n_grams")
    )
    return (
        totals.join(hits, id_col)
        .filter(F.col("n_hits") >= min_hits)
        .select(id_col, "n_grams", "n_hits")
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
    hash_grams: bool = True,
) -> DataFrame:
    """Drop flagged documents: the corpus anti-joined against the
    contamination report's ids. The report pipeline runs once; the
    anti-join key is just the id column."""
    flagged = contamination_report(
        train, benchmark_grams(bench, text_col, n, hash_grams),
        id_col, text_col, n, min_hits, hash_grams,
    ).select(id_col)
    return train.join(flagged, id_col, "left_anti")
