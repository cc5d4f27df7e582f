"""Benchmark-decontamination operator tests: flagging, dropping, and
hash-key/string-key path equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehousefinal_spark.operators.contamination import (
    benchmark_grams,
    contamination_report,
    decontaminate,
    word_ngrams,
)

BENCH_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def _frames(spark):
    bench = spark.createDataFrame([(100, BENCH_TEXT)], ["doc_id", "text"])
    train = spark.createDataFrame(
        [
            # embeds a full 8-gram run of the benchmark sentence
            (1, "intro text " + BENCH_TEXT + " and more trailing words"),
            (2, "completely unrelated content about spark dataframes"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    return bench, train


def test_contamination_flags_only_overlapping_doc(spark):
    bench, train = _frames(spark)
    grams = benchmark_grams(bench, "text")
    rep = contamination_report(train, grams, "doc_id", "text").collect()
    assert [r["doc_id"] for r in rep] == [1]
    assert rep[0]["n_hits"] >= 1
    assert rep[0]["n_grams"] > rep[0]["n_hits"]


def test_decontaminate_drops_flagged(spark):
    bench, train = _frames(spark)
    out = decontaminate(train, bench, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]


def test_hash_and_string_paths_agree(spark):
    bench, train = _frames(spark)
    a = contamination_report(
        train, benchmark_grams(bench, "text", hash_grams=True),
        "doc_id", "text", hash_grams=True,
    )
    b = contamination_report(
        train, benchmark_grams(bench, "text", hash_grams=False),
        "doc_id", "text", hash_grams=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_short_document_whole_run_gram(spark):
    df = spark.createDataFrame([(1, "only three tokens")], ["i", "t"])
    grams = df.select(word_ngrams("t", 8, hash_grams=False).alias("g")).first()["g"]
    assert grams == ["only three tokens"]
