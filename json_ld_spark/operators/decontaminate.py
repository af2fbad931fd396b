"""Benchmark decontamination: flag training documents that share a
word n-gram with an evaluation/benchmark set (the GPT-3 appendix-C /
Dolma decontamination rule, re-expressed as DataFrame transforms).

The real-world shape: the benchmark side is SMALL (eval suites are
thousands of prompts, not billions of documents) and the corpus side
is the 100-TB training set. The plan therefore:

  - builds the benchmark's distinct n-gram set once and BROADCASTS it
    (an eval suite's gram set fits in memory by construction — this is
    the one place a forced broadcast is the correct call, unlike the
    unbounded TF-IDF dictionary),
  - explodes corpus documents into distinct n-grams in a narrow map
    stage and hash-joins against the broadcast set — the corpus side
    never shuffles for the match itself,
  - aggregates hits by doc_id (partial aggregation applies; only
    MATCHED rows — rare by design — reach the shuffle),
  - left-joins the hit counts back onto the doc spine so clean
    documents appear with n_hit_grams = 0 (silent drops of clean docs
    would invert the filter's meaning downstream).

Tokenization matches textstats: lower + whitespace-collapse + trim,
split on single spaces. NULL text is coalesced to '' (empty docs have
no grams). Documents shorter than ``n`` words contribute no grams and
are therefore clean by definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(text_col, n: int) -> Column:
    """Distinct word n-grams of the normalized text as an array
    column. The words array is built inline; callers that reuse it
    should stage it (document_stats pattern)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(text_col, F.lit(""))),
                         "\\s+", " ")
    )
    words = F.when(F.length(norm) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(norm, " "))
    return _ngrams_of(words, n)


def _ngrams_of(words: Column, n: int) -> Column:
    """Distinct n-grams of a pre-staged words array (guarded so
    sequence() never sees start > stop — Spark would emit a
    DESCENDING sequence, not an empty one)."""
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", F.slice(words, i, n)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngrams(
    bench: DataFrame, n: int = 6, text_col: str = "text"
) -> DataFrame:
    """Distinct n-gram set of the benchmark/eval corpus: one ``gram``
    column. Small by construction; the caller broadcasts it."""
    staged = bench.select(_word_ngrams(F.col(text_col), n).alias("_g"))
    return (
        staged.select(F.explode("_g").alias("gram")).distinct()
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hit_grams, contaminated) for every document in
    ``docs``: n_hit_grams = how many of the document's DISTINCT word
    n-grams appear anywhere in the benchmark set; contaminated =
    n_hit_grams > 0.

    Counting distinct grams (not occurrences) makes the score
    insensitive to within-document repetition — a doc that repeats
    one leaked prompt 100× is the same single leak as one that quotes
    it once, which is the decision the downstream drop-rule needs.
    """
    grams = benchmark_ngrams(bench, n=n, text_col=text_col)
    staged = docs.select(
        F.col(id_col), _word_ngrams(F.col(text_col), n).alias("_g")
    )
    doc_grams = staged.select(id_col, F.explode("_g").alias("gram"))
    hits = (
        doc_grams.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
