"""Genuine UDAF / UDTF surfaces (SURVEY.md §2.H last row).

The engine's hot paths use mapInPandas everywhere; this module adds the
remaining user-function shapes Spark 4 offers, each exercised by an
oracled driver query:

* a **pandas grouped-aggregate UDAF** (Arrow-batched, usable inside
  ``groupBy(...).agg(...)``) — per-language mean quality proxy;
* a **Python UDTF** (table function with a lateral join) — sentence
  splitting, one output row per sentence.

Both are deterministic and SQL-expressible, so the driver checks them
value-for-value against DuckDB (the point is attesting the FUNCTION
SURFACE, not the math).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calamari_spark.functions.text import (
    REG_SPACES_SQL as _REG_SQL,
    regularized_spaces_col as _regularized_col,
)
from calamari_spark.sources.tables import load_table


def sum_len_udaf():
    """Grouped-aggregate pandas UDAF: exact integer sum of string lengths.

    The mean is computed OUTSIDE the UDAF as sum/count: a float mean inside
    the UDAF is a shuffle-order-dependent float sum, and a round(...,6)
    boundary can flip vs the oracle's sequential avg at scale (the same
    cross-engine FP trap fixed in q_cer_histogram / x_avg_confidence) —
    integer partial sums are associative-exact in any order."""
    from calamari_spark.functions.arrow import series_udf

    def _sum_len(s):
        return int(s.str.len().sum())

    return series_udf(_sum_len, "long", agg=True)


def q_udaf_mean_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mean clean-text length via a real pandas UDAF inside
    groupBy().agg() (Arrow transfer; partial aggregation happens Arrow-side
    per group — at scale the group count, not row count, bounds state)."""
    from calamari_spark.functions.arrow import series_udf

    docs = load_table(spark, "documents", sf_dir)
    clean = docs.select("lang", _regularized_col(F.col("text")).alias("clean"))
    agg = sum_len_udaf()
    # Spark disallows mixing a group-agg pandas UDF with built-in
    # aggregates in one agg() — the count is a pandas UDAF too
    n_udaf = series_udf(lambda s: len(s), "long", agg=True)
    return (
        clean.groupBy("lang")
        .agg(
            agg(F.col("clean")).alias("_len_sum"),
            n_udaf(F.col("clean")).alias("_n"),
        )
        .select(
            "lang",
            F.round(F.col("_len_sum") / F.col("_n"), 6).alias("mean_len"),
        )
        .orderBy("lang")
    )


Q_UDAF_SQL = f"""
SELECT lang,
       round(CAST(sum(length({_REG_SQL})) AS DOUBLE) / count(*), 6) AS mean_len
FROM documents GROUP BY lang ORDER BY lang
"""


def register_sentences_udtf(spark: SparkSession) -> None:
    """A real Python UDTF: one row per '. '-delimited sentence with its
    index (the table-function shape; reference analog: one sample yielded
    per line of a page, pagexml/reader.py load loop)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                if s != "":
                    yield i, s

    spark.udtf.register("split_sentences", SplitSentences)


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral join against the UDTF: doc_id x its sentences."""
    docs = load_table(spark, "documents", sf_dir)
    register_sentences_udtf(spark)
    docs.select("doc_id", _regularized_col(F.col("text")).alias("clean")).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence
        FROM _udtf_docs, LATERAL split_sentences(clean) s
        ORDER BY doc_id, sent_idx
        """
    )


Q_UDTF_SQL = f"""
SELECT doc_id, CAST(idx - 1 AS INTEGER) AS sent_idx, sentence
FROM (
  SELECT doc_id, unnest(parts) AS sentence, generate_subscripts(parts, 1) AS idx
  FROM (SELECT doc_id, string_split({_REG_SQL}, '. ') AS parts FROM documents)
)
WHERE sentence != ''
ORDER BY doc_id, sent_idx
"""


def q_udxf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH user-function surfaces in one oracled plan: the Python UDTF
    splits each document into sentences via a LATERAL join, then the pandas
    grouped-agg UDAF computes the mean sentence length per language.
    (The standalone UDAF/UDTF queries remain in SHADOW_QUERIES — one driver
    row attests both surfaces, per the 50-row attestation window.)"""
    docs = load_table(spark, "documents", sf_dir)
    register_sentences_udtf(spark)
    docs.select(
        "doc_id", "lang", _regularized_col(F.col("text")).alias("clean")
    ).createOrReplaceTempView("_udxf_docs")
    sents = spark.sql(
        """
        SELECT doc_id, lang, s.sent_idx, s.sentence
        FROM _udxf_docs, LATERAL split_sentences(clean) s
        """
    )
    from calamari_spark.functions.arrow import series_udf

    agg = sum_len_udaf()
    # Spark disallows mixing a group-agg pandas UDF with built-in
    # aggregates in one agg() — the count is a pandas UDAF too
    n_udaf = series_udf(lambda s: len(s), "long", agg=True)
    return (
        sents.groupBy("lang")
        .agg(
            n_udaf(F.col("sentence")).alias("n_sentences"),
            agg(F.col("sentence")).alias("_len_sum"),
        )
        .select(
            "lang",
            "n_sentences",
            F.round(F.col("_len_sum") / F.col("n_sentences"), 6).alias(
                "mean_sentence_len"
            ),
        )
        .orderBy("lang")
    )


Q_UDXF_SQL = f"""
SELECT lang,
       count(*) AS n_sentences,
       round(CAST(sum(length(sentence)) AS DOUBLE) / count(*), 6)
         AS mean_sentence_len
FROM (
  SELECT lang, unnest(string_split({_REG_SQL}, '. ')) AS sentence
  FROM documents
)
WHERE sentence != ''
GROUP BY lang ORDER BY lang
"""


UDXF_QUERIES = {
    "q_udxf_sentence_stats": (q_udxf_sentence_stats, Q_UDXF_SQL),
}

UDXF_SHADOW_QUERIES = {
    "q_udaf_mean_len": (q_udaf_mean_len, Q_UDAF_SQL),
    "q_udtf_sentences": (q_udtf_sentences, Q_UDTF_SQL),
}
