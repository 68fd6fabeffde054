"""Deterministic tokenized-corpus synthesis + testdata loaders.

The north-star input table (BASELINE.json input_hint) is
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`` plus an
ingest ``event_time`` for watermarking.  There is no external tokenizer in the
sandbox, so we derive it deterministically from the driver-generated
``documents.parquet`` with PURE Catalyst expressions (no Python in the path —
at 100 TB this synthesis is itself a distributed job):

    words  = split on whitespace (lowercased)
    token  = pmod(xxhash64(word), VOCAB) cast int   -- stable word-id hashing
    n_tok  = size(tokens)
    event_time = fixed epoch + doc_id seconds       -- monotone arrival order

``doc_seq`` (= doc_id) is the explicit arrival sequence used for first-seen
dedup semantics; the reference keeps the first occurrence in file order
(dataflow/operators/general_text/filter/hash_deduplicate_filter.py:84-86) and a
distributed engine must carry that order explicitly rather than rely on row
position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 50257

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("doc_seq", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("event_time", T.TimestampType(), True),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def words_expr(col: str = "text"):
    """Lowercased whitespace word split with empties removed (matches the
    reference's ``text.split()`` semantics, word_number_filter.py:50)."""
    return F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda w: w != "")


def tokens_from_words(words_col):
    """Stable word-id token array: xxhash64(word) mod VOCAB, JVM-side."""
    return F.transform(
        words_col, lambda w: F.pmod(F.xxhash64(w), F.lit(VOCAB_SIZE)).cast("int")
    )


def tokenized_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> north-star (doc_id, tokens, n_tok, source, event_time)."""
    docs = load_table(spark, sf_dir, "documents")
    words = words_expr("text")
    return docs.select(
        F.concat(F.col("source"), F.lit("-"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias("doc_id"),
        F.col("doc_id").cast("long").alias("doc_seq"),
        "text",
        tokens_from_words(words).alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        "source",
        (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("event_time"),
    )
