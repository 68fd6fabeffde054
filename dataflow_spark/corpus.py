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


# ---------------------------------------------------------------------------
# FIXTURES.md F1: planted-pattern synthetic corpus (pure Catalyst, fully
# deterministic from row id — independent of partitioning/parallelism)
# ---------------------------------------------------------------------------


def _u(id_col, salt: int):
    """Deterministic uniform in [0,1) derived from the row id (never rand():
    Spark's rand is seed+partition dependent; this is partitioning-proof)."""
    return (F.pmod(F.xxhash64(id_col * F.lit(2654435761) + F.lit(salt)), F.lit(1 << 30))
            / F.lit(float(1 << 30)))


def synthetic_corpus(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """FIXTURES.md F1 generator: (doc_id, doc_seq, tokens, n_tok, source,
    event_time) with planted patterns —

      ~5% exact duplicates (row copies the token stream of row id-13),
      ~5% near-duplicates (~10% of positions perturbed vs row id-7),
      ~3% high-repetition (one 5-gram tiled),
      ~1% degenerate (single token repeated),
      zipf-ish lengths in [8, 4096] (u^3 power law),
      source skew cc≈70% / wiki 10% / code 10% / books 5% / forum 5%,
      event_time monotone with jitter; ~2% of rows arrive 1h late.

    Everything is a hash of (seed, id, position): same output for any
    partition count, any cluster size — the determinism the oracle tests
    need.  At 10^12 rows this synthesis is itself an embarrassingly parallel
    scan (spark.range is split evenly across executors).

    Materialize (write to parquet / localCheckpoint) before feeding operators
    that index into ``tokens`` element-wise (shingling): over the lazy
    generator expression each element_at re-evaluates the whole tokens
    CASE/transform chain — O(n_tok^2) per row."""
    df = spark.range(n_rows).select(F.col("id") + F.lit(seed * 1_000_003))
    df = df.toDF("id")
    idc = F.col("id")

    u_kind = _u(idc, 1)
    u_len = _u(idc, 2)
    u_src = _u(idc, 3)
    u_late = _u(idc, 4)

    # content seed: exact dups reuse an earlier row's stream wholesale.
    # Dup parents must be CANONICAL (their own u_kind in the plain range):
    # a parent that is itself near-dup/repeat/degenerate has tokens that
    # differ from its base stream, so a child copying the base stream would
    # duplicate nothing and the real planted-dup rate would undershoot.
    parent_plain_13 = _u(idc - 13, 1) < 0.86
    parent_plain_7 = _u(idc - 7, 1) < 0.86
    is_exact_dup = (u_kind >= 0.90) & (u_kind < 0.95) & (idc >= 13) & parent_plain_13
    is_near_dup = (u_kind >= 0.95) & (idc >= 7) & parent_plain_7
    is_repeat = (u_kind >= 0.87) & (u_kind < 0.90)
    is_degen = (u_kind >= 0.86) & (u_kind < 0.87)
    content_id = (
        F.when(is_exact_dup, idc - 13).when(is_near_dup, idc - 7).otherwise(idc)
    )

    base_len = (F.lit(8) + F.floor(F.pow(u_len, F.lit(3.0)) * F.lit(4088))).cast("int")
    # dup rows inherit the parent's length so token streams align
    u_len_parent = _u(content_id, 2)
    length = (
        F.lit(8) + F.floor(F.pow(u_len_parent, F.lit(3.0)) * F.lit(4088))
    ).cast("int")

    def tok_at(cid, j):
        return F.pmod(F.xxhash64(cid * F.lit(40503) + j * F.lit(69069) + F.lit(seed)),
                      F.lit(VOCAB_SIZE)).cast("int")

    seqpos = F.sequence(F.lit(1), length)
    base_tokens = F.transform(seqpos, lambda j: tok_at(content_id, j))
    # near-dup: ~10% of positions re-derived from THIS row's id
    perturbed = F.transform(
        seqpos,
        lambda j: F.when(
            F.pmod(F.xxhash64(idc * F.lit(97) + j), F.lit(10)) == 0, tok_at(idc, j)
        ).otherwise(tok_at(content_id, j)),
    )
    repeat_gram = F.transform(
        seqpos, lambda j: tok_at(content_id, F.pmod(j, F.lit(5)))
    )
    degen = F.transform(seqpos, lambda j: tok_at(content_id, F.lit(0)))

    tokens = (
        F.when(is_degen, degen)
        .when(is_repeat, repeat_gram)
        .when(is_near_dup, perturbed)
        .otherwise(base_tokens)
    )

    source = (
        F.when(u_src < 0.70, F.lit("cc"))
        .when(u_src < 0.80, F.lit("wiki"))
        .when(u_src < 0.90, F.lit("code"))
        .when(u_src < 0.95, F.lit("books"))
        .otherwise(F.lit("forum"))
    )
    jitter = F.pmod(F.xxhash64(idc + F.lit(5)), F.lit(30)).cast("double")
    late = (u_late < 0.02) & (idc > 0)
    event_time = (
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=idc.cast("double") + jitter)
        - F.when(late, F.make_interval(hours=F.lit(1))).otherwise(F.make_interval())
    )

    return df.select(
        F.concat(source, F.lit("-"), F.lpad(idc.cast("string"), 12, "0")).alias("doc_id"),
        idc.alias("doc_seq"),
        F.lit(None).cast("string").alias("text"),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        source.alias("source"),
        event_time.alias("event_time"),
    )
