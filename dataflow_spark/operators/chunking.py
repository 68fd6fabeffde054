"""Document chunking — KBCChunkGenerator re-expressed Spark-first
(kbc_chunk_generator.py:20-66; the reference wraps chonkie's
TokenChunker/SentenceChunker around a HF tokenizer).

The engine operates on the north-rule payload directly: ``tokens:
array<int32>`` rows chunk by a sliding window of ``chunk_size`` tokens with
``chunk_overlap`` carry-over (stride = size - overlap) — one JVM transform +
posexplode, no Python anywhere, no re-tokenization (the corpus is already
tokenized).  A word-level variant covers text columns the same way.  The
final short chunk is kept iff non-empty, and a document shorter than one
window yields exactly one chunk — chonkie's behavior.

Scale shape: chunking multiplies rows by ~n_tok/stride without any shuffle
(narrow generate); downstream dedup/filters see the chunk rows as ordinary
documents keyed (doc_id, chunk_idx).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.stage import Stage, register


def _chunk_array(arr: Column, chunk_size: int, overlap: int) -> Column:
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_size ({chunk_size})")
    stride = chunk_size - overlap
    n = F.size(arr)
    # starts: 1, 1+stride, ... while start <= max(1, n - overlap) — this is
    # exactly "emit windows until the remainder is covered": the last window
    # begins at the final stride step that still contributes new tokens.
    last = F.greatest(F.lit(1), n - F.lit(overlap))
    starts = F.sequence(F.lit(1), last, F.lit(stride))
    return F.filter(
        F.transform(starts, lambda s: F.slice(arr, s, chunk_size)),
        lambda c: F.size(c) > 0,
    )


def chunk_tokens(
    df: DataFrame,
    chunk_size: int = 512,
    chunk_overlap: int = 50,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, tokens, n_tok) — token-window chunking of the
    pre-tokenized corpus."""
    chunks = _chunk_array(F.col(tokens_col), chunk_size, chunk_overlap)
    return df.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "tokens")
    ).withColumn("n_tok", F.size("tokens").cast("int"))


def chunk_words(
    df: DataFrame,
    chunk_size: int = 128,
    chunk_overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, text, n_words) — word-window chunking of a text
    column (whitespace words, chunks re-joined with single spaces)."""
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    chunks = _chunk_array(ws, chunk_size, chunk_overlap)
    return (
        df.select(id_col, F.posexplode(chunks).alias("chunk_idx", "_ws"))
        .select(
            id_col,
            "chunk_idx",
            F.array_join("_ws", " ").alias("text"),
            F.size("_ws").cast("int").alias("n_words"),
        )
    )


SENTENCE_RE = r"\b[^.!?\n]+[.!?]*"  # same splitter as keep_sentence_number


def chunk_sentences(
    df: DataFrame,
    chunk_size: int = 5,
    chunk_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, text, n_sentences) — sentence-window chunking: the
    KBCChunkGenerator sentence mode (kbc_chunk_generator.py:20-66 wraps
    chonkie's SentenceChunker) re-expressed as a regex sentence split +
    the shared sliding-window kernel.  ``chunk_size``/``chunk_overlap``
    count SENTENCES; chunk text re-joins sentences with single spaces
    (whitespace between sentences is normalized, like the word variant).
    Pure Catalyst — narrow generate, no shuffle."""
    sents = F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0)
    chunks = _chunk_array(sents, chunk_size, chunk_overlap)
    return (
        df.select(id_col, F.posexplode(chunks).alias("chunk_idx", "_ss"))
        .select(
            id_col,
            "chunk_idx",
            F.array_join("_ss", " ").alias("text"),
            F.size("_ss").cast("int").alias("n_sentences"),
        )
    )


@register("KBCChunkGenerator")
def kbc_chunk_stage(
    input_key: str = "text", split_method: str = "word",
    chunk_size: int = 512, chunk_overlap: int = 50, id_col: str = "doc_id",
) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        if split_method == "token":
            return chunk_tokens(df, chunk_size, chunk_overlap, input_key, id_col)
        if split_method == "word":
            return chunk_words(df, chunk_size, chunk_overlap, input_key, id_col)
        if split_method == "sentence":
            return chunk_sentences(df, chunk_size, chunk_overlap, input_key, id_col)
        raise ValueError(
            f"split_method {split_method!r}: 'token', 'word' and 'sentence' "
            "are native; semantic/recursive need embedding models (extension point)"
        )

    return Stage("KBCChunkGenerator", fn, (input_key,), ("chunk_idx",), "generate")
