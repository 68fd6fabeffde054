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

import re
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------------
# semantic + recursive modes (kbc_chunk_generator.py:67-76 wraps chonkie's
# SemanticChunker / RecursiveChunker).  Both are per-document Python logic
# (an embedding-similarity walk; a split-merge recursion), so the Spark
# vehicle is mapInPandas: Arrow batches in, per-row independent work, narrow
# (no shuffle) — chunk rows flow into dedup/filters like ordinary documents.
# ---------------------------------------------------------------------------

_SENT_RE = re.compile(SENTENCE_RE)
_WORD_RE = re.compile(r"\S+")

_HASH_DIM = 64
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_U64 = (1 << 64) - 1


def hash_embed(sentences: list[str]) -> np.ndarray:
    """Deterministic sandbox embedder: signed feature-hashing of character
    trigrams (FNV-1a) into ``_HASH_DIM`` dims, L2-normalized — the classic
    hashing-trick text vector.  Lexically similar sentences land close in
    cosine, which is all the semantic walk needs for its tests; a real
    sentence-transformer slots into the same ``embed`` signature (model
    downloads are non-goals here)."""
    out = np.zeros((len(sentences), _HASH_DIM), dtype=np.float64)
    for i, s in enumerate(sentences):
        b = f"  {s.lower()}  ".encode("utf-8", "ignore")
        for j in range(len(b) - 2):
            h = _FNV_OFFSET
            for byte in b[j : j + 3]:
                h = ((h ^ byte) * _FNV_PRIME) & _U64
            out[i, (h >> 1) % _HASH_DIM] += 1.0 if h & 1 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def semantic_chunks_py(
    text: str,
    chunk_size: int,
    similarity_threshold: float,
    embed: Callable[[list[str]], np.ndarray],
) -> list[tuple[str, int]]:
    """The semantic walk on one document (pure function — reused by the
    engine kernel and directly unit-testable).  Sentences merge into the
    running chunk while (a) cosine(mean of chunk sentence embeddings, next
    sentence) >= threshold and (b) the chunk stays within ``chunk_size``
    words — chonkie's SemanticChunker recipe (group by similarity to the
    running group centroid, capped by chunk_size).  Returns
    [(chunk_text, n_sentences)]."""
    sents = _SENT_RE.findall(text or "")
    if not sents:
        return []
    emb = embed(sents)
    wc = [len(_WORD_RE.findall(s)) for s in sents]
    chunks: list[tuple[str, int]] = []
    group = [0]
    centroid = emb[0].copy()
    words = wc[0]
    for i in range(1, len(sents)):
        c_norm = np.linalg.norm(centroid)
        sim = float(centroid @ emb[i] / c_norm) if c_norm > 0 else 0.0
        if sim >= similarity_threshold and words + wc[i] <= chunk_size:
            group.append(i)
            centroid += emb[i]
            words += wc[i]
        else:
            chunks.append((" ".join(sents[j] for j in group), len(group)))
            group, centroid, words = [i], emb[i].copy(), wc[i]
    chunks.append((" ".join(sents[j] for j in group), len(group)))
    return chunks


def recursive_chunks_py(text: str, chunk_size: int) -> list[str]:
    """RecursiveChunker on one document: split by the coarsest separator
    first (paragraphs -> newlines -> sentences -> words), greedily re-merge
    adjacent pieces while the merged piece stays within ``chunk_size`` words,
    and recurse one level down on any piece that alone exceeds the budget;
    the word level hard-windows.  Word count stands in for the reference's
    tokenizer count (HF tokenizers are non-goals; the proxy is documented).
    Recursion depth is bounded by the 4-level ladder, never by input size."""
    n_words = len(_WORD_RE.findall(text or ""))
    if n_words == 0:
        return []
    if n_words <= chunk_size:
        return [text]
    return _expand_piece(text, 0, chunk_size)


def _expand_piece(piece: str, level: int, chunk_size: int) -> list[str]:
    """Split one oversize piece at ``level``, greedy-merge adjacent parts
    within the word budget, recurse on parts that alone exceed it."""
    if level >= 3:
        ws = _WORD_RE.findall(piece)
        return [
            " ".join(ws[s : s + chunk_size]) for s in range(0, len(ws), chunk_size)
        ]
    if level == 0:
        parts = [p for p in re.split(r"\n{2,}", piece) if p.strip()]
    elif level == 1:
        parts = [p for p in piece.split("\n") if p.strip()]
    else:
        parts = _SENT_RE.findall(piece)
    if len(parts) <= 1:  # separator absent at this level — go finer
        return _expand_piece(piece, level + 1, chunk_size)
    merged: list[tuple[str, int]] = []  # (text, words)
    for p in parts:
        w = len(_WORD_RE.findall(p))
        if merged and merged[-1][1] + w <= chunk_size:
            merged[-1] = (merged[-1][0] + " " + p, merged[-1][1] + w)
        else:
            merged.append((p, w))
    out: list[str] = []
    for p, w in merged:
        if w > chunk_size:
            out.extend(_expand_piece(p, level + 1, chunk_size))
        else:
            out.append(p)
    return out


def _chunk_schema(df: DataFrame, id_col: str, count_name: str) -> T.StructType:
    """Output schema inherits the id column's type (doc ids are int64 in the
    testdata tables, strings in the streaming corpus)."""
    return T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField(count_name, T.IntegerType()),
        ]
    )


def chunk_semantic(
    df: DataFrame,
    chunk_size: int = 128,
    similarity_threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    embed: Callable[[list[str]], np.ndarray] = hash_embed,
) -> DataFrame:
    """(id, chunk_idx, text, n_sentences) — semantic chunking: sentences
    merge while cosine-similar to the running chunk centroid, capped at
    ``chunk_size`` words.  ``embed`` is the pluggable sentence embedder
    (batch in, matrix out); the default is the deterministic hashing-trick
    embedder.  mapInPandas: per-row independent, narrow."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, texts, ns = [], [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                for ci, (ctext, nsent) in enumerate(
                    semantic_chunks_py(txt, chunk_size, similarity_threshold, embed)
                ):
                    ids.append(did)
                    idxs.append(ci)
                    texts.append(ctext)
                    ns.append(nsent)
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": pd.array(idxs, dtype="int32"),
                 "text": texts, "n_sentences": pd.array(ns, dtype="int32")}
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, _chunk_schema(df, id_col, "n_sentences")
    )


def chunk_recursive(
    df: DataFrame,
    chunk_size: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, text, n_words) — recursive split-merge chunking
    (paragraph -> line -> sentence -> word ladder).  mapInPandas, narrow."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, texts, ns = [], [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                for ci, ctext in enumerate(recursive_chunks_py(txt, chunk_size)):
                    ids.append(did)
                    idxs.append(ci)
                    texts.append(ctext)
                    ns.append(len(_WORD_RE.findall(ctext)))
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": pd.array(idxs, dtype="int32"),
                 "text": texts, "n_words": pd.array(ns, dtype="int32")}
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, _chunk_schema(df, id_col, "n_words")
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
        if split_method == "semantic":
            return chunk_semantic(df, chunk_size, text_col=input_key, id_col=id_col)
        if split_method == "recursive":
            return chunk_recursive(df, chunk_size, text_col=input_key, id_col=id_col)
        raise ValueError(
            f"split_method {split_method!r}: 'token', 'word', 'sentence', "
            "'semantic' and 'recursive' (kbc_chunk_generator.py:55-76)"
        )

    return Stage("KBCChunkGenerator", fn, (input_key,), ("chunk_idx",), "generate")


# ---------------------------------------------------------------------------
# QAExtractor (knowledge_cleaning/generate/qa_extract.py:86-134,169-239):
# nested QA_pairs → Alpaca instruction/input/output rows
# ---------------------------------------------------------------------------

_DEFAULT_QA_INSTRUCTION = (
    "Please answer the following question based on the provided information."
)


def qa_extract_alpaca(
    df: DataFrame,
    qa_col: str = "QA_pairs",
    instruction: str = _DEFAULT_QA_INSTRUCTION,
    instruction_key: str = "instruction",
    question_key: str = "input",
    answer_key: str = "output",
) -> DataFrame:
    """Explode ``QA_pairs`` (array of {question, answer} structs), strip both
    sides, drop pairs with an empty question or answer, and emit Stanford
    Alpaca rows with a constant instruction (qa_extract.py:86-134; the
    context-building block is commented out in the reference and the
    ``{'qa_pairs': [...]}`` dict wrapper / chunk-file loading are storage
    glue). Pure Catalyst: one generate, no shuffle."""
    qa = F.coalesce(
        F.col(qa_col), F.array().cast("array<struct<question:string,answer:string>>")
    )
    ex = df.select(F.explode(qa).alias("_qa"))
    q = F.regexp_replace(F.col("_qa.question"), r"^\s+|\s+$", "")
    a = F.regexp_replace(F.col("_qa.answer"), r"^\s+|\s+$", "")
    return (
        ex.where(q.isNotNull() & (q != "") & a.isNotNull() & (a != ""))
        .select(
            F.lit(instruction).alias(instruction_key),
            q.alias(question_key),
            a.alias(answer_key),
        )
    )


@register("QAExtractor")
def qa_extract_stage(
    input_qa_key: str = "QA_pairs",
    output_instruction_key: str = "instruction",
    output_question_key: str = "input",
    output_answer_key: str = "output",
    input_instruction: str = _DEFAULT_QA_INSTRUCTION,
) -> Stage:
    return Stage(
        name="QAExtractor",
        fn=lambda df: qa_extract_alpaca(
            df,
            input_qa_key,
            input_instruction,
            output_instruction_key,
            output_question_key,
            output_answer_key,
        ),
        input_cols=(input_qa_key,),
        output_cols=(output_instruction_key, output_question_key, output_answer_key),
        kind="generate",
    )
