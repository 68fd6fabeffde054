"""KBCChunkGenerator parity: sliding-window chunking vs a python mirror;
token-array equality on chunks (the north-star invariant)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflow_spark.core.stage import get_operator
from dataflow_spark.operators import chunking as ch


def _py_chunks(seq, size, overlap):
    stride = size - overlap
    out = []
    start = 0
    last = max(0, len(seq) - overlap)
    while start == 0 or start < last:
        c = seq[start : start + size]
        if c:
            out.append(c)
        start += stride
        if start >= last:
            break
    return out


def test_chunk_tokens_matches_python_mirror(spark):
    rows = [
        ("a", list(range(1000))),
        ("b", list(range(512))),     # exactly one window
        ("c", list(range(530))),     # one stride past
        ("d", list(range(5))),       # shorter than a window
        ("e", []),                   # empty
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ])
    df = spark.createDataFrame(rows, schema)
    out = ch.chunk_tokens(df, chunk_size=512, chunk_overlap=50)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], list(r["tokens"])))
    for doc_id, toks in rows:
        want = _py_chunks(toks, 512, 50)
        have = [t for _, t in sorted(got.get(doc_id, []))]
        assert have == want, (doc_id, [len(x) for x in have], [len(x) for x in want])
        for _, t in got.get(doc_id, []):
            assert len(t) <= 512


def test_chunk_words_rejoin(spark):
    text = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame([("a", text)], "doc_id string, text string")
    out = ch.chunk_words(df, chunk_size=128, chunk_overlap=16).collect()
    assert [r["n_words"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [128, 128, 76]
    # overlap: chunk1 starts 16 words before chunk0 ends
    c0 = out[0]["text"].split()
    c1 = out[1]["text"].split()
    assert c0[-16:] == c1[:16]


def test_chunk_stage_registry(spark):
    df = spark.createDataFrame([("a", "x " * 100)], "doc_id string, text string")
    out = get_operator("KBCChunkGenerator", input_key="text", split_method="word",
                       chunk_size=40, chunk_overlap=10).apply(df)
    assert out.count() == 3  # 100 words, stride 30: starts 0,30,60 cover all


def test_chunk_reconstruction_property(spark):
    """Hypothesis invariant: dropping each chunk's leading overlap and
    concatenating reconstructs the original token stream exactly — so
    chunking loses nothing and duplicates only the overlap."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=400),
        size=st.integers(min_value=2, max_value=64),
        data=st.data(),
    )
    def check(n, size, data):
        overlap = data.draw(st.integers(min_value=0, max_value=size - 1))
        toks = list(range(n))
        chunks = _py_chunks(toks, size, overlap)
        rebuilt = []
        for i, c in enumerate(chunks):
            rebuilt.extend(c if i == 0 else c[overlap:])
        assert rebuilt == toks, (n, size, overlap)

    check()
    # and the Spark implementation agrees with the mirror on a spot grid
    rows = [(f"n{n}", list(range(n))) for n in (0, 1, 7, 8, 9, 63, 64, 65, 200)]
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ])
    df = spark.createDataFrame(rows, schema)
    out = ch.chunk_tokens(df, chunk_size=8, chunk_overlap=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], list(r["tokens"])))
    for doc_id, toks in rows:
        assert [t for _, t in sorted(got.get(doc_id, []))] == _py_chunks(toks, 8, 3), doc_id


def test_chunk_sentences_reconstruction(spark):
    """Sentence windows: 5-sentence chunks, 1-sentence overlap — every
    sentence appears, ordering preserved, overlap duplicated exactly once
    per adjacent chunk pair."""
    from dataflow_spark.operators.chunking import chunk_sentences

    sents = [f"Sentence number {i} ends here." for i in range(12)]
    df = spark.createDataFrame([("d0", " ".join(sents))], "doc_id string, text string")
    rows = sorted(
        chunk_sentences(df, chunk_size=5, chunk_overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 4, 12 sentences -> starts 1,5,9 -> 3 chunks (5,5,4 sentences)
    assert [r["n_sentences"] for r in rows] == [5, 5, 4]
    # reconstruction: concatenating chunks minus the 1-sentence overlap
    # re-emitted at each chunk start == original sentence list
    recon = []
    for i, r in enumerate(rows):
        ss = [s if s.endswith(".") else s + "." for s in r["text"].split(". ")]
        recon.extend(ss if i == 0 else ss[1:])
    assert recon == sents


def test_chunk_sentences_short_doc_single_chunk(spark):
    from dataflow_spark.operators.chunking import chunk_sentences

    df = spark.createDataFrame([("d0", "Only two. Sentences here.")], "doc_id string, text string")
    rows = chunk_sentences(df, chunk_size=5, chunk_overlap=1).collect()
    assert len(rows) == 1 and rows[0]["n_sentences"] == 2
    assert rows[0]["text"] == "Only two. Sentences here."
