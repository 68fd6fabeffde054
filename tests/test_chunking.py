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


# ---------------------------------------------------------------------------
# semantic + recursive modes
# ---------------------------------------------------------------------------


def test_semantic_chunks_injected_embedder_exact_boundaries():
    """With a controlled embedder (topic keyword -> fixed axis vector) the
    semantic walk's output is fully determined: same-topic runs merge, topic
    flips split, the word budget splits within a topic."""
    import numpy as np

    from dataflow_spark.operators.chunking import semantic_chunks_py

    def embed(sents):
        out = np.zeros((len(sents), 3))
        for i, s in enumerate(sents):
            out[i, 0 if "cat" in s.lower() else 1 if "bond" in s.lower() else 2] = 1.0
        return out

    text = (
        "The cat sat. The cat ran. The cat slept. "
        "Bonds rallied today. Bonds fell later. "
        "Something else entirely."
    )
    got = semantic_chunks_py(text, chunk_size=100, similarity_threshold=0.5, embed=embed)
    assert got == [
        ("The cat sat. The cat ran. The cat slept.", 3),
        ("Bonds rallied today. Bonds fell later.", 2),
        ("Something else entirely.", 1),
    ]
    # word budget forces a split inside the cat topic: each sentence is 3
    # words, budget 5 holds at most one more after the first
    got2 = semantic_chunks_py(text, chunk_size=5, similarity_threshold=0.5, embed=embed)
    assert [n for _, n in got2] == [1, 1, 1, 1, 1, 1]


def test_semantic_chunks_sentence_conservation():
    """Default hash embedder: chunk sentence counts sum to the document's
    sentence count and concatenated chunk text preserves word order."""
    import re as _re

    from dataflow_spark.operators.chunking import SENTENCE_RE, semantic_chunks_py, hash_embed

    text = " ".join(
        f"Topic{i % 4} sentence number {i} talks about thing{i % 4} again."
        for i in range(25)
    )
    chunks = semantic_chunks_py(text, 64, 0.2, hash_embed)
    assert sum(n for _, n in chunks) == len(_re.findall(SENTENCE_RE, text))
    assert " ".join(c for c, _ in chunks).split() == text.split()
    assert all(len(c.split()) <= 64 or n == 1 for c, n in chunks)


def test_chunk_semantic_spark_matches_kernel(spark):
    """mapInPandas output == the pure-python kernel per doc (same default
    embedder), over docs with varied shapes incl. empty and punct-free."""
    from dataflow_spark.operators.chunking import chunk_semantic, hash_embed, semantic_chunks_py

    docs = [
        ("d0", "The cat sat. The cat ran. Markets fell. Markets rose. The cat slept."),
        ("d1", "one sentence only."),
        ("d2", ""),
        ("d3", "no punctuation at all just words"),
        ("d4", " ".join(f"Filler sentence {i} about stuff." for i in range(40))),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {}
    for r in chunk_semantic(df, chunk_size=32, similarity_threshold=0.25).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["text"], r["n_sentences"]))
    for did, txt in docs:
        want = [
            (i, c, n)
            for i, (c, n) in enumerate(semantic_chunks_py(txt, 32, 0.25, hash_embed))
        ]
        assert sorted(got.get(did, [])) == want, did


def _mirror_recursive(text, budget):
    """Independent recursive mirror of the split-merge ladder (true call
    recursion, separate code path from the engine's)."""
    import re as _re

    from dataflow_spark.operators.chunking import SENTENCE_RE

    words = _re.findall(r"\S+", text or "")
    if not words:
        return []
    if len(words) <= budget:
        return [text]

    def rec(piece, level):
        if level >= 3:
            ws = _re.findall(r"\S+", piece)
            return [" ".join(ws[i : i + budget]) for i in range(0, len(ws), budget)]
        parts = {
            0: [p for p in _re.split(r"\n{2,}", piece) if p.strip()],
            1: [p for p in piece.split("\n") if p.strip()],
            2: _re.findall(SENTENCE_RE, piece),
        }[level]
        if len(parts) <= 1:
            return rec(piece, level + 1)
        groups, cur, cur_w = [], [], 0
        for p in parts:
            w = len(_re.findall(r"\S+", p))
            if cur and cur_w + w <= budget:
                cur.append(p)
                cur_w += w
            else:
                if cur:
                    groups.append((" ".join(cur), cur_w))
                cur, cur_w = [p], w
        groups.append((" ".join(cur), cur_w))
        out = []
        for g, w in groups:
            out.extend(rec(g, level + 1) if w > budget else [g])
        return out

    return rec(text, 0)


def test_recursive_chunks_mirror_parity():
    from dataflow_spark.operators.chunking import recursive_chunks_py

    docs = [
        "",
        "tiny doc",
        " ".join(f"w{i}" for i in range(500)),
        "\n\n".join(
            "Para %d. %s" % (i, " ".join(f"s{j} word." for j in range(i * 3)))
            for i in range(8)
        ),
        "line one\nline two with more words here\n" * 40,
        "One sentence. " * 100,
    ]
    for budget in (16, 64, 200):
        for d in docs:
            assert recursive_chunks_py(d, budget) == _mirror_recursive(d, budget), (
                budget,
                d[:40],
            )


def test_chunk_recursive_spark_properties(spark):
    """Spark output: word coverage in order per doc, budget respected
    (word-level hard split guarantees it once levels are exhausted)."""
    import re as _re

    from dataflow_spark.operators.chunking import chunk_recursive

    docs = [
        ("d0", "\n\n".join(" ".join(f"p{i}w{j}" for j in range(50)) for i in range(6))),
        ("d1", " ".join(f"only{i}" for i in range(10))),
        ("d2", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {}
    for r in chunk_recursive(df, chunk_size=64).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["text"], r["n_words"]))
    for did, txt in docs:
        chunks = [t for _, t, _ in sorted(got.get(did, []))]
        assert _re.findall(r"\S+", " ".join(chunks)) == _re.findall(r"\S+", txt), did
        for _, t, nw in got.get(did, []):
            assert nw <= 64
    assert "d2" not in got


def test_chunk_stage_semantic_recursive_routing(spark):
    from dataflow_spark.core.stage import get_operator

    df = spark.createDataFrame(
        [("a", "Alpha beta. Alpha gamma. Delta epsilon zeta.")],
        "doc_id string, text string",
    )
    sem = get_operator(
        "KBCChunkGenerator", input_key="text", split_method="semantic", chunk_size=50
    ).apply(df)
    rec = get_operator(
        "KBCChunkGenerator", input_key="text", split_method="recursive", chunk_size=50
    ).apply(df)
    assert {"doc_id", "chunk_idx", "text", "n_sentences"} == set(sem.columns)
    assert {"doc_id", "chunk_idx", "text", "n_words"} == set(rec.columns)
    assert sem.count() >= 1 and rec.count() == 1


# hypothesis properties for the python kernels (no Spark session needed)

from hypothesis import given, settings, strategies as st

_WORDS = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=120
)


@settings(max_examples=40, deadline=None)
@given(_WORDS, st.integers(1, 20), st.sampled_from(["\n\n", "\n", " "]))
def test_recursive_kernel_properties(words, budget, sep):
    """For any word soup under any separator structure: full word coverage in
    order, and every chunk within budget (word-level hard split guarantees
    it — no level can emit an oversize chunk)."""
    import re as _re

    from dataflow_spark.operators.chunking import recursive_chunks_py

    text = sep.join(words)
    chunks = recursive_chunks_py(text, budget)
    got = _re.findall(r"\S+", " ".join(chunks))
    assert got == _re.findall(r"\S+", text)
    for c in chunks:
        assert len(_re.findall(r"\S+", c)) <= budget


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.sampled_from(["cat sat here.", "bond fell today.", "misc thing now."]),
             min_size=0, max_size=30),
    st.integers(2, 12),
    st.floats(0.0, 1.0),
)
def test_semantic_kernel_properties(sents, budget, thresh):
    """Sentence conservation + budget: counts sum to the input sentence count,
    word order preserved, and no multi-sentence chunk exceeds the budget."""
    from dataflow_spark.operators.chunking import hash_embed, semantic_chunks_py

    text = " ".join(sents)
    chunks = semantic_chunks_py(text, budget, thresh, hash_embed)
    assert sum(n for _, n in chunks) == len(sents)
    assert " ".join(c for c, _ in chunks).split() == text.split()
    for c, n in chunks:
        if n > 1:
            assert len(c.split()) <= budget
