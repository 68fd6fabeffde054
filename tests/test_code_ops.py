"""Code-operator parity: Spark expressions vs pure-Python mirrors of the
reference's code/{eval,filter} logic (auto-generated markers, length rules,
text composition, encoded-data ratios, document quality, file-type rules)."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataflow_spark.core.stage import get_operator
from dataflow_spark.operators import code as C

SAMPLES = [
    ("s0", "# auto-generated file\ndef f():\n    return 1\n" * 3, "Python", "gen.py", "python"),
    ("s1", "This file is GENERATED automatically\ncode here\n", "Python", "a.py", "python"),
    ("s2", "def add(a, b):\n    '''sum'''\n    return a + b\n\nprint(add(2, 3))\n", "Python", "add.py", "python"),
    ("s3", "x = 'short'\n" + "Y" * 1500, "Python", "wide.py", "python"),
    ("s4", "{}" * 400, "JSON", "cfg.json", "json"),
    ("s5", "de,ad,be,ef,ca,fe,ba,be," * 10, "Python", "hex.py", "python"),
    ("s6", "QUJDREVGR0hJSktMTU5PUFFSU1RVVldYWVphYmNkZWZnaGlqa2xtbm9wcXJzdHV2d3h5ejAxMjM0\n" * 3, "Text", "blob.txt", "text"),
    ("s7", "Each of several different tokens appears once giving healthy entropy for this sample of prose about code quality rules\n", "Python", "readme.md", "markdown"),
    ("s8", "dup dup dup dup dup dup dup dup\n" * 4, "Python", "dup.py", "python"),
    ("s9", "", "Python", "empty.py", "python"),
    ("s10", ";;; asm\nmov d0, #1\n", "Motorola 68K Assembly", "m.s", "assembly"),
]

SCHEMA = "doc_id string, text string, language string, filename string, filetype string"


def _py_autogen_count(t):
    first5 = "\n".join(t.split("\n")[:5]).lower()
    return sum(1 for p in C.AUTOGEN_PATTERNS if p in first5)


def _py_length(t, lang):
    lines = t.split("\n")
    n = len(lines)
    avg = sum(len(l) for l in lines) / max(1, n)
    mx = max((len(l) for l in lines), default=0)
    if n > 100_000:
        return 0.0
    if lang not in C.LENGTH_EXCLUDED_LANGS:
        return 0.0 if (avg > 100 or mx > 1000) else 1.0
    return 0.0 if mx > 100_000 else 1.0


def _py_composition(t, lang):
    alpha = sum(c.isalpha() for c in t) / max(1, len(t))
    alnum = sum(c.isalnum() for c in t) / max(1, len(t))
    if lang in C.COMPOSITION_SPECIAL_LANGS:
        return 0.0 if alnum < 0.25 else 1.0
    return 0.0 if alpha < 0.25 else 1.0


def _py_encoded(t):
    for _, p in C.ENCODED_PATTERNS:
        total = sum(len(m.group()) for m in re.finditer(p, t))
        if total / max(1, len(t)) > 0.5:
            return 0.0
    return 1.0


def test_autogen_length_composition_encoded_parity(spark):
    df = spark.createDataFrame(SAMPLES, SCHEMA)
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            C.autogen_marker_count("text").alias("mk"),
            C.autogen_score("text").alias("auto"),
            C.length_score("text", "language").alias("lens"),
            C.composition_score("text", "language").alias("comp"),
            C.encoded_score("text").alias("enc"),
        ).collect()
    }
    for (i, t, lang, _, _) in SAMPLES:
        r = out[i]
        assert r["mk"] == _py_autogen_count(t), i
        assert r["auto"] == (1.0 if _py_autogen_count(t) == 0 else 0.0), i
        assert r["lens"] == _py_length(t, lang), i
        assert r["comp"] == _py_composition(t, lang), i
        assert r["enc"] == _py_encoded(t), i


def test_doc_quality_matches_reference_rules(spark):
    df = spark.createDataFrame(SAMPLES, SCHEMA)
    out = {
        r["doc_id"]: r["dq"]
        for r in df.select(
            "doc_id", C.doc_quality_udf(C.DOC_QUALITY_PIPELINE)("text").alias("dq")
        ).collect()
    }
    for (i, t, _, _, _) in SAMPLES:
        exp = C._doc_quality_row(t, C.DOC_QUALITY_PIPELINE)
        got = out[i]
        assert got["num_chars"] == exp[0] and got["num_words"] == exp[1], i
        assert abs(got["entropy"] - exp[5]) < 1e-12, i
        assert got["score"] == exp[10], i
    # planted expectations: heavy duplication fails, clean code with enough
    # words and entropy passes
    assert out["s8"]["score"] == 0.0 and out["s8"]["frac_dup_lines"] > 0.3
    assert out["s7"]["score"] == 1.0


def test_file_type_content_rules(spark):
    rows = [
        ("f0", "json", "big.json", 600, 0, 1),     # size-capped type, too long
        ("f1", "json", "ok.json", 100, 0, 1),      # fine
        ("f2", "html", "page.html", 10, 50, 1000), # visible text too short
        ("f3", "html", "page.html", 10, 400, 1000),# 40% visible -> keep
        ("f4", "text", "readme.txt", 10, 0, 1),    # documentation name -> keep
        ("f5", "text", "junk.txt", 10, 0, 1),      # kept: reference's
        # filename rule is DEAD CODE ("text" is in SIZE_CHECK_TYPES and the
        # size branch returns first) — we reproduce the actual behavior
        ("f6", "text", "requirements.txt", 10, 0, 1),  # 'requirement' -> keep
        ("f7", "python", "x.py", 9999, 0, 1),      # other types always keep
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, filetype string, filename string, line_count int, "
        "visible_text_length int, total_code_length int",
    )
    kept = {
        r["doc_id"]
        for r in df.where(
            C.keep_file_type_content(
                "filetype", "filename", "line_count",
                "visible_text_length", "total_code_length",
            )
        ).collect()
    }
    assert kept == {"f1", "f3", "f4", "f5", "f6", "f7"}


def test_code_pipeline_stage_registry(spark):
    df = spark.createDataFrame(SAMPLES, SCHEMA)
    out = get_operator(
        "CodeAutoGeneratedFilter", input_key="text", min_score=1.0, max_score=1.0
    ).apply(df)
    ids = {r["doc_id"] for r in out.collect()}
    assert "s0" not in ids and "s1" not in ids and "s2" in ids
    out2 = get_operator(
        "CodeDocumentQualityFilter", input_key="text",
        thresholds=C.DOC_QUALITY_PIPELINE,
    ).apply(df)
    ids2 = {r["doc_id"] for r in out2.collect()}
    assert "s7" in ids2 and "s8" not in ids2
    out3 = get_operator("CodeGenericScoreFilter", input_key="line_count",
                        score_threshold=100, filter_method="less").apply(
        spark.createDataFrame([("a", 50), ("b", 150)], "doc_id string, line_count int")
    )
    assert {r["doc_id"] for r in out3.collect()} == {"a"}


def test_language_dependent_filters_default_language(spark):
    """CodeLengthSampleFilter / CodeTextCompositionFilter with language_key
    omitted must not crash: they fall back to a 'language' column when
    present, else lit('unknown') — the reference's default
    (ADVICE round-2 fix)."""
    from dataflow_spark.core.stage import get_operator

    rows = [("a", "def f():\n    return 1\n", "Python"),
            ("b", "x" * 2000, "Python")]
    with_lang = spark.createDataFrame(rows, "doc_id string, text string, language string")
    no_lang = with_lang.drop("language")

    for name in ("CodeLengthSampleFilter", "CodeTextCompositionFilter"):
        # omitted language_key, language column present -> used
        kept = {r["doc_id"] for r in get_operator(name, input_key="text").apply(with_lang).collect()}
        # omitted language_key, no language column -> 'unknown' fallback
        kept2 = {r["doc_id"] for r in get_operator(name, input_key="text").apply(no_lang).collect()}
        assert kept == kept2  # Python is in neither special-language list
        assert "a" in kept


def test_doc_quality_6gram_threshold(spark):
    """A 6-10gram threshold below 1.0 must bind (round-2 ADVICE: the
    reference checks n=2..10)."""
    from dataflow_spark.operators.code import doc_quality_udf

    # 30 copies of the same 6 words -> every 6-gram duplicated
    dup = " ".join(["alpha bravo charlie delta echo foxtrot"] * 30)
    clean = " ".join(f"w{i}" for i in range(180))
    df = spark.createDataFrame([("dup", dup), ("clean", clean)], "doc_id string, text string")
    scored = df.select(
        "doc_id",
        doc_quality_udf({"max_frac_duplicate_6gram": 0.5})(F.col("text")).getField("score").alias("s"),
    )
    got = {r["doc_id"]: r["s"] for r in scored.collect()}
    assert got["dup"] == 0.0 and got["clean"] == 1.0
