"""Refiner parity: Spark expression rewrites vs Python string ops."""

import pytest

from dataflow_spark.core.stage import get_operator
from tests.fixtures import make_docs
from tests.oracle import rules

PARAMS = [
    ("RemoveExtraSpacesRefiner", rules.remove_extra_spaces),
    ("LowercaseRefiner", rules.lowercase),
    ("RemovePunctuationRefiner", rules.remove_punctuation),
    ("RemoveNumberRefiner", rules.remove_number),
    ("HtmlUrlRemoverRefiner", rules.remove_html_url),
    ("RemoveRepetitionsPunctuationRefiner", rules.remove_repetitions_punctuation),
    ("ReferenceRemoverRefiner", rules.remove_reference),
    ("TextNormalizationRefiner", rules.text_normalization),
    ("RemoveStopwordsRefiner", rules.remove_stopwords),
]


@pytest.mark.parametrize("name,oracle_fn", PARAMS, ids=[p[0] for p in PARAMS])
def test_refiner_parity(spark, name, oracle_fn):
    rows = make_docs(n=120)
    df = spark.createDataFrame(rows, "doc_id string, doc_seq long, text string, source string")
    out = get_operator(name, input_key="text").apply(df)
    got = {r["doc_seq"]: r["text"] for r in out.select("doc_seq", "text").collect()}
    for (_, seq, text, _) in rows:
        assert got[seq] == oracle_fn(text), f"{name} row {seq}: {got[seq]!r} != {oracle_fn(text)!r}"


def test_full_emoticon_dict_order_semantics(spark):
    """The 221-entry dict applies as sequential literal replaces in reference
    insertion order (remove_emoticons_refiner.py loops EMOTICONS_EMO.keys()).
    Python oracle = the reference's own loop."""
    from dataflow_spark.operators._emoticon_data import EMOTICONS

    assert len(EMOTICONS) == 221
    rows = [("d%d" % i, i, t, "s") for i, t in enumerate([
        "hi :-))) there :)",      # ':-))' fires before ':-)))' could
        "wow 8-) X‑D <3 :'(",
        "no emoticons here.",
        ":)".join(["a", "b", "c"]),
        " ".join(EMOTICONS[:40]),
    ])]
    df = spark.createDataFrame(rows, "doc_id string, doc_seq long, text string, source string")
    out = get_operator("RemoveEmoticonsRefiner", input_key="text").apply(df)
    got = {r["doc_seq"]: r["text"] for r in out.collect()}
    for (_, seq, text, _) in rows:
        want = text
        for e in EMOTICONS:
            want = want.replace(e, "")
        assert got[seq] == want, f"row {seq}: {got[seq]!r} != {want!r}"


def test_full_contraction_dict_semantics(spark):
    """171-entry dict, longest-first, first-letter case preserved."""
    from dataflow_spark.operators._contraction_data import CONTRACTIONS

    assert len(CONTRACTIONS) >= 150
    cases = [
        ("Can't stop won't stop", "Cannot stop will not stop"),
        ("she'd've known it's fine", "she would have known it is fine"),
        ("Y'all're here and y'all'd've left", "You all are here and you all would have left"),
        ("I'm sure they'll've gone", "I am sure they will have gone"),
        ("the can'toverride token", "the can'toverride token"),  # \b guards
        ("o'clock and ma'am", "of the clock and madam"),
    ]
    rows = [("d%d" % i, i, t, "s") for i, (t, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "doc_id string, doc_seq long, text string, source string")
    out = get_operator("RemoveContractionsRefiner", input_key="text").apply(df)
    got = {r["doc_seq"]: r["text"] for r in out.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_refiner_chain_parity(spark):
    """Chained refiners compose like sequential reference steps."""
    rows = make_docs(n=60)
    df = spark.createDataFrame(rows, "doc_id string, doc_seq long, text string, source string")
    chain = ["HtmlUrlRemoverRefiner", "LowercaseRefiner", "RemoveExtraSpacesRefiner"]
    for name in chain:
        df = get_operator(name, input_key="text").apply(df)
    got = {r["doc_seq"]: r["text"] for r in df.collect()}
    for (_, seq, text, _) in rows:
        want = rules.remove_extra_spaces(rules.lowercase(rules.remove_html_url(text)))
        assert got[seq] == want


def test_contraction_rules_no_key_survives_and_idempotent():
    """Pure-Python mirror of the regexp_replace chain: after one pass no
    dictionary key survives as a standalone token, so a second pass is a
    no-op (expansions contain no contractions).  Catches longest-first
    ordering mistakes (e.g. \"n't\"-style masking) without needing Spark."""
    import re

    from dataflow_spark.operators._contraction_data import CONTRACTIONS
    from dataflow_spark.operators.refiners import contraction_rules

    def apply_chain(text):
        for (k, v), (pat, tail) in zip(CONTRACTIONS.items(), contraction_rules()):
            repl = (r"\1" + tail) if tail is not None else v
            text = re.sub(pat, repl, text)
        return text

    # every key embedded in a sentence, upper/lower first letter
    for k in CONTRACTIONS:
        for probe in (f"well {k} indeed", f"{k[0].upper() + k[1:]} indeed"):
            out = apply_chain(probe)
            assert "'" not in out or not re.search(
                r"(?i)(?<![\w'])" + re.escape(k) + r"(?![\w'])", out
            ), f"key {k!r} survived: {out!r}"
    sample = "Can't won't y'all'd've gonna o'clock it's I'm daren't"
    once = apply_chain(sample)
    assert apply_chain(once) == once


def test_porter_stemmer_paper_vectors():
    """The 1980 paper's example rewrites, one per rule family."""
    from dataflow_spark.operators._porter import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "agreed": "agre",
        "hopping": "hop", "filing": "file", "happy": "happi",
        "relational": "relat", "digitizer": "digit", "vietnamization": "vietnam",
        "triplicate": "triplic", "hopeful": "hope", "goodness": "good",
        "adjustable": "adjust", "replacement": "replac", "adoption": "adopt",
        "probate": "probat", "rate": "rate", "controll": "control",
        "effective": "effect", "sensibiliti": "sensibl",
    }
    for w, want in vectors.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_refiner_spark_parity(spark):
    """Spark UDF output == pure-python Porter word-wise, on generated docs."""
    from dataflow_spark.operators._porter import porter_stem

    rows = make_docs(n=80)
    df = spark.createDataFrame(rows, "doc_id string, doc_seq long, text string, source string")
    out = get_operator("PorterStemmingRefiner", input_key="text").apply(df)
    got = {r["doc_seq"]: r["text"] for r in out.collect()}
    for (_, seq, text, _) in rows:
        want = " ".join(porter_stem(w) for w in text.split())
        assert got[seq] == want, f"row {seq}"


def test_lemmatize_morphy_vectors(spark):
    """Rules-only morphy noun detachment (lemmatize_words docstring contract):
    fixed vectors per rule family, incl. the documented -ses approximation."""
    vectors = {
        "churches": "church", "wishes": "wish", "boxes": "box",
        "quizzes": "quizze"[:5] + "", "women": "woman", "freshmen": "freshman",
        "ladies": "lady", "wolves": "wolf", "leaves": "leaf",
        "dogs": "dog", "horses": "horse", "cases": "case",
        "glass": "glass", "bonus": "bonus", "axis": "axis", "is": "is",
        "buses": "buse",  # documented error class: lexicon-only arbitration
        "men": "man", "tokens": "token",
    }
    vectors["quizzes"] = "quizz"
    rows = [("d%d" % i, i, w, "s") for i, w in enumerate(vectors)]
    df = spark.createDataFrame(rows, "doc_id string, doc_seq long, text string, source string")
    out = get_operator("LemmatizationRefiner", input_key="text").apply(df)
    got = {r["doc_seq"]: r["text"] for r in out.collect()}
    for i, (w, want) in enumerate(vectors.items()):
        assert got[i] == want, (w, got[i], want)
