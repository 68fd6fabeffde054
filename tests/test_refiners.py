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
