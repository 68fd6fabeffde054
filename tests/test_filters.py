"""Per-operator parity: Spark filter predicates vs the pure-Python oracle
over the adversarial F2 fixture (every filter has passing + failing rows)."""

import pytest
from pyspark.sql import functions as F

from dataflow_spark.core.stage import get_operator
from tests.fixtures import make_docs
from tests.oracle import rules

PARAMS = [
    ("WordNumberFilter", rules.keep_word_number, {"min_words": 5, "max_words": 120}),
    ("CharNumberFilter", rules.keep_char_number, {"threshold": 30}),
    ("SentenceNumberFilter", rules.keep_sentence_number, {"min_sentences": 1, "max_sentences": 50}),
    ("ColonEndFilter", rules.keep_colon_end, {}),
    ("ContentNullFilter", rules.keep_content_not_null, {}),
    ("LineEndWithEllipsisFilter", rules.keep_line_end_ellipsis, {"threshold": 0.3}),
    ("LineStartWithBulletpointFilter", rules.keep_line_start_bullet, {"threshold": 0.9}),
    ("LineWithJavascriptFilter", rules.keep_line_javascript, {"threshold": 3}),
    ("SymbolWordRatioFilter", rules.keep_symbol_word_ratio, {"threshold": 0.4}),
    ("AlphaWordsFilter", rules.keep_alpha_words, {"threshold": 0.6}),
    ("HtmlEntityFilter", rules.keep_html_entity, {}),
    ("IDCardFilter", rules.keep_id_card, {"threshold": 3}),
    ("NoPuncFilter", rules.keep_no_punc, {"threshold": 112}),
    ("SpecialCharacterFilter", rules.keep_special_character, {}),
    ("WatermarkFilter", rules.keep_watermark, {}),
    ("MeanWordLengthFilter", rules.keep_mean_word_length, {"min_len": 3.0, "max_len": 10.0}),
    ("StopWordFilter", rules.keep_stop_word, {"threshold": 0.06}),
    ("CurlyBracketFilter", rules.keep_curly_bracket, {"threshold": 0.025}),
    ("CapitalWordsFilter", rules.keep_capital_words, {"threshold": 0.2}),
    ("LoremIpsumFilter", rules.keep_lorem_ipsum, {"threshold": 3e-8}),
    ("UniqueWordsFilter", rules.keep_unique_words, {"threshold": 0.1}),
]

ORACLE_KW = {
    "WordNumberFilter": lambda kw: {"lo": kw["min_words"], "hi": kw["max_words"]},
    "CharNumberFilter": lambda kw: {"thr": kw["threshold"]},
    "SentenceNumberFilter": lambda kw: {"lo": kw["min_sentences"], "hi": kw["max_sentences"]},
    "MeanWordLengthFilter": lambda kw: {"lo": kw["min_len"], "hi": kw["max_len"]},
}


def _docs_df(spark):
    rows = make_docs(n=120)
    return spark.createDataFrame(rows, "doc_id string, doc_seq long, text string, source string")


@pytest.mark.parametrize("name,oracle_fn,kw", PARAMS, ids=[p[0] for p in PARAMS])
def test_filter_parity(spark, name, oracle_fn, kw):
    df = _docs_df(spark)
    stage = get_operator(name, input_key="text", **kw)
    got = {r["doc_seq"] for r in stage.apply(df).select("doc_seq").collect()}

    okw = ORACLE_KW.get(name, lambda k: {("thr" if "threshold" in k else None): k.get("threshold")} if "threshold" in k else {})(kw)
    okw = {k: v for k, v in okw.items() if k is not None}
    want = {seq for (_, seq, text, _) in make_docs(n=120) if oracle_fn(text, **okw)}
    assert got == want, f"{name}: spark={sorted(got ^ want)} differ"


def test_label_column_semantics(spark):
    """Survivors carry label==1 and non-survivors are dropped (reference
    filter contract, word_number_filter.py:50-62)."""
    df = _docs_df(spark)
    stage = get_operator("WordNumberFilter", input_key="text", min_words=5, max_words=120)
    out = stage.apply(df)
    labels = {r[0] for r in out.select("WordNumberFilter_label").distinct().collect()}
    assert labels == {1}


def test_blocklist_filter(spark):
    df = _docs_df(spark)
    stage = get_operator("BlocklistFilter", input_key="text", blocklist=("lorem", "ipsum"), threshold=1)
    got = {r["doc_seq"] for r in stage.apply(df).select("doc_seq").collect()}
    want = {seq for (_, seq, text, _) in make_docs(n=120) if rules.keep_blocklist(text, ("lorem", "ipsum"), 1)}
    assert got == want


def test_general_filter(spark):
    df = _docs_df(spark)
    stage = get_operator("GeneralFilter", predicates=[F.length("text") > 50, "source = 'adv'"])
    got = stage.apply(df).count()
    want = sum(1 for (_, _, t, s) in make_docs(n=120) if len(t) > 50 and s == "adv")
    assert got == want


def test_filter_chain_fuses_without_shuffle(spark):
    """The whole rule-filter chain must stay one narrow stage: no Exchange in
    the physical plan."""
    df = _docs_df(spark)
    for name, _, kw in PARAMS[:8]:
        df = get_operator(name, input_key="text", **kw).apply(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
