"""Run the reference's OWN example data through the reference's shipped CPU
pipeline shape (statics/pipelines/cpu_pipelines/text_pt_filter.py) with its
TRUE parameters — including min_sentences=3, which the prose examples satisfy
— and assert the Spark chain matches an independent pure-Python mirror
row-for-row (survivor set AND refined text)."""

import json
import re

import pytest
from pyspark.sql import functions as F

from dataflow_spark.operators import dedup as dd
from dataflow_spark.operators import filters as flt
from dataflow_spark.operators import refiners as ref
from tests.oracle import rules

PT_INPUT = "/root/reference/dataflow/example/GeneralTextPipeline/pt_input.jsonl"


def _load_examples():
    rows = []
    with open(PT_INPUT) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if line:
                rows.append((str(i), i, json.loads(line)["raw_content"], "example"))
    return rows


def _py_refine(t: str) -> str:
    t = re.sub(ref._EMOJI_RANGES, "", t)
    t = rules.remove_html_url(t)
    return rules.remove_extra_spaces(t)


def _py_keep(t: str) -> bool:
    return all(
        (
            rules.keep_blocklist(t, ("viagra", "jackpot", "winner"), 1),
            rules.keep_word_number(t),
            rules.keep_colon_end(t),
            rules.keep_sentence_number(t, 3, 7500),
            rules.keep_line_end_ellipsis(t),
            rules.keep_content_not_null(t),
            rules.keep_mean_word_length(t),
            rules.keep_symbol_word_ratio(t),
            rules.keep_html_entity(t),
            rules.keep_no_punc(t),
            rules.keep_special_character(t),
            rules.keep_watermark(t),
            rules.keep_curly_bracket(t),
            rules.keep_capital_words(t),
            rules.keep_lorem_ipsum(t),
            rules.keep_unique_words(t),
            rules.keep_char_number(t),
            rules.keep_line_start_bullet(t),
            rules.keep_line_javascript(t),
        )
    )


def test_reference_pt_pipeline_on_reference_examples(spark):
    rows = _load_examples()
    assert len(rows) == 10  # 9 newline-terminated + 1 trailing line
    df = spark.createDataFrame(
        rows, "doc_id string, doc_seq long, text string, source string"
    )
    df = df.withColumn(
        "text",
        ref.remove_extra_spaces(ref.remove_html_url(ref.remove_emoji(F.col("text")))),
    )
    df = dd.exact_dedup(df.withColumn("_th", dd.content_hash(("text",))), hash_col="_th").drop("_th")
    for cond in (
        flt.keep_blocklist("text", ("viagra", "jackpot", "winner"), 1),
        flt.keep_word_number("text"),
        flt.keep_colon_end("text"),
        flt.keep_sentence_number("text", 3, 7500),
        flt.keep_line_end_ellipsis("text"),
        flt.keep_content_not_null("text"),
        flt.keep_mean_word_length("text"),
        flt.keep_symbol_word_ratio("text"),
        flt.keep_html_entity("text"),
        flt.keep_no_punc("text"),
        flt.keep_special_character("text"),
        flt.keep_watermark("text"),
        flt.keep_curly_bracket("text"),
        flt.keep_capital_words("text"),
        flt.keep_lorem_ipsum("text"),
        flt.keep_unique_words("text"),
        flt.keep_char_number("text"),
        flt.keep_line_start_bullet("text"),
        flt.keep_line_javascript("text"),
    ):
        df = df.where(cond)
    got = {r["doc_id"]: r["text"] for r in df.collect()}

    # independent mirror: refine all, first-seen dedup, then filter
    refined = [(i, _py_refine(t)) for (i, _, t, _) in rows]
    seen, survivors = set(), {}
    for i, t in refined:
        if t in seen:
            continue
        seen.add(t)
        if _py_keep(t):
            survivors[i] = t

    assert got == survivors
    # the example file plants exactly the failure modes the pipeline demos:
    # row 6 too short (word/sentence/char), row 7 watermarked, row 8 ALL-CAPS,
    # row 4 an exact duplicate of row 1 (dedup removes it) — everything else
    # is clean prose and survives.
    assert set(survivors) == {"0", "1", "2", "3", "5", "9"}, survivors.keys()
