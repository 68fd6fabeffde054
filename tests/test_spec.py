"""Config-driven pipeline runner (dataflow_spark/core/spec.py) — the
reference's compose-by-name surface (cli.py:231-264, core/operator.py:17-28)
run from a declarative spec file."""

import json

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (0, 0, "the quick brown fox jumps over the lazy dog near the bank", "a"),
        (1, 1, "the quick brown fox jumps over the lazy dog near the bank", "a"),
        (2, 2, "short", "b"),
        (3, 3, "an entirely different document with plenty of distinct words here", "b"),
        (4, 4, None, "c"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "doc_seq", "text", "source"])


def test_run_repo_spec_matches_hand_chain(spark):
    """specs/text_pt_filter.yaml == the same chain composed by hand through
    get_operator — and the dedup/filter semantics hold (dup dropped,
    short/null dropped)."""
    from dataflow_spark.core.spec import load_spec, run_spec
    from dataflow_spark.core.stage import get_operator

    spec = load_spec("specs/text_pt_filter.yaml")
    got = run_spec(_docs(spark), spec)

    df = _docs(spark)
    for name, kw in (
        ("RemoveEmojiRefiner", {}),
        ("HtmlUrlRemoverRefiner", {}),
        ("RemoveExtraSpacesRefiner", {}),
        ("HashDeduplicateFilter", {"input_keys": ("text",), "seq_col": "doc_seq"}),
        ("ContentNullFilter", {}),
        ("WordNumberFilter", {"min_words": 5, "max_words": 100000}),
        ("SentenceNumberFilter", {"min_sentences": 1}),
        ("UniqueWordsFilter", {"threshold": 0.1}),
        ("CharNumberFilter", {"threshold": 20}),
    ):
        kw = dict(kw)
        if "input_keys" not in kw and name != "HashDeduplicateFilter":
            kw["input_key"] = "text"
        df = get_operator(name, **kw).apply(df)

    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in df.collect()
    ) == [0, 3]


def test_spec_json_roundtrip(spark, tmp_path):
    from dataflow_spark.core.spec import run_spec

    p = tmp_path / "mini.json"
    p.write_text(
        json.dumps(
            {
                "name": "mini",
                "stages": [
                    {"operator": "WordNumberFilter",
                     "params": {"input_key": "text", "min_words": 5,
                                "max_words": 100000}},
                ],
            }
        )
    )
    out = run_spec(_docs(spark).where(F.col("text").isNotNull()), str(p))
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 3]


def test_spec_unknown_operator_fails_fast():
    from dataflow_spark.core.spec import pipeline_from_spec

    with pytest.raises(KeyError, match="NopeOperator"):
        pipeline_from_spec({"stages": [{"operator": "NopeOperator"}]})


def test_spec_bad_params_name_stage():
    from dataflow_spark.core.spec import pipeline_from_spec

    with pytest.raises(TypeError, match="stage #0 \\(WordNumberFilter\\)"):
        pipeline_from_spec(
            {"stages": [{"operator": "WordNumberFilter",
                         "params": {"bogus_kw_xyz": 1}}]}
        )


def test_spec_missing_column_validates_before_run(spark):
    """Compile-time key validation (the reference Pipeline.py:103-135
    analogue): a stage needing a column the input lacks raises BEFORE any
    execution, naming the stage."""
    from dataflow_spark.core.spec import pipeline_from_spec

    pipe = pipeline_from_spec(
        {"stages": [{"operator": "QAExtractor"}]}  # needs QA_pairs
    )
    with pytest.raises(KeyError, match="QA_pairs"):
        pipe.run(_docs(spark))


def test_spec_shape_errors():
    from dataflow_spark.core.spec import pipeline_from_spec

    with pytest.raises(ValueError, match="non-empty 'stages'"):
        pipeline_from_spec({"stages": []})
    with pytest.raises(ValueError, match="stage #0"):
        pipeline_from_spec({"stages": ["WordNumberFilter"]})
    with pytest.raises(ValueError, match="unknown key"):
        pipeline_from_spec(
            {"stages": [{"operator": "ContentNullFilter", "oops": 1}]}
        )


def test_spec_cli_validate_only(tmp_path, capsys, spark):
    """The CLI --validate-only path (argparse main) against a real parquet."""
    from dataflow_spark.core import spec as specmod

    inp = tmp_path / "in.parquet"
    _docs(spark).write.parquet(str(inp))
    specmod.main(
        ["specs/text_pt_filter.yaml", "--input", str(inp), "--output",
         str(tmp_path / "out"), "--validate-only"]
    )
    assert "validates" in capsys.readouterr().out


def test_code_spec_matches_composed_pipeline(spark):
    """specs/code_pt_filter.yaml (the reference code_pt chain as a spec)
    keeps exactly the rows the hand-composed pipeline_code_pt_reference
    expression keeps, on the same synthetic code corpus."""
    import __spark_entry__ as m
    from dataflow_spark.core.spec import run_spec

    sf = "/root/testdata/sf0.001"
    composed = {
        r.doc_id for r in m.pipeline_code_pt_reference(spark, sf).collect()
    }
    d = m._code_docs(spark, sf)
    got = {r.doc_id for r in run_spec(d, "specs/code_pt_filter.yaml").collect()}
    assert got == composed and len(got) > 0
