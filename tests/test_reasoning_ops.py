"""Reasoning-filter parity: answer extraction (branches, balanced braces,
strip normalization), ground-truth compare, n-gram repetition score — Spark
vs a pure-Python mirror, plus the composed CPU pipeline shape on synthesized
math answers."""

import re

import pytest
from pyspark.sql import functions as F

from dataflow_spark.core.stage import get_operator
from dataflow_spark.operators import reasoning as R


def test_extract_answer_branches():
    cases = {
        "The final answer is $42$. I hope it helps": "42",
        r"so we get \boxed{17}": "17",
        r"thus \boxed{\frac{1}{2}} done": r"\frac{1}{2}",
        # clean_units (exact mode, skip_unit=False) strips the unit word 'a'
        # even inside braces — the reference's UnitTextManager does the same
        r"nested \boxed{{a}+{b}} end": "{}+{b}",
        r"nested \boxed{{q}+{r}} end": "{q}+{r}",  # non-unit letters survive
        "The answer is 3.5": "3.5",
        "values 1, 2 and 19 appear": "19",
        "no numbers here": "",
        "": "",
        r"boxed 7$ trailing": "7",
        "x=5": "5",           # last-number branch; strip removes 'x='
        "The answer is 95%.": "95",
    }
    for pred, want in cases.items():
        assert R.extract_answer(pred) == want, (pred, R.extract_answer(pred), want)


def test_repetition_score_parity(spark):
    def py_word_score(t, n=5):
        t = re.sub(r"[^\w\s]", " ", t.lower())
        ws = [w for w in t.split() if w]
        if len(ws) < n:
            return 0.0
        grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        return len(set(grams)) / len(grams)

    def py_char_score(t, n=5):
        t = re.sub(r"[^一-鿿0-9a-z]", "", t.lower())
        if len(t) < n:
            return 0.0
        grams = [t[i : i + n] for i in range(len(t) - n + 1)]
        return len(set(grams)) / len(grams)

    rows = [
        ("r0", "the quick brown fox jumps over the lazy dog near the river bank today"),
        ("r1", "repeat me repeat me repeat me repeat me repeat me repeat me repeat me"),
        ("r2", "short text"),
        ("r3", "数学题的答案是四十二因为计算结果就是这样数学题的答案是四十二"),
        ("r4", "Solve: x^2 + 2x + 1 = 0, so (x+1)^2 = 0 and x = -1, a double root."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, output string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", R.repetition_score("output", 5).alias("s")).collect()
    }
    for i, t in rows:
        want = py_char_score(t) if re.search(r"[一-鿿]", t) else py_word_score(t)
        assert abs(got[i] - want) < 1e-12, (i, got[i], want)


def test_reasoning_pipeline_shape(spark):
    rows = [
        ("a", "Reasoning... The final answer is $8$. I hope it helps", "8"),
        ("b", r"Thus \boxed{12} is our result after careful long derivation steps", "12"),
        ("c", r"We conclude \boxed{9}", "4"),          # wrong answer -> dropped
        ("d", "loop loop loop loop loop loop loop loop loop loop loop the answer is 5", "5"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, output string, golden_answer string")
    out = df
    for name, kw in (
        ("ReasoningAnswerFormatterFilter", {"input_key": "output"}),
        ("ReasoningAnswerGroundTruthFilter", {}),
        ("ReasoningAnswerNgramFilter", {"min_score": 0.1, "max_score": 1.0, "ngrams": 5}),
    ):
        out = get_operator(name, **kw).apply(out)
    kept = {r["doc_id"] for r in out.collect()}
    # c fails ground truth; d passes GT ('5') and its repetition score
    # (distinct-ish tail) stays above 0.1; a and b are clean
    assert kept == {"a", "b", "d"}


def test_reference_math_example_rows(spark):
    """The reference's ReasoningPipeline example file carries REAL model
    outputs (44 rows, 2 with null output).  The faithful extract+exact-GT
    chain keeps 42: only the two null-output rows drop.  Row 17 ('02' vs
    gold '2') is now kept because convert_word_number canonicalizes digit
    strings through int() exactly like the reference's w2n wrapper — the
    round-2 gap (41/44, clean_units/w2n missing) is closed.  The per-row
    extraction mirror must agree with Spark exactly."""
    import json

    path = "/root/reference/dataflow/example/ReasoningPipeline/pipeline_math_short.json"
    data = json.load(open(path))
    df = spark.createDataFrame(
        [(str(i), d["output"], str(d["golden_answer"])) for i, d in enumerate(data)],
        "doc_id string, output string, golden_answer string",
    )
    kept = {
        r["doc_id"]
        for r in df.where(R.keep_answer_groundtruth("output", "golden_answer")).collect()
    }
    want = {
        str(i) for i, d in enumerate(data)
        if R.extract_answer(d["output"]) == str(d["golden_answer"])
    }
    assert kept == want
    assert len(kept) == 42 and {"0", "43"} == set(map(str, range(44))) - kept


def test_word_to_num_w2n_parity():
    """The from-scratch converter reproduces word2number's documented
    behavior: digit passthrough, filtered unknown words, scales, hyphens,
    decimals via 'point', and ValueError on non-number text (which
    _convert_word_number maps to 'unchanged')."""
    w = R._word_to_num
    assert w("42") == 42
    assert w("two") == 2
    assert w("twenty-three") == 23
    assert w("nine hundred twelve") == 912
    assert w("two million three thousand nine hundred and eighty four") == 2_003_984
    assert w("point two five") == 0.25
    assert w("three point one four") == 3.14
    assert w("I have two apples") == 2  # unknown words filtered, like w2n
    for bad in ("hello", "", "point", "two point one point"):
        with pytest.raises(ValueError):
            w(bad)
    # the strip_string wrapper never raises
    assert R._convert_word_number("no numbers at all") == "no numbers at all"
    assert R._convert_word_number("seven") == "7"
    assert R._convert_word_number("02") == "2"


def test_clean_units_matches_reference_semantics():
    """clean_units strips unit words with the reference's unescaped-regex
    semantics (AnswerExtraction.py:93-98)."""
    assert R._clean_units("15 kg") == "15 "
    assert R._clean_units("15 meters") == "15 "
    assert R._clean_units("3 miles per hour") == "3   "
    # non-unit words survive
    assert R._clean_units("42 widgets") == "42 widgets"
    # skip_unit bypass: strip_string keeps the unit text
    assert R._strip_string("15 kg", skip_unit=True) == "15 kg"


# ---------------------------------------------------------------------------
# round-3 dataset-level ops
# ---------------------------------------------------------------------------


def test_pretrain_format_convert(spark):
    from dataflow_spark.operators import reasoning as rsn

    df = spark.createDataFrame(
        [("q1", "a1"), (None, "a2"), ("q3", None)], "question string, answer string"
    )
    got = sorted(r.text for r in rsn.pretrain_format_convert(df).collect())
    assert got == ["\na2", "q1\na1", "q3\n"]
    assert rsn.pretrain_format_convert(df).columns == ["text"]


def test_answer_pipeline_root_branches(spark):
    from dataflow_spark.operators import reasoning as rsn

    df = spark.createDataFrame(
        [
            (1, "kept-gt", "The answer is 99"),          # gt present → kept verbatim
            (2, "", "Thus \\boxed{42} done"),            # backfilled from answer
            (3, None, "the answer is 7"),                 # null gt → backfilled
            (4, "", ""),                                  # no gt, no answer → without_gt
            (5, "", None),                                # null answer → without_gt
        ],
        "id long, golden_answer string, output string",
    )
    with_gt, without_gt = rsn.answer_pipeline_root(df)
    w = {r.id: r.golden_answer for r in with_gt.collect()}
    assert w == {1: "kept-gt", 2: "42", 3: "7"}
    wo = without_gt.collect()
    assert sorted(r.id for r in wo) == [4, 5]
    assert all(r.golden_answer is None for r in wo)


def test_difficulty_and_category_stats(spark):
    from dataflow_spark.operators import reasoning as rsn

    df = spark.createDataFrame(
        [("easy",), ("easy",), ("hard",), (None,)], "difficulty_score string"
    )
    got = {r.difficulty: r["count"] for r in rsn.difficulty_stats(df).collect()}
    assert got == {"easy": 2, "hard": 1}  # NaN dropped like value_counts

    cat = spark.createDataFrame(
        [("math", "algebra"), ("math", "algebra"), ("math", "geometry"), ("code", "py")],
        "primary_category string, secondary_category string",
    )
    rows = {
        (r.primary_category, r.secondary_category): (r.secondary_num, r.primary_num)
        for r in rsn.category_stats(cat).collect()
    }
    assert rows == {
        ("math", "algebra"): (2, 3),
        ("math", "geometry"): (1, 3),
        ("code", "py"): (1, 1),
    }


def test_qa_extract_alpaca(spark):
    from dataflow_spark.core.stage import get_operator
    from dataflow_spark.operators.chunking import qa_extract_alpaca

    df = spark.createDataFrame(
        [
            ([{"question": " q1 ", "answer": "a1"},
              {"question": "", "answer": "a2"},
              {"question": "q3", "answer": "  "},
              {"question": None, "answer": "a4"}],),
            (None,),
        ],
        "QA_pairs array<struct<question:string,answer:string>>",
    )
    rows = qa_extract_alpaca(df).collect()
    assert len(rows) == 1
    assert rows[0].input == "q1" and rows[0].output == "a1"
    assert rows[0].instruction.startswith("Please answer")
    st = get_operator("QAExtractor")
    assert st(df).count() == 1


def test_token_stats_reference_parity(spark):
    """ReasoningTokenDatasetEvaluator: replay the reference's get_token_info
    (reasoning_token_dataset_evaluator.py:48-96) in plain Python with the
    same tokenizer proxy and require identical stats, including the
    sorted[n//2] median convention and ''-for-missing handling."""
    import re

    from dataflow_spark.operators.evaluators import BPE_SPLIT_RE
    from dataflow_spark.operators.reasoning import token_stats

    samples = [
        {"q": "What is 2+2? It's simple.", "a": "The answer is 4."},
        {"q": "", "a": "yes"},
        {"q": "Second question, longer than the first one by far", "a": ""},
        {"q": None, "a": "don't stop"},
        {"q": "short", "a": None},
        {"q": "a b c d e", "a": "x"},
        {"q": "one more row here", "a": "and its answer text goes on a bit"},
    ]

    def tok_len(s):
        return len(re.findall(BPE_SPLIT_RE, s or ""))

    q_lens = [tok_len(s["q"]) for s in samples]
    a_lens = [tok_len(s["a"]) for s in samples]
    expected = {
        "questions_zeros_count": q_lens.count(0),
        "answers_zeros_count": a_lens.count(0),
        "questions_min": min(q_lens),
        "questions_max": max(q_lens),
        "questions_mean": sum(q_lens) / len(q_lens),
        "questions_median": sorted(q_lens)[len(q_lens) // 2],
        "answers_min": min(a_lens),
        "answers_max": max(a_lens),
        "answers_mean": sum(a_lens) / len(a_lens),
        "answers_median": sorted(a_lens)[len(a_lens) // 2],
    }
    df = spark.createDataFrame(
        [(s["q"], s["a"]) for s in samples], "q string, a string"
    )
    rows = token_stats(df, "q", "a").collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    assert got == expected


def test_token_stats_even_count_median(spark):
    # even n: reference median is the UPPER middle element sorted[n//2]
    from dataflow_spark.operators.reasoning import token_stats

    df = spark.createDataFrame(
        [("a", "x"), ("a b", "x"), ("a b c", "x"), ("a b c d", "x")],
        "q string, a string",
    )
    row = token_stats(df, "q", "a").collect()[0]
    assert row.questions_median == 3  # sorted [1,2,3,4][2]
    assert row.questions_mean == 2.5


def test_token_stats_stage(spark):
    from dataflow_spark.core.stage import get_operator

    df = spark.createDataFrame([("hi there", "yo")], "instruction string, output string")
    out = get_operator("ReasoningTokenDatasetEvaluator")(df)
    assert out.count() == 1


def test_fuzz_kernels_hand_vectors():
    """Hand-computed vectors for the from-scratch similarity kernels (the
    published fuzzywuzzy/rapidfuzz algorithms; the libraries are absent, so
    the expectations here are worked by hand from the definitions)."""
    from dataflow_spark.operators import _fuzz as fz

    # Indel ratio = 200*LCS/(m+n)
    assert fz.ratio("abcd", "abcd") == 100.0
    assert fz.ratio("", "") == 100.0
    assert fz.ratio("abc", "") == 0.0
    # LCS("abcd","abed") = "abd" (3) -> 200*3/8 = 75
    assert fz.ratio("abcd", "abed") == 75.0
    # partial: "bcd" inside "abcde" -> 100
    assert fz.partial_ratio("bcd", "abcde") == 100.0
    # token sort: order-insensitive
    assert fz.token_sort_ratio("world hello", "hello world") == 100.0
    # token set: subset tokens score 100 on the intersection construction
    assert fz.token_set_ratio("hello world extra", "hello world") == 100.0
    # partial_token_ratio: any shared token -> 100 (the rapidfuzz shortcut:
    # the intersection is a common prefix of both constructed strings)
    assert fz.partial_token_ratio("zz aa", "aa bb cc dd ee ff gg") == 100.0
    # disjoint token sets with duplicate tokens take the diff-vs-diff path
    assert fz.partial_token_ratio("q q z", "w") == 0.0
    # WRatio picks the best scaled variant; exact match stays 100
    assert fz.wratio("hello world", "hello world") == 100.0
    assert fz.wratio("", "anything") == 0.0
    # length-mismatch branch (len_ratio 5.25 -> PARTIAL_SCALE 0.9):
    # partial_ratio window 'spam' scores 100 -> 90 beats the token path 85.5
    assert fz.wratio("spam", "spam and eggs and ham") == 90.0
    # ...and where only the token path fires (shared token, weak windows):
    # 100 * 0.95 * 0.9 = 85.5 — the plain-token variant used before this
    # fix scored ~48.9 here, below the 50 normalize threshold
    assert abs(fz.wratio("zz aa", "aa bb cc dd ee ff gg") - 85.5) < 1e-9
    best, score = fz.extract_one("arithmetic", ("Algebra", "Arithmetic", "Logic"))
    assert best == "Arithmetic" and score > 70


def test_category_normalize_branches(spark):
    from dataflow_spark.operators.reasoning import (
        _normalize_categories_py,
        category_hash,
        category_normalize,
    )

    # pure-python branch checks (reference flow replayed by hand)
    assert _normalize_categories_py("x", "1.2") == (
        "Foundations and Logic",
        "Basic Theory, Formalization, and History & Education",
    )
    assert _normalize_categories_py("7", "junk") == (
        "Arithmetic", "")  # primary code, secondary unmatched
    assert _normalize_categories_py("zzz qqq", "zzz qqq") == ("", "")
    # out-of-range codes fall through to fuzzy (and then garbage -> '')
    assert _normalize_categories_py("99", "12.9")[0] == ""

    # the secondary 'X.Y' code wins OUTRIGHT, ignoring raw_primary — the
    # reference's branch order (CategoryFuzz.py:93-104)
    assert _normalize_categories_py("geometry & topology", "3.3") == (
        "Analysis and Differential Equations",
        "Differential Equations and Dynamical Systems",
    )

    rows = [
        ("a", "2", "number theory"),
        ("b", "geometry & topology", "topology + algebraic topology"),
        ("c", "nope nope", "nope"),
    ]
    df = spark.createDataFrame(rows, ["id", "primary_category", "secondary_category"])
    out = {r.id: (r.primary_category, r.secondary_category)
           for r in category_normalize(df).collect()}
    assert out["a"] == ("Algebra and Number Theory", "Number Theory")
    assert out["b"] == ("Geometry and Topology", "Topology and Algebraic Topology")
    assert out["c"] == ("", "")
    hdf = category_normalize(df).select(
        "id", category_hash("primary_category", "secondary_category").alias("h")
    )
    h = {r.id: r.h for r in hdf.collect()}
    # unknown pair -> 170, the reference category_hasher's except-path
    # sentinel (CategoryFuzz.py:135-142)
    assert h["a"] == 8 * 1 + 3 and h["c"] == 170.0
