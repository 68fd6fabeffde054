"""Reasoning-pipeline CPU operators (reference operators/reasoning/filter,
composed by statics/pipelines/cpu_pipelines/reasoning_pipeline.py):

* ReasoningAnswerFormatterFilter — faithful reproduction INCLUDING the fact
  that the reference's ``\\boxed`` check is commented out
  (reasoning_answer_formatter_filter.py:15-19), i.e. the shipped operator
  keeps every row; pass ``require_boxed=True`` for the documented intent.
* ReasoningAnswerGroundTruthFilter (exact mode) — extract the final answer
  (AnswerExtraction.py:154-211 branch structure: "final answer is $..$. I
  hope", last ``boxed`` with balanced braces, "he answer is", last-number
  fallback; strip_string normalization subset) and string-compare to the
  gold answer.  The ``math_verify`` mode needs the math_verify package
  (absent here — non-goal, same external-lib class as GPU scorers).
* ReasoningAnswerNgramFilter — repetition score = unique/total n-grams;
  char n-grams for CJK-bearing text, word n-grams otherwise
  (reasoning_answer_ngram_filter.py:94-175), pure Catalyst HOFs.

Unicode note: the word path keeps ``\\w`` characters; Spark uses ``(?U)\\w``
(Python-re parity), the DuckDB oracle RE2 ``\\w`` is ASCII — CJK routes to
the char path on both engines, so divergence is limited to non-ASCII
letters in non-CJK text (absent from the corpus and the reference's
example data).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from dataflow_spark.core.stage import Stage, register


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# answer extraction (AnswerExtraction.py:114-211)
# ---------------------------------------------------------------------------


def _extract_bracketed(ans: str) -> str:
    stack, out = 1, []
    for ch in ans[1:]:
        if ch == "{":
            stack += 1
        elif ch == "}":
            stack -= 1
            if stack == 0:
                break
        out.append(ch)
    return "".join(out)


def _strip_string(s: str) -> str:
    """strip_string's normalization subset: the pure string rewrites at
    AnswerExtraction.py:118-136.  The LaTeX unit table (clean_units) and
    word-number conversion are extension points, not reproduced."""
    s = str(s).strip().replace("\n", "").rstrip(".").replace("\\!", "")
    s = re.sub(r"\\begin\{array\}\{.*?\}", r"\\begin{pmatrix}", s)
    s = re.sub(r"\\end\{array\}", r"\\end{pmatrix}", s).replace("bmatrix", "pmatrix")
    s = (s.replace("tfrac", "frac").replace("dfrac", "frac")
         .replace("\\neq", "\\ne").replace("\\leq", "\\le").replace("\\geq", "\\ge"))
    s = (s.replace("\\left", "").replace("\\right", "")
         .replace("\\{", "{").replace("\\}", "}"))
    s = (s.replace("^{\\circ}", "").replace("^\\circ", "")
         .replace("\\$", "").replace("$", "").replace("\\(", "").replace("\\)", ""))
    s = re.sub(r"\\text\{(.*?)\}", r"\1", s)
    for key in ("x=", "y=", "z=", "x\\in", "y\\in", "z\\in", "x\\to", "y\\to", "z\\to"):
        s = s.replace(key, "")
    s = s.replace("\\emptyset", r"{}").replace("(-\\infty,\\infty)", "\\mathbb{R}")
    s = s.replace("%", "").replace(" .", " 0.").replace("{.", "{0.")
    return s


def extract_answer(pred: str, use_last_number: bool = True) -> str:
    """Faithful extract_answer branch structure."""
    if not pred:
        pred = ""
    pred = str(pred).replace("\u043a\u0438", "")
    if "final answer is $" in pred and "$. I hope" in pred:
        out = pred.split("final answer is $", 1)[1].split("$. I hope", 1)[0].strip()
    elif "boxed" in pred:
        ans = pred.split("boxed")[-1]
        out = _extract_bracketed(ans) if ans.startswith("{") else ans.split("$")[0].strip()
    elif "he answer is" in pred:
        out = pred.split("he answer is")[-1].strip()
    else:
        if use_last_number:
            nums = re.findall(r"-?\d*\.?\d+", pred.replace(",", ""))
            out = nums[-1] if nums else ""
        else:
            out = ""
    return _strip_string(out)


def extract_answer_udf():
    @pandas_udf(T.StringType())
    def udf(preds: pd.Series) -> pd.Series:
        return pd.Series([extract_answer(p) for p in preds])

    return udf


def keep_answer_format(col, require_boxed: bool = False) -> Column:
    """ReasoningAnswerFormatterFilter: the shipped is_valid_answer always
    returns True (its boxed regex is commented out) — reproduced; opt into
    the documented intent with require_boxed."""
    if not require_boxed:
        return _c(col).isNotNull() | _c(col).isNull()  # keep-all, like the reference
    return _c(col).rlike(r"\\boxed\{.*\}")


def keep_answer_groundtruth(answer_col, gt_col) -> Column:
    """exact-mode compare of the EXTRACTED answer
    (reasoning_answer_groundtruth_filter.py:26-27,77-80)."""
    return extract_answer_udf()(_c(answer_col)) == _c(gt_col).cast("string")


# ---------------------------------------------------------------------------
# repetition (n-gram uniqueness) score
# ---------------------------------------------------------------------------

_CJK_RE = "[\u4e00-\u9fff]"


def _word_ngram_score(col, n: int) -> Column:
    cleaned = F.regexp_replace(F.lower(_c(col)), r"(?U)[^\w\s]", " ")
    ws = F.filter(F.split(cleaned, r"\s+"), lambda w: w != "")
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.when(
        F.size(grams) == 0, 0.0
    ).otherwise(F.size(F.array_distinct(grams)).cast("double") / F.size(grams))


def repetition_score(col, n: int = 5) -> Column:
    """unique n-grams / total n-grams; char n-grams when the text contains
    CJK, word n-grams otherwise; 0.0 when too short for any n-gram."""
    t = _c(col)
    word = _word_ngram_score(t, n)
    cleaned = F.regexp_replace(F.lower(t), "[^\u4e00-\u9fff0-9a-z]", "")
    char_grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(cleaned) - n + 1, F.lit(1))),
        lambda i: cleaned.substr(i, F.lit(n)),
    )
    char_score = F.when(F.length(cleaned) < n, 0.0).otherwise(
        F.size(F.array_distinct(char_grams)).cast("double") / F.size(char_grams)
    )
    return F.when(t.isNull(), 0.0).when(t.rlike(_CJK_RE), char_score).otherwise(word)


def keep_answer_ngram(col, min_score: float = 0.1, max_score: float = 1.0, n: int = 5) -> Column:
    s = repetition_score(col, n)
    return (s >= min_score) & (s <= max_score)


# ---------------------------------------------------------------------------
# registry stages
# ---------------------------------------------------------------------------


@register("ReasoningAnswerFormatterFilter")
def answer_formatter_filter(input_key: str = "output", require_boxed: bool = False) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        return df.where(keep_answer_format(input_key, require_boxed))

    return Stage("ReasoningAnswerFormatterFilter", fn, (input_key,), (), "filter")


@register("ReasoningAnswerGroundTruthFilter")
def answer_groundtruth_filter(
    input_test_answer_key: str = "output", input_gt_answer_key: str = "golden_answer"
) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        return df.where(keep_answer_groundtruth(input_test_answer_key, input_gt_answer_key))

    return Stage(
        "ReasoningAnswerGroundTruthFilter", fn,
        (input_test_answer_key, input_gt_answer_key), (), "filter",
    )


@register("ReasoningAnswerNgramFilter")
def answer_ngram_filter(
    input_answer_key: str = "output", min_score: float = 0.1,
    max_score: float = 1.0, ngrams: int = 5,
) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        return df.where(keep_answer_ngram(input_answer_key, min_score, max_score, ngrams))

    return Stage("ReasoningAnswerNgramFilter", fn, (input_answer_key,), (), "filter")
