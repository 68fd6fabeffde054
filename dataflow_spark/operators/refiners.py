"""Refiners — in-place text-column rewrites as Catalyst expression stages.

Reference pattern (canonical: dataflow/operators/general_text/refine/
remove_extra_spaces_refiner.py:43-69): read table -> per-row Python string
rewrite of ``input_key`` -> write whole table.  Here each refiner is a pure
``regexp_replace``/``translate``/``lower`` Column expression, so an arbitrary
refiner chain fuses into one codegen stage (zero Python, zero materialization).
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.stage import Stage, register
from dataflow_spark.functions.text import c

# --- expression builders ----------------------------------------------------


def remove_extra_spaces(col) -> Column:
    """RemoveExtraSpacesRefiner (remove_extra_spaces_refiner.py:9-69):
    ' '.join(text.split()) == collapse all whitespace runs, strip ends.
    Collapse FIRST, then trim: trim() strips only spaces, so trailing
    '\\n'/'\\t' must become a space before trim sees it (caught by
    tests/test_properties.py on whitespace-only input)."""
    return F.trim(F.regexp_replace(c(col), r"\s+", " "))


_EMOJI_RANGES = (
    "[\U0001F600-\U0001F64F"   # emoticons
    "\U0001F300-\U0001F5FF"    # symbols & pictographs
    "\U0001F680-\U0001F6FF"    # transport & map
    "\U0001F1E0-\U0001F1FF"    # flags
    "\U00002700-\U000027BF"
    "\U0001F900-\U0001F9FF"
    "\U00002600-\U000026FF]+"
)


def remove_emoji(col) -> Column:
    """RemoveEmojiRefiner (remove_emoji_refiner.py:10-17): strip emoji ranges."""
    return F.regexp_replace(c(col), _EMOJI_RANGES, "")


def remove_html_url(col) -> Column:
    """HtmlUrlRemoverRefiner (html_url_remover_refiner.py:51-53): strip
    https?://\\S+ URLs then <...> tags, in that order."""
    no_url = F.regexp_replace(c(col), r"https?://\S+", "")
    return F.regexp_replace(no_url, r"<[^>]*>", "")


def remove_html_entity(col) -> Column:
    """HtmlEntityRefiner (html_entity_refiner.py:9-37): strip the same entity
    set HtmlEntityFilter detects."""
    from dataflow_spark.operators.filters import _ENTITY_RE

    return F.regexp_replace(c(col), _ENTITY_RE, "")


def lowercase(col) -> Column:
    """LowercaseRefiner (lowercase_refiner.py:9-48)."""
    return F.lower(c(col))


def remove_punctuation(col) -> Column:
    """RemovePunctuationRefiner (remove_punctuation_refiner.py:9-53):
    str.translate deleting ASCII punctuation — exact translate() analogue."""
    return F.translate(c(col), string.punctuation, "")


def remove_number(col) -> Column:
    """RemoveNumberRefiner (remove_number_refiner.py:8-42): delete digits."""
    return F.regexp_replace(c(col), "[0-9]", "")


def remove_repetitions_punctuation(col) -> Column:
    """RemoveRepetitionsPunctuationRefiner
    (remove_repetitions_punctuation_refiner.py:10-54): ([^\\w\\s_])\\1+ -> \\1
    (Java regex backreference, JVM-side; (?U) makes Java's \\w Unicode-aware
    to match Python re semantics — otherwise repeated CJK chars collapse)."""
    return F.regexp_replace(c(col), r"(?U)([^\w\s_])\1+", "$1")


def remove_image_refs(col) -> Column:
    """RemoveImageRefsRefiner (remove_image_ref_refiner.py:9-55): strip
    markdown image refs ![alt](url) and bare image filenames."""
    no_md = F.regexp_replace(c(col), r"!\[[^\]]*\]\([^)]*\)", "")
    return F.regexp_replace(no_md, r"(?i)\b\S+\.(?:png|jpe?g|gif|bmp|webp)\b", "")


def remove_reference(col) -> Column:
    """ReferenceRemoverRefiner (ref_removal_refiner.py:47-54): strip
    [1]-style citation markers."""
    return F.regexp_replace(c(col), r"\[\d{1,3}\]", "")


def remove_stopwords(col) -> Column:
    """RemoveStopwordsRefiner (remove_stopwords_refiner.py:29): drop stopword
    words, rejoin with single spaces — array HOFs, no Python."""
    from dataflow_spark.operators.filters import STOPWORDS_EN

    ws = F.filter(F.split(c(col), r"\s+"), lambda w: w != "")
    kept = F.filter(
        ws, lambda w: ~F.array_contains(F.lit(STOPWORDS_EN), F.lower(w))
    )
    return F.array_join(kept, " ")


def text_normalization(col) -> Column:
    """TextNormalizationRefiner (text_normalization_refiner.py:55-70):
    MM/DD/YYYY -> YYYY-MM-DD and $N -> N USD."""
    iso = F.regexp_replace(
        c(col), r"\b(\d{1,2})/(\d{1,2})/(\d{4})\b", "$3-$1-$2"
    )
    return F.regexp_replace(iso, r"\$(\d+(?:\.\d+)?)", "$1 USD")


_REFINERS = {
    "RemoveExtraSpacesRefiner": remove_extra_spaces,
    "RemoveEmojiRefiner": remove_emoji,
    "HtmlUrlRemoverRefiner": remove_html_url,
    "HtmlEntityRefiner": remove_html_entity,
    "LowercaseRefiner": lowercase,
    "RemovePunctuationRefiner": remove_punctuation,
    "RemoveNumberRefiner": remove_number,
    "RemoveRepetitionsPunctuationRefiner": remove_repetitions_punctuation,
    "RemoveImageRefsRefiner": remove_image_refs,
    "ReferenceRemoverRefiner": remove_reference,
    "RemoveStopwordsRefiner": remove_stopwords,
    "TextNormalizationRefiner": text_normalization,
}


def refine_stage(name: str, expr_builder):
    def make(input_key: str = "text") -> Stage:
        def fn(df: DataFrame) -> DataFrame:
            return df.withColumn(input_key, expr_builder(input_key))

        return Stage(name, fn, (input_key,), (input_key,), "refine")

    return make


for _name, _builder in _REFINERS.items():
    register(_name)(refine_stage(_name, _builder))


@register("PandasOperator")
def pandas_operator(fns: list | None = None) -> Stage:
    """PandasOperator (core_text/refine/pandas_operator.py:8-52): arbitrary
    DataFrame->DataFrame lambda list — the generic transform stage."""

    def fn(df: DataFrame) -> DataFrame:
        for f in fns or []:
            df = f(df)
        return df

    return Stage("PandasOperator", fn, (), (), "transform")


# --- emoticons / contractions / stemming ------------------------------------

from dataflow_spark.operators._emoticon_data import EMOTICONS as _EMOTICONS


def remove_emoticons(col) -> Column:
    """RemoveEmoticonsRefiner (remove_emoticons_refiner.py:9-57): strip the
    full 221-entry public emoticon dictionary.  Exact reference semantics —
    the reference loops the dict in insertion order and str.replace()s each
    key, so this is a chain of LITERAL (non-regex) replaces in that same
    order; ordering is observable (':)' fires before ':)))' can)."""
    out = c(col)
    for e in _EMOTICONS:
        out = F.replace(out, F.lit(e), F.lit(""))
    return out


from dataflow_spark.operators._contraction_data import CONTRACTIONS as _CONTRACTIONS


def contraction_rules() -> list[tuple[str, str]]:
    """(pattern, replacement) chain for the full 171-entry contraction dict,
    longest-first (the _contraction_data module is emitted in that order).
    Case handling mirrors the reference's `contractions.fix`
    (remove_contractions_refiner.py:1,40) for the dominant case: the first
    letter is captured case-insensitively and re-emitted, so "Can't" ->
    "Cannot" while "can't" -> "cannot".  RE2-compatible on purpose (no
    lookaround, single-digit backrefs) so the DuckDB oracle can run the
    identical chain.  Divergence note: ALL-CAPS tails ("CAN'T" -> "CAnnot")
    and leading-apostrophe keys ("'Tis" -> "it is") keep dictionary casing.
    """
    import re as _re

    rules = []
    for k, v in _CONTRACTIONS.items():
        la = r"\b" if k[0].isalnum() else ""
        ra = r"\b" if k[-1].isalnum() else ""
        if k[0].isalpha() and k[0].lower() == v[0].lower():
            pat = f"(?i){la}({_re.escape(k[0])}){_re.escape(k[1:])}{ra}"
            rules.append((pat, v[1:]))  # replacement = backref-1 + tail
        else:
            rules.append((f"(?i){la}{_re.escape(k)}{ra}", None))
    return rules


def remove_contractions(col) -> Column:
    """RemoveContractionsRefiner (remove_contractions_refiner.py:9-43):
    expand English contractions — the full public dict, an ordered
    longest-first chain of JVM regexp_replace calls (stays whole-stage
    codegen; not on any bench hot path)."""
    out = c(col)
    for (k, v), (pat, tail) in zip(_CONTRACTIONS.items(), contraction_rules()):
        # "$1" + tail is unambiguous: no expansion tail starts with a digit
        repl = "$1" + tail if tail is not None else v
        out = F.regexp_replace(out, pat, repl)
    return out


def stem_words(col) -> Column:
    """StemmingLemmatizationRefiner (stemming_lemmatization_refiner.py:10-50)
    stand-in: deterministic suffix-stripping stemmer (S-stemmer rules:
    -ies -> -y, -sses -> -ss, trailing -s dropped) word-wise via array HOFs.
    The reference's nltk Porter/WordNet models are not in this sandbox; the
    stage contract (word-wise rewrite, rejoin with spaces) is identical, so a
    real stemmer UDF slots in unchanged."""
    ws = F.filter(F.split(c(col), r"\s+"), lambda w: w != "")
    def stem(w):
        return (
            F.when(w.rlike(r"(?i).*ies$"), F.concat(F.substring(w, 1, F.length(w) - 3), F.lit("y")))
            .when(w.rlike(r"(?i).*sses$"), F.substring(w, 1, F.length(w) - 2))
            .when(w.rlike(r"(?i).*[^su]s$"), F.substring(w, 1, F.length(w) - 1))
            .otherwise(w)
        )
    return F.array_join(F.transform(ws, stem), " ")


def porter_stem_words(col) -> Column:
    """StemmingLemmatizationRefiner, real algorithm: Porter stemmer
    (operators/_porter.py, the published 1980 rules — the algorithm behind
    the reference's nltk PorterStemmer, stemming_lemmatization_refiner.py:
    10-50) applied word-wise via an Arrow-batched pandas UDF; whitespace
    re-joined with single spaces like the reference's ' '.join."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql import types as T

    from dataflow_spark.operators._porter import porter_stem

    @pandas_udf(T.StringType())
    def udf(texts):
        import pandas as pd

        return pd.Series(
            [
                None
                if t is None
                else " ".join(porter_stem(w) for w in t.split())
                for t in texts
            ]
        )

    return udf(c(col))


def lemmatize_words(col) -> Column:
    """StemmingLemmatizationRefiner(method='lemmatization')
    (stemming_lemmatization_refiner.py:56-65 wraps nltk WordNetLemmatizer):
    word-wise noun lemmatization, rejoined with single spaces.

    The real WordNetLemmatizer is morphy = detachment rules + LEXICON filter
    + exception list; the WordNet data files are absent from this sandbox, so
    this is the published morphy noun detachment rule set applied rules-only,
    first-longest-match, with no lexicon to arbitrate candidates:

      -ches/-shes/-xes/-zes -> strip 'es'   (sibilant plurals: church, box)
      -men  -> -man                          (women -> woman)
      -ies  -> -y                            (ladies -> lady)
      -ves  -> -f                            (wolves -> wolf)
      -s    -> ''   guarded: not -ss/-us/-is, len > 2   (dogs -> dog)

    The '-ses' ambiguity (horses = horse+s vs buses = bus+es) is resolved
    toward the far more common e-stem class by the bare-s rule (horses ->
    horse; buses -> buse is the documented approximation error — only the
    WordNet lexicon can arbitrate that pair).  Pure Catalyst (split ->
    transform -> array_join), whole-stage codegen, no Python."""
    ws = F.filter(F.split(c(col), r"\s+"), lambda w: w != "")

    def lem(w):
        strip = lambda n: F.substring(w, 1, F.length(w) - n)  # noqa: E731
        return (
            F.when(
                w.endswith("ches") | w.endswith("shes") | w.endswith("xes") | w.endswith("zes"),
                strip(2),
            )
            .when(w.endswith("men"), F.concat(strip(3), F.lit("man")))
            .when(w.endswith("ies"), F.concat(strip(3), F.lit("y")))
            .when(w.endswith("ves"), F.concat(strip(3), F.lit("f")))
            .when(
                w.endswith("s")
                & ~w.endswith("ss")
                & ~w.endswith("us")
                & ~w.endswith("is")
                & (F.length(w) > 2),
                strip(1),
            )
            .otherwise(w)
        )

    return F.array_join(F.transform(ws, lem), " ")


register("RemoveEmoticonsRefiner")(refine_stage("RemoveEmoticonsRefiner", remove_emoticons))
register("RemoveContractionsRefiner")(refine_stage("RemoveContractionsRefiner", remove_contractions))
register("StemmingLemmatizationRefiner")(refine_stage("StemmingLemmatizationRefiner", stem_words))
register("PorterStemmingRefiner")(refine_stage("PorterStemmingRefiner", porter_stem_words))
register("LemmatizationRefiner")(refine_stage("LemmatizationRefiner", lemmatize_words))
