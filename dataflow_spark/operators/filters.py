"""Rule-based quality filters (Gopher/C4/RefinedWeb-style) as pure Catalyst
Column predicates.

Reference: dataflow/operators/general_text/filter/rule_based_filter.py (1519
LoC of per-row Python loops) — each operator below cites its class/logic lines.
Uniform filter semantics reproduced from the reference (SURVEY.md §2): compute
the per-row predicate, write a 0/1 label column, and KEEP only rows where the
label is 1 — downstream sees survivors, whose label column is always 1
(e.g. word_number_filter.py:50-62).

Spark-first: every predicate here is a JVM expression — the whole 20-filter
chain fuses into ONE whole-stage-codegen stage with zero shuffles and zero
Python, and conjunctive predicates push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.stage import Stage, register
from dataflow_spark.functions.text import (
    c,
    char_count_no_ws,
    count_regex,
    count_substr,
    lines,
    lower_words,
    ngram_unique_ratio,
    ratio,
    word_count,
    words,
)

# ---------------------------------------------------------------------------
# predicate builders: each returns a boolean "keep this row" Column
# ---------------------------------------------------------------------------


def keep_word_number(col, min_words: int = 20, max_words: int = 100000) -> Column:
    """WordNumberFilter (word_number_filter.py:50-58): min <= len(split()) < max."""
    wc = word_count(col)
    return (wc >= min_words) & (wc < max_words)


def keep_char_number(col, threshold: int = 100) -> Column:
    """CharNumberFilter (rule_based_filter.py:1338-1355): non-ws chars >= thr."""
    return char_count_no_ws(col) >= threshold


def keep_sentence_number(col, min_sentences: int = 3, max_sentences: int = 7500) -> Column:
    """SentenceNumberFilter (rule_based_filter.py:66-112): count of
    r"\\b[^.!?\\n]+[.!?]*" matches within [min, max]."""
    n = count_regex(col, r"\b[^.!?\n]+[.!?]*")
    return (n >= min_sentences) & (n <= max_sentences)


def keep_colon_end(col) -> Column:
    """ColonEndFilter (rule_based_filter.py:53-57): drop text ending with ':'."""
    return ~F.endswith(c(col), F.lit(":"))


def keep_content_not_null(col) -> Column:
    """ContentNullFilter (rule_based_filter.py:299-300)."""
    return c(col).isNotNull() & (F.trim(c(col)) != "")


def keep_line_end_ellipsis(col, threshold: float = 0.3) -> Column:
    """LineEndWithEllipsisFilter (rule_based_filter.py:230-241): ratio of
    non-blank lines ending with '...' or '…' < threshold."""
    ls = lines(col)
    ell = F.size(
        F.filter(
            ls,
            lambda l: F.endswith(F.rtrim(l), F.lit("..."))
            | F.endswith(F.rtrim(l), F.lit("…")),
        )
    )
    return F.coalesce(ratio(ell, F.size(ls)) < threshold, F.lit(True))


_BULLETS = ["•", "‣", "▶", "◀", "◦", "■",
            "□", "▪", "▫", "–"]


def keep_line_start_bullet(col, threshold: float = 0.9) -> Column:
    """LineStartWithBulletpointFilter (rule_based_filter.py:1407-1430): ratio
    of lines starting with a unicode bullet <= threshold."""
    ls = lines(col)
    bullet = F.size(
        F.filter(
            ls,
            lambda l: F.array_contains(
                F.array(*[F.lit(b) for b in _BULLETS]), F.substring(F.ltrim(l), 1, 1)
            ),
        )
    )
    return F.coalesce(ratio(bullet, F.size(ls)) <= threshold, F.lit(True))


def keep_line_javascript(col, threshold: int = 3) -> Column:
    """LineWithJavascriptFilter (rule_based_filter.py:1484-1505): keep if <= 3
    non-blank lines, OR the number of lines NOT containing 'javascript'
    (case-insensitive) >= threshold."""
    ls = lines(col)
    non_js = F.size(F.filter(ls, lambda l: ~F.contains(F.lower(l), F.lit("javascript"))))
    return (F.size(ls) <= 3) | (non_js >= threshold)


def keep_symbol_word_ratio(col, threshold: float = 0.4) -> Column:
    """SymbolWordRatioFilter (rule_based_filter.py:353-375): (count('#') +
    count('...') + count('…')) / word_count < threshold.  Word count uses a
    WordPunct-style tokenization (\\w+|[^\\w\\s]+) for parity with nltk."""
    sym = (
        count_substr(col, "#")
        + count_substr(col, "...")
        + count_substr(col, "…")
    )
    wc = count_regex(col, r"\w+|[^\w\s]+")
    return F.coalesce(ratio(sym, wc) < threshold, F.lit(True))


def keep_alpha_words(col, threshold: float = 0.6) -> Column:
    """AlphaWordsFilter (rule_based_filter.py:442-461): ratio of words
    containing at least one [a-zA-Z] > threshold."""
    ws = words(col)
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-zA-Z]")))
    return F.coalesce(ratio(alpha, F.size(ws)) > threshold, F.lit(False))


_HTML_ENTITIES = [
    "nbsp", "lt", "gt", "amp", "quot", "apos", "hellip", "ndash", "mdash",
    "lsquo", "rsquo", "ldquo", "rdquo",
]
# full-width '＆'-prefixed variants included per rule_based_filter.py:520-526
_ENTITY_RE = (
    "(&|＆)(" + "|".join(_HTML_ENTITIES) + ")(;|；)?"
)


def keep_html_entity(col) -> Column:
    """HtmlEntityFilter (rule_based_filter.py:520-526): no HTML entities."""
    return ~c(col).rlike(_ENTITY_RE)


_ID_CARD_RE = r"(?i)(身份证|\bid\s*number\b|\bidentification\b|\bidentity\s*card\b|\bid\s*card\b|\bpassport\s*number\b)"


def keep_id_card(col, threshold: int = 3) -> Column:
    """IDCardFilter (rule_based_filter.py:592): ID-card-term matches < thr."""
    return count_regex(col, _ID_CARD_RE) < threshold


def keep_no_punc(col, threshold: int = 112) -> Column:
    """NoPuncFilter (rule_based_filter.py:652-674): max words in any
    punctuation-split sentence <= threshold (keeps short punct-less text)."""
    sentences = F.split(c(col), r"[\.\!\?\;\:\,\n]")
    max_words = F.array_max(
        F.transform(
            sentences,
            lambda s: F.size(F.filter(F.split(s, r"\s+"), lambda w: w != "")),
        )
    )
    return F.coalesce(max_words <= threshold, F.lit(True))


_SPECIAL_CHAR_RES = [
    "[�□]",            # replacement char / white square garbage
    "[‎‏‪-‮]",  # directional control chars
    "&#\\d{2,6};",                # numeric entities like &#247;
    "[\U0001F300-\U0001FAFF\U00002600-\U000027BF]",  # emoji/symbol blocks
]


def keep_special_character(col) -> Column:
    """SpecialCharacterFilter (rule_based_filter.py:733-738): none of the 4
    garbage/emoji patterns match."""
    cond = F.lit(True)
    for pat in _SPECIAL_CHAR_RES:
        cond = cond & ~c(col).rlike(pat)
    return cond


def keep_watermark(col, watermarks: tuple[str, ...] = ("Copyright", "Watermark", "Confidential")) -> Column:
    """WatermarkFilter (rule_based_filter.py:808-812): no watermark word."""
    cond = F.lit(True)
    for w in watermarks:
        cond = cond & ~F.contains(c(col), F.lit(w))
    return cond


def keep_mean_word_length(col, min_len: float = 3.0, max_len: float = 10.0) -> Column:
    """MeanWordLengthFilter (rule_based_filter.py:867-886):
    min <= round(non-ws chars / words, 2) < max."""
    m = F.round(ratio(char_count_no_ws(col), word_count(col)), 2)
    return m.isNotNull() & (m >= min_len) & (m < max_len)


# Standard English stopword list (public NLTK english corpus; same list the
# reference loads at rule_based_filter.py:930-935).
STOPWORDS_EN = (
    "i me my myself we our ours ourselves you you're you've you'll you'd your "
    "yours yourself yourselves he him his himself she she's her hers herself "
    "it it's its itself they them their theirs themselves what which who whom "
    "this that that'll these those am is are was were be been being have has "
    "had having do does did doing a an the and but if or because as until "
    "while of at by for with about against between into through during before "
    "after above below to from up down in out on off over under again further "
    "then once here there when where why how all any both each few more most "
    "other some such no nor not only own same so than too very s t can will "
    "just don don't should should've now d ll m o re ve y ain aren aren't "
    "couldn couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven "
    "haven't isn isn't ma mightn mightn't mustn mustn't needn needn't shan "
    "shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn "
    "wouldn't"
).split()


def stopword_stats(col):
    """(stopword count, word count) over lowercased whitespace words."""
    ws = lower_words(col)
    sw = F.size(
        F.filter(ws, lambda w: F.array_contains(F.lit(STOPWORDS_EN), w))
    )
    return sw, F.size(ws)


def keep_stop_word(col, threshold: float = 0.06) -> Column:
    """StopWordFilter (rule_based_filter.py:962-985): stopword ratio >
    threshold AND stopword count > 2 (the >2 clause is reference-exact)."""
    sw, wc = stopword_stats(col)
    return F.coalesce((ratio(sw, wc) > threshold) & (sw > 2), F.lit(False))


def keep_curly_bracket(col, threshold: float = 0.025) -> Column:
    """CurlyBracketFilter (rule_based_filter.py:1044-1050):
    (count('{')+count('}')) / len(text) < threshold."""
    n = F.length(c(col)) - F.length(F.translate(c(col), "{}", ""))
    return F.coalesce(ratio(n, F.length(c(col))) < threshold, F.lit(False))


def keep_capital_words(col, threshold: float = 0.2) -> Column:
    """CapitalWordsFilter (rule_based_filter.py:1120-1143): ratio of all-caps
    words (word == upper(word) and contains a letter) <= threshold."""
    ws = words(col)
    caps = F.size(
        F.filter(ws, lambda w: (w == F.upper(w)) & w.rlike("[a-zA-Z]"))
    )
    return F.coalesce(ratio(caps, F.size(ws)) <= threshold, F.lit(True))


def keep_lorem_ipsum(col, threshold: float = 3e-8) -> Column:
    """LoremIpsumFilter (rule_based_filter.py:1194-1211):
    count('lorem ipsum' in lowercased text) / len <= threshold."""
    n = count_substr(F.lower(c(col)), "lorem ipsum")
    return F.coalesce(ratio(n, F.length(c(col))) <= threshold, F.lit(True))


def keep_unique_words(col, threshold: float = 0.1) -> Column:
    """UniqueWordsFilter (rule_based_filter.py:1264-1285):
    distinct(words)/len(words) > threshold."""
    ws = words(col)
    return F.coalesce(ratio(F.size(F.array_distinct(ws)), F.size(ws)) > threshold, F.lit(False))


def keep_blocklist(col, blocklist: tuple[str, ...], threshold: int = 1) -> Column:
    """BlocklistFilter (blocklist_filter.py:67-89): count of lowercased words
    that appear in the blocklist <= threshold.  The list ships broadcast as a
    literal array (at scale: F.broadcast join or a broadcast variable in a
    pandas UDF for 100k+-word lists)."""
    ws = lower_words(col)
    n = F.size(F.filter(ws, lambda w: F.array_contains(F.lit(list(blocklist)), w)))
    return n <= threshold


def keep_ngram_uniqueness(arr_col, n: int = 3, min_score: float = 0.2, max_score: float = 1.0) -> Column:
    """NgramFilter (ngram_filter.py:9-55, scorer ngram_sample_evaluator.py:47-79):
    unique-ngram ratio within [min, max]; applied over words or tokens."""
    score = ngram_unique_ratio(arr_col, n)
    return F.coalesce((score >= min_score) & (score <= max_score), F.lit(True))


# --- token-payload analogues (north-star table) ----------------------------


def keep_n_tok_range(min_tok: int = 8, max_tok: int = 100000) -> Column:
    """WordNumberFilter analogue over the tokenized corpus: n_tok in range."""
    return (F.col("n_tok") >= min_tok) & (F.col("n_tok") < max_tok)


def keep_unique_tokens(threshold: float = 0.1) -> Column:
    """UniqueWordsFilter analogue: distinct(tokens)/n_tok > threshold."""
    return F.coalesce(
        ratio(F.size(F.array_distinct(F.col("tokens"))), F.col("n_tok")) > threshold,
        F.lit(False),
    )


# ---------------------------------------------------------------------------
# Stage factories (reference operator-name registry)
# ---------------------------------------------------------------------------


def filter_stage(name: str, cond_builder, label: str | None = None, **defaults):
    """Build a Stage with reference filter semantics: add 0/1 label column,
    keep label==1 rows (survivors all carry label 1, matching e.g.
    word_number_filter.py:50-62)."""
    label = label or f"{name}_label"

    def make(input_key: str = "text", **params) -> Stage:
        merged = {**defaults, **params}
        # fail fast at compose time (config-driven specs resolve operators
        # by name — a typo'd param should not wait for executor time)
        import inspect

        inspect.signature(cond_builder).bind(input_key, **merged)

        def fn(df: DataFrame) -> DataFrame:
            cond = cond_builder(input_key, **merged)
            return df.withColumn(label, cond.cast("int")).where(F.col(label) == 1)

        return Stage(
            name=name, fn=fn, input_cols=(input_key,), output_cols=(label,),
            kind="filter", params=merged,
        )

    return make


_FILTERS = {
    "WordNumberFilter": (keep_word_number, {}),
    "CharNumberFilter": (keep_char_number, {}),
    "SentenceNumberFilter": (keep_sentence_number, {}),
    "ColonEndFilter": (keep_colon_end, {}),
    "ContentNullFilter": (keep_content_not_null, {}),
    "LineEndWithEllipsisFilter": (keep_line_end_ellipsis, {}),
    "LineStartWithBulletpointFilter": (keep_line_start_bullet, {}),
    "LineWithJavascriptFilter": (keep_line_javascript, {}),
    "SymbolWordRatioFilter": (keep_symbol_word_ratio, {}),
    "AlphaWordsFilter": (keep_alpha_words, {}),
    "HtmlEntityFilter": (keep_html_entity, {}),
    "IDCardFilter": (keep_id_card, {}),
    "NoPuncFilter": (keep_no_punc, {}),
    "SpecialCharacterFilter": (keep_special_character, {}),
    "WatermarkFilter": (keep_watermark, {}),
    "MeanWordLengthFilter": (keep_mean_word_length, {}),
    "StopWordFilter": (keep_stop_word, {}),
    "CurlyBracketFilter": (keep_curly_bracket, {}),
    "CapitalWordsFilter": (keep_capital_words, {}),
    "LoremIpsumFilter": (keep_lorem_ipsum, {}),
    "UniqueWordsFilter": (keep_unique_words, {}),
}

for _name, (_builder, _defaults) in _FILTERS.items():
    register(_name)(filter_stage(_name, _builder, **_defaults))


@register("BlocklistFilter")
def blocklist_filter(input_key: str = "text", blocklist: tuple[str, ...] = (), threshold: int = 1) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        cond = keep_blocklist(input_key, blocklist, threshold)
        return df.withColumn("blocklist_filter_label", cond.cast("int")).where(
            F.col("blocklist_filter_label") == 1
        )

    return Stage("BlocklistFilter", fn, (input_key,), ("blocklist_filter_label",), "filter")


@register("NgramFilter")
def ngram_filter(input_key: str = "text", n: int = 3, min_score: float = 0.2, max_score: float = 1.0) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        cond = keep_ngram_uniqueness(words(input_key), n, min_score, max_score)
        return df.withColumn("ngram_filter_label", cond.cast("int")).where(
            F.col("ngram_filter_label") == 1
        )

    return Stage("NgramFilter", fn, (input_key,), ("ngram_filter_label",), "filter")


@register("GeneralFilter")
def general_filter(predicates: list | None = None) -> Stage:
    """GeneralFilter (core_text/filter/general_filter.py:62-70): arbitrary
    predicate list AND-folded — the direct analogue of chained .where()."""

    def fn(df: DataFrame) -> DataFrame:
        for p in predicates or []:
            df = df.where(p if isinstance(p, Column) else F.expr(p))
        return df

    return Stage("GeneralFilter", fn, (), (), "filter")


# --- score-range filter stages wrapping evaluator scorers --------------------


@register("PerplexityFilter")
def perplexity_filter(
    min_ppl: float = 0.0,
    max_ppl: float = 1e9,
    tokens_col: str = "tokens",
    logprobs: dict | None = None,
) -> Stage:
    """PerplexityFilter (text_pt/filter/perplexity_filter.py:9-60): keep rows
    whose perplexity score falls in [min, max].  Scorer = the engine's
    unigram-LM proxy over tokens (no GPU model in sandbox); any scorer with
    the same column contract slots in (SURVEY.md §2 quality-model filters)."""
    from dataflow_spark.operators.evaluators import fit_unigram_lm, perplexity_proxy_udf

    def fn(df: DataFrame) -> DataFrame:
        lp = logprobs if logprobs is not None else fit_unigram_lm(df, tokens_col)
        scored = df.withColumn("PerplexityScore", perplexity_proxy_udf(lp)(F.col(tokens_col)))
        return scored.where(
            F.col("PerplexityScore").isNull()
            | F.col("PerplexityScore").between(min_ppl, max_ppl)
        )

    return Stage("PerplexityFilter", fn, (tokens_col,), ("PerplexityScore",), "filter")


@register("LexicalDiversityFilter")
def lexical_diversity_filter(
    min_mtld: float = 0.0,
    max_mtld: float = 1e9,
    input_key: str = "text",
) -> Stage:
    """LexicalDiversityFilter (lexical_diversity_filter.py:10-72): MTLD score
    within bounds; NaN/null PASSES (reference lines 64-65)."""
    from dataflow_spark.operators.evaluators import mtld_hdd_udf

    udf = mtld_hdd_udf()

    def fn(df: DataFrame) -> DataFrame:
        scored = df.withColumn("_ld", udf(F.col(input_key))).withColumn(
            "LexicalDiversityMTLDScore", F.col("_ld.mtld")
        ).drop("_ld")
        s = F.col("LexicalDiversityMTLDScore")
        return scored.where(s.isNull() | F.isnan(s) | s.between(min_mtld, max_mtld))

    return Stage(
        "LexicalDiversityFilter", fn, (input_key,), ("LexicalDiversityMTLDScore",), "filter"
    )


@register("LanguageFilter")
def language_filter(
    allowed_langs: tuple[str, ...] = ("en",),
    input_key: str = "text",
    source_col: str | None = None,
    allowed_sources: tuple[str, ...] = (),
) -> Stage:
    """LanguageFilter (language_filter.py:11-79): keep rows whose predicted
    language is allowed.  Two routes: the char/stopword heuristic over text
    (fasttext stand-in, same stage contract), or source-conditioned routing
    on the ``source`` column (tokens are language-opaque — north star)."""
    from dataflow_spark.operators.evaluators import langid_heuristic

    def fn(df: DataFrame) -> DataFrame:
        if source_col is not None:
            return df.where(F.col(source_col).isin(list(allowed_sources)))
        return df.withColumn("lang_pred", langid_heuristic(input_key)).where(
            F.col("lang_pred").isin(list(allowed_langs))
        )

    cols = (source_col,) if source_col else (input_key,)
    return Stage("LanguageFilter", fn, cols, (), "filter")
