"""Pure-Python oracle: reference filter/refiner semantics reimplemented
row-at-a-time exactly as the reference does (citations in SURVEY.md §2.1).
Deliberately independent from the Spark expressions under test.
"""

from __future__ import annotations

import re
import string

from dataflow_spark.operators.filters import STOPWORDS_EN, _BULLETS, _HTML_ENTITIES

STOPSET = set(STOPWORDS_EN)


def _lines(text: str) -> list[str]:
    return [l for l in text.split("\n") if l.strip() != ""]


def keep_word_number(t, lo=20, hi=100000):
    return lo <= len(t.split()) < hi


def keep_char_number(t, thr=100):
    return len(re.sub(r"\s", "", t)) >= thr


def keep_sentence_number(t, lo=3, hi=7500):
    n = len(re.findall(r"\b[^.!?\n]+[.!?]*", t))
    return lo <= n <= hi


def keep_colon_end(t):
    return not t.endswith(":")


def keep_content_not_null(t):
    return t is not None and t.strip() != ""


def keep_line_end_ellipsis(t, thr=0.3):
    ls = _lines(t)
    if not ls:
        return True
    n = sum(1 for l in ls if l.rstrip().endswith("...") or l.rstrip().endswith("…"))
    return n / len(ls) < thr


def keep_line_start_bullet(t, thr=0.9):
    ls = _lines(t)
    if not ls:
        return True
    n = sum(1 for l in ls if l.lstrip()[:1] in _BULLETS)
    return n / len(ls) <= thr


def keep_line_javascript(t, thr=3):
    ls = _lines(t)
    non_js = sum(1 for l in ls if "javascript" not in l.lower())
    return len(ls) <= 3 or non_js >= thr


def keep_symbol_word_ratio(t, thr=0.4):
    sym = t.count("#") + t.count("...") + t.count("…")
    wc = len(re.findall(r"\w+|[^\w\s]+", t))
    if wc == 0:
        return True
    return sym / wc < thr


def keep_alpha_words(t, thr=0.6):
    ws = t.split()
    if not ws:
        return False
    alpha = sum(1 for w in ws if re.search("[a-zA-Z]", w))
    return alpha / len(ws) > thr


def keep_html_entity(t):
    pat = "(&|＆)(" + "|".join(_HTML_ENTITIES) + ")(;|；)?"
    return re.search(pat, t) is None


def keep_id_card(t, thr=3):
    pat = r"(身份证|\bid\s*number\b|\bidentification\b|\bidentity\s*card\b|\bid\s*card\b|\bpassport\s*number\b)"
    return len(re.findall(pat, t, flags=re.IGNORECASE)) < thr


def keep_no_punc(t, thr=112):
    sentences = re.split(r"[\.\!\?\;\:\,\n]", t)
    mx = max((len([w for w in s.split() if w]) for s in sentences), default=0)
    return mx <= thr


def keep_special_character(t):
    pats = [
        "[�□]",
        "[‎‏‪-‮]",
        r"&#\d{2,6};",
        "[\U0001F300-\U0001FAFF\U00002600-\U000027BF]",
    ]
    return not any(re.search(p, t) for p in pats)


def keep_watermark(t, marks=("Copyright", "Watermark", "Confidential")):
    return not any(m in t for m in marks)


def keep_mean_word_length(t, lo=3.0, hi=10.0):
    ws = t.split()
    if not ws:
        return False
    m = round(len(re.sub(r"\s", "", t)) / len(ws), 2)
    return lo <= m < hi


def keep_stop_word(t, thr=0.06):
    ws = t.lower().split()
    if not ws:
        return False
    sw = sum(1 for w in ws if w in STOPSET)
    return (sw / len(ws) > thr) and sw > 2


def keep_curly_bracket(t, thr=0.025):
    if len(t) == 0:
        return False
    return (t.count("{") + t.count("}")) / len(t) < thr


def keep_capital_words(t, thr=0.2):
    ws = t.split()
    if not ws:
        return True
    caps = sum(1 for w in ws if w == w.upper() and re.search("[a-zA-Z]", w))
    return caps / len(ws) <= thr


def keep_lorem_ipsum(t, thr=3e-8):
    if len(t) == 0:
        return True
    return t.lower().count("lorem ipsum") / len(t) <= thr


def keep_unique_words(t, thr=0.1):
    ws = t.split()
    if not ws:
        return False
    return len(set(ws)) / len(ws) > thr


def keep_blocklist(t, blocklist, thr=1):
    ws = t.lower().split()
    return sum(1 for w in ws if w in set(blocklist)) <= thr


def ngram_unique_ratio(arr, n=3):
    if len(arr) < n:
        return None
    grams = ["".join(str(x) for x in arr[i : i + n]) for i in range(len(arr) - n + 1)]
    return len(set(grams)) / len(grams)


# --- refiners ---------------------------------------------------------------


def remove_extra_spaces(t):
    return " ".join(t.split())


def lowercase(t):
    return t.lower()


def remove_punctuation(t):
    return t.translate(str.maketrans("", "", string.punctuation))


def remove_number(t):
    return re.sub("[0-9]", "", t)


def remove_html_url(t):
    return re.sub(r"<[^>]*>", "", re.sub(r"https?://\S+", "", t))


def remove_repetitions_punctuation(t):
    return re.sub(r"([^\w\s_])\1+", r"\1", t)


def remove_reference(t):
    return re.sub(r"\[\d{1,3}\]", "", t)


def text_normalization(t):
    t = re.sub(r"\b(\d{1,2})/(\d{1,2})/(\d{4})\b", r"\3-\1-\2", t)
    return re.sub(r"\$(\d+(?:\.\d+)?)", r"\1 USD", t)


def remove_stopwords(t):
    return " ".join(w for w in t.split() if w.lower() not in STOPSET)
