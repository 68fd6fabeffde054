"""Deterministic test fixtures (FIXTURES.md F1/F2/F3 shapes).

Everything seeded — no external data.  The adversarial F2 rows are crafted so
each rule-based filter has both passing and failing examples.
"""

from __future__ import annotations

import random

BASE_PROSE = (
    "The quick brown fox jumps over the lazy dog while the sun sets behind "
    "the quiet hills and the river keeps moving toward the distant sea. "
    "People in the village gather for the evening meal and they talk about "
    "the harvest, the weather, and the long road that leads to the city."
)

ADVERSARIAL_TEXTS = [
    BASE_PROSE,  # clean prose — should pass everything
    "Short text.",  # trips word/char minimums
    "A list of items:",  # colon end
    "",  # null-ish / blank
    "   ",  # blank after trim
    "First line ends here...\nSecond one too...\nAnd another...\nyes...",  # ellipsis lines
    "• item one\n• item two\n• item three\n• item four",  # bullet lines
    "enable javascript to view\nplease enable javascript now\njavascript required here\njavascript needed",  # js lines
    "# # # # # ... ... … … tags # everywhere # # ...",  # symbol ratio
    "12345 67890 !!! ??? 98765 43210 00000 11111 22222 33333",  # alpha words
    "this text has &nbsp; entities &amp; more &lt;stuff&gt;",  # html entities
    "id number please provide your id card and identity card and passport number for id number checks",  # id card
    "word " * 150,  # no-punc wall: 150 words no punctuation, also unique-words fail
    "broken � char and □ boxes here in text",  # special chars
    "Copyright 2024 Some Corp. All rights reserved content follows here.",  # watermark
    "aaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbb cccccccccccccccccccccccc",  # mean word length high
    "xyzzy plugh quux grault garply waldo fred thud corge flarp",  # no stopwords
    "{ } { } { } code block { } with { } many { } braces { }",  # curly brackets
    "THIS TEXT IS MOSTLY CAPS WORDS SHOUTING VERY LOUD all the time",  # capital words
    "lorem ipsum dolor sit amet " * 3,  # lorem ipsum
    "the the the the the the the the the the the the",  # unique words fail
    "The meeting on 12/25/2023 cost $500 and the follow-up on 1/5/2024 cost $250.",  # normalization
    "Visit https://example.com/page for <b>bold</b> claims and <i>italic</i> text today.",  # urls/tags
    "Wow!!! Amazing!!!! Really???? Yes..... Sure!!!!!",  # repeated punct
    "café naïve résumé ☕ 😀 🚀 emoji text here with words",  # emoji
    "  spaced   out    text   with   runs    of    whitespace  ",  # extra spaces
    "Une phrase en français avec des mots différents et variés pour tester.",  # non-english
    "这是一段中文文本用来测试语言识别功能的正确性和稳定性。",  # chinese
]


def make_docs(n: int = 200, seed: int = 42, dup_frac: float = 0.1):
    """(doc_id, doc_seq, text, source) rows: adversarial head + seeded prose
    tail with planted exact duplicates (first occurrence earlier in seq)."""
    rng = random.Random(seed)
    vocab = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa river "
        "mountain valley ocean forest meadow stone cloud thunder rain the a "
        "and of to in is was for with that it on at by this be are or as"
    ).split()
    rows = []
    for i, t in enumerate(ADVERSARIAL_TEXTS):
        rows.append((f"doc-{i:06d}", i, t, "adv"))
    i = len(rows)
    originals = []
    while len(rows) < n:
        if originals and rng.random() < dup_frac:
            text = rng.choice(originals)
        else:
            length = rng.randint(25, 120)
            text = " ".join(rng.choice(vocab) for _ in range(length)) + "."
            originals.append(text)
        rows.append((f"doc-{i:06d}", i, text, rng.choice(["cc", "wiki", "code"])))
        i += 1
    return rows


def make_token_docs(n: int = 300, seed: int = 7, vocab: int = 500,
                    dup_frac: float = 0.08, near_frac: float = 0.08):
    """F1-shaped token rows (doc_id, doc_seq, tokens, n_tok, source) with
    planted exact dups and near-dups (≤10% token edits)."""
    rng = random.Random(seed)
    rows = []
    originals = []
    for i in range(n):
        r = rng.random()
        if originals and r < dup_frac:
            toks = list(rng.choice(originals))
        elif originals and r < dup_frac + near_frac:
            toks = list(rng.choice(originals))
            n_edit = max(1, int(len(toks) * 0.05))
            for _ in range(n_edit):
                toks[rng.randrange(len(toks))] = rng.randrange(vocab)
        else:
            length = rng.randint(20, 200)
            toks = [rng.randrange(vocab) for _ in range(length)]
            originals.append(tuple(toks))
        src = "cc" if rng.random() < 0.7 else rng.choice(["wiki", "code", "books"])
        rows.append((f"tok-{i:06d}", i, toks, len(toks), src))
    return rows
