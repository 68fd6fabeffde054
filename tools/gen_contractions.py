"""Generate dataflow_spark/operators/_contraction_data.py.

Composes the full English contraction dictionary matching the public
`contractions` package's kv data (the lib the reference's
remove_contractions_refiner.py imports; not installed in this sandbox, so
the data is reconstructed here from its documented systematic structure:
pronoun/wh-word enclitics, modal negations, modal perfects, and an
irregulars table).  Run: python tools/gen_contractions.py
"""

from __future__ import annotations

import io
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dataflow_spark", "operators", "_contraction_data.py",
)


def build() -> dict[str, str]:
    d: dict[str, str] = {}

    # --- systematic enclitics: subject + 'd / 'd've / 'll / 'll've / 're /
    # 've / 's groups, per the contractions package's slang-free kv set.
    would = ["i", "you", "he", "she", "it", "we", "they", "that", "there", "who"]
    for s in would:
        d[s + "'d"] = s + " would"
        d[s + "'d've"] = s + " would have"
    for s in ["i", "you", "he", "she", "it", "we", "they", "that", "there", "who",
              "what", "when", "where", "why", "how"]:
        d[s + "'ll"] = s + " will"
    for s in ["i", "you", "he", "she", "it", "we", "they", "who"]:
        d[s + "'ll've"] = s + " will have"
    for s in ["you", "we", "they", "what", "who", "that", "there", "these",
              "those", "how", "where", "why"]:
        d[s + "'re"] = s + " are"
    for s in ["i", "you", "we", "they", "what", "who", "should", "could",
              "would", "might", "must", "may", "will", "so", "to", "he",
              "when", "where", "why"]:
        d[s + "'ve"] = s + " have"
    for s in ["he", "she", "it", "that", "there", "here", "what", "when",
              "where", "who", "why", "how", "so", "this", "which",
              "everyone", "everybody", "someone", "somebody", "something",
              "anyone", "anybody", "nobody"]:
        d[s + "'s"] = s + " is"

    # --- modal/auxiliary negations
    for b, e in [
        ("are", "are not"), ("can", "cannot"), ("could", "could not"),
        ("dare", "dare not"), ("did", "did not"), ("does", "does not"),
        ("do", "do not"), ("had", "had not"), ("has", "has not"),
        ("have", "have not"), ("is", "is not"), ("may", "may not"),
        ("might", "might not"), ("must", "must not"), ("need", "need not"),
        ("ought", "ought not"), ("shall", "shall not"), ("should", "should not"),
        ("was", "was not"), ("were", "were not"), ("will", "will not"),
        ("would", "would not"),
    ]:
        key = {"can": "can't", "shall": "shan't", "will": "won't"}.get(
            b, b + "n't")
        d[key] = e
    for b, e in [
        ("can't", "cannot have"), ("couldn't", "could not have"),
        ("hadn't", "had not have"), ("mightn't", "might not have"),
        ("mustn't", "must not have"), ("needn't", "need not have"),
        ("oughtn't", "ought not have"), ("shan't", "shall not have"),
        ("shouldn't", "should not have"), ("won't", "will not have"),
        ("wouldn't", "would not have"),
    ]:
        d[b + "'ve"] = e

    # --- modal perfects
    for m in ["could", "might", "must", "should", "would", "may", "will"]:
        d[m + "'ve"] = m + " have"

    # --- irregulars / lexicalized forms
    d.update({
        "i'm": "i am",
        "i'm'a": "i am about to",
        "i'm'o": "i am going to",
        "ain't": "are not",
        "amn't": "am not",
        "aren't": "are not",
        "'cause": "because",
        "cain't": "cannot",
        "daren't": "dare not",
        "daresn't": "dare not",
        "dasn't": "dare not",
        "e'er": "ever",
        "everyone's": "everyone is",
        "gimme": "give me",
        "gonna": "going to",
        "gon't": "go not",
        "gotta": "got to",
        "hafta": "have to",
        "he've": "he have",
        "how'd": "how did",
        "how'd'y": "how do you",
        "howdy": "how do you do",
        "isn't": "is not",
        "'tis": "it is",
        "'twas": "it was",
        "kinda": "kind of",
        "let's": "let us",
        "ma'am": "madam",
        "ne'er": "never",
        "o'clock": "of the clock",
        "o'er": "over",
        "ol'": "old",
        "oughtn't": "ought not",
        "sha'n't": "shall not",
        "shalln't": "shall not",
        "so's": "so as",
        "'em": "them",
        "to've": "to have",
        "wanna": "want to",
        "wasn't": "was not",
        "weren't": "were not",
        "whatcha": "what are you",
        "what'd": "what did",
        "when'd": "when did",
        "where'd": "where did",
        "why'd": "why did",
        "y'all": "you all",
        "y'all're": "you all are",
        "y'all've": "you all have",
        "y'all'd": "you all would",
        "y'all'd've": "you all would have",
        "noun's": "noun is",
    })
    del d["noun's"]
    return d


def main() -> None:
    d = build()
    buf = io.StringIO()
    buf.write('"""Contraction expansion dictionary — generated by '
              "tools/gen_contractions.py\n(public `contractions` package kv "
              'data, reconstructed; DATA, not code).\n"""\n\n')
    buf.write("CONTRACTIONS = {\n")
    for k in sorted(d, key=lambda s: (-len(s), s)):
        buf.write("    {!r}: {!r},\n".format(k, d[k]))
    buf.write("}\n")
    with open(OUT, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {OUT}: {len(d)} entries")


if __name__ == "__main__":
    main()
