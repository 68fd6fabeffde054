"""Tests for the round-3 domain close-outs: agentic_rag QA-F1, the pdf2vqa
CPU family, and chemistry SMILES block scoring.

Oracles are independent of the engine code paths: the QA-F1 oracle is a
straight Counter-based transcription of the reference evaluator; the SMILES
equivalence oracle is a brute-force graph-isomorphism search over the parsed
molecular graphs; pdf2vqa expectations are hand-computed fixtures exercising
each reference quirk."""

from __future__ import annotations

import itertools
import random
import re
import string
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataflow_spark.core.stage import get_operator
from dataflow_spark.operators import _smiles, chem, pdf2vqa as pv, rag


# ---------------------------------------------------------------------------
# reference-faithful QA-F1 (agenticrag_qaf1_sample_evaluator.py:56-105)
# ---------------------------------------------------------------------------


def _ref_normalize(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def _ref_f1(prediction, ground_truths) -> float:
    if prediction is None or ground_truths is None:
        return 0.0
    if isinstance(ground_truths, str):
        ground_truths = [ground_truths]
    best = 0.0
    for gt in ground_truths:
        if gt is None:
            continue
        np_, ng = _ref_normalize(prediction), _ref_normalize(gt)
        if np_ in ("yes", "no", "noanswer") or ng in ("yes", "no", "noanswer"):
            if np_ != ng:
                continue
        pt, gtoks = np_.split(), ng.split()
        common = Counter(pt) & Counter(gtoks)
        ns = sum(common.values())
        if ns == 0:
            continue
        p, r = ns / len(pt), ns / len(gtoks)
        best = max(best, 2 * p * r / (p + r))
    return best


_WORDS = "the a an cat dog sat mat on in yes no noanswer running quick. brown,".split()


def test_qa_f1_matches_reference(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(120):
        pred = " ".join(rng.choices(_WORDS, k=rng.randint(0, 8))) or rng.choice(
            ["", "Yes.", "NO", "NoAnswer", "?!?"]
        )
        gts = [
            " ".join(rng.choices(_WORDS, k=rng.randint(0, 6)))
            for _ in range(rng.randint(1, 3))
        ]
        if rng.random() < 0.2:
            gts.append(None)
        rows.append((pred, gts))
    rows += [(None, ["x"]), ("words", None), ("", [""]), ("a the an", ["a an the"])]
    df = spark.createDataFrame(rows, "prediction string, gts array<string>")
    got = df.select("prediction", "gts", rag.qa_f1("prediction", "gts").alias("f1")).collect()
    for row in got:
        assert row.f1 == pytest.approx(_ref_f1(row.prediction, row.gts), abs=1e-12), row


def test_qa_f1_stage_scalar_and_array(spark):
    df = spark.createDataFrame(
        [("the answer", "answer!")], "refined_answer string, golden_doc_answer string"
    )
    out = get_operator("AgenticRAGQAF1SampleEvaluator")(df).collect()[0]
    assert out.F1Score == pytest.approx(1.0)
    df2 = spark.createDataFrame(
        [("x y", ["y", "z"])], "refined_answer string, golden_doc_answer array<string>"
    )
    out2 = get_operator("AgenticRAGQAF1SampleEvaluator")(df2).collect()[0]
    assert out2.F1Score == pytest.approx(2 * 0.5 * 1.0 / 1.5)


# ---------------------------------------------------------------------------
# pdf2vqa
# ---------------------------------------------------------------------------

_LAYOUT_SCHEMA = (
    "doc string, seq int, type string, sub_type string, text string, "
    "table_body string, img_path string, image_caption array<string>, "
    "list_items array<string>"
)


def _layout_df(spark):
    return spark.createDataFrame(
        [
            ("d1", 0, "text", None, "hello", None, None, None, None),
            ("d1", 1, "list", "text", None, None, None, None, ["item a", "item b"]),
            ("d1", 2, "list", "figure", None, None, None, None, ["dropped"]),
            ("d1", 3, "image", None, None, None, "imgs/pic1.png", ["cap1", "cap2"], None),
            ("d1", 4, "table", None, None, "<tr>t</tr>", None, None, None),
            ("d2", 0, "list", "text", None, None, None, None, ["only"]),
        ],
        _LAYOUT_SCHEMA,
    )


def test_flatten_layout_reindexes(spark):
    flat = pv.flatten_layout(_layout_df(spark)).orderBy("doc", "id").collect()
    d1 = [r for r in flat if r.doc == "d1"]
    assert [r.id for r in d1] == [0, 1, 2, 3, 4]  # figure-list dropped, no gap
    assert (d1[0].text, d1[1].text, d1[2].text) == ("hello", "item a", "item b")
    assert d1[3].img_path == "imgs/pic1.png" and d1[3].image_caption == ["cap1", "cap2"]
    assert d1[4].table_body == "<tr>t</tr>"
    d2 = [r for r in flat if r.doc == "d2"]
    assert len(d2) == 1 and d2[0].id == 0 and d2[0].text == "only"


def test_parse_vqa_responses(spark):
    resp = spark.createDataFrame(
        [
            (
                "d1",
                "<chapter><title>0</title>"
                "<qa_pair><question>1, 2</question><answer> 42 </answer><label>3</label></qa_pair>"
                "<qa_pair><question>4</question><solution>3</solution><label>7</label></qa_pair>"
                "<qa_pair><answer>no label → skipped</answer></qa_pair>"
                "<qa_pair><question>99,abc,2</question><label>x</label></qa_pair>"
                "</chapter>"
                "<chapter><qa_pair><question>0</question><label>1</label></qa_pair></chapter>",
            ),
            ("d2", "no tags at all"),
        ],
        "doc string, response string",
    )
    rows = (
        pv.parse_vqa_responses(resp, pv.flatten_layout(_layout_df(spark)))
        .orderBy("doc", "seq")
        .collect()
    )
    d1 = [r for r in rows if r.doc == "d1"]
    assert len(d1) == 4 and not [r for r in rows if r.doc == "d2"]
    assert d1[0].chapter_title == "hello"
    assert d1[0].question == "item a\nitem b" and d1[0].answer == "42"
    assert d1[1].question == "<tr>t</tr>"  # table_body branch (id 4)
    # image branch (id 3): caption list joined with ' ' + prefix
    assert d1[1].solution == "![cap1 cap2](vqa_images/pic1.png)"
    # out-of-range/non-int ids skipped
    assert d1[2].question == "item b"
    assert d1[2].label == "x"
    # titleless chapter → empty chapter_title
    assert d1[3].chapter_title == "" and d1[3].question == "hello"


def test_id_to_text_missing_caption_quirk():
    # reference joins the DEFAULT STRING's characters when image_caption is
    # absent (' '.join('image')) — reproduced faithfully
    items = [{"type": "image", "text": None, "table_body": None,
              "img_path": "a/b.png", "image_caption": None}]
    assert pv._id_to_text("0", items, "pfx") == "![i m a g e](pfx/b.png)"


def _merge_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc string, seq int, chapter_title string, label string, "
        "question string, answer string, solution string",
    )


def test_merge_carry_forward_and_dynamic_update(spark):
    df = _merge_rows(
        spark,
        [
            # chapter 1: q1 incomplete, q2 complete (passthrough)
            ("d", 0, "Chapter 1", "1", "Q1?", "", ""),
            ("d", 1, "", "2", "Q2?", "inline", ""),  # blank title inherits ch1
            # title changes but label RISES → mis-extracted subtitle, keep ch1
            ("d", 2, "Chapter 1 subtitle", "3", "Q3?", "", ""),
            # non-numeric label → dropped; label 0 → dropped
            ("d", 3, "Chapter 1", "none", "Qbad?", "", ""),
            ("d", 4, "Chapter 1", "0", "Qzero?", "", ""),
            # answers section (question == '')
            ("d", 5, "Chapter 1", "1", "", "ans1", ""),
            ("d", 6, "Chapter 1", "3", "", "ans3", ""),
            ("d", 7, "Chapter 1", "3", "", "clobber", "sol3"),  # dup label: only fills solution
        ],
    )
    out = pv.merge_qa_pairs(df).orderBy("out_seq").collect()
    assert [r.question for r in out] == ["Q2?", "Q1?", "Q3?"]
    by_label = {r.label: r for r in out}
    assert by_label[2].answer == "inline"
    assert by_label[1].answer == "ans1"
    # dynamic update: first answer kept, later row only contributed solution
    assert by_label[3].answer == "ans3" and by_label[3].solution == "sol3"
    # refined titles: 'Chapter 1' → '1'
    assert by_label[1].question_chapter_title == "1"


def test_merge_chapter_reset_and_doc_independence(spark):
    rows = []
    for doc in ("a", "b"):
        rows += [
            (doc, 0, "Ch 1", "1", f"{doc}-q1", "", ""),
            (doc, 1, "Ch 1", "2", f"{doc}-q2", "", ""),
            # new chapter: label drops (2 → 1) → chapter switches
            (doc, 2, "Ch 2", "1", f"{doc}-q3", "", ""),
            (doc, 3, "Ch 1", "1", "", f"{doc}-a1", ""),
            (doc, 4, "Ch 1", "2", "", f"{doc}-a2", ""),
            (doc, 5, "Ch 2", "1", "", f"{doc}-a3", ""),
        ]
    out = pv.merge_qa_pairs(_merge_rows(spark, rows)).collect()
    got = {(r.doc, r.question_chapter_title, r.label): r.answer for r in out}
    assert got == {
        ("a", "1", 1): "a-a1", ("a", "1", 2): "a-a2", ("a", "2", 1): "a-a3",
        ("b", "1", 1): "b-a1", ("b", "1", 2): "b-a2", ("b", "2", 1): "b-a3",
    }


def test_fix_image_paths_and_markdown(spark):
    df = spark.createDataFrame(
        [("m1", "see ![fig](img/a.png) and ![x](b.png)")], "name string, q string"
    )
    got = df.select(pv.fix_image_paths("q", "name").alias("q")).collect()[0].q
    assert got == "see ![fig](m1/img/a.png) and ![x](m1/b.png)"

    merged = _merge_rows(
        spark,
        [
            ("d", 0, "Ch 1", "1", "Q1", "A1", "S1"),
            ("d", 1, "Ch 1", "2", "Q2", "A2", ""),
        ],
    )
    md = pv.merged_markdown(pv.merge_qa_pairs(merged)).collect()[0].markdown
    assert md == (
        "### Question 1\n\nQ1\n\n**Answer:** A1\n\n**Solution:**\n\nS1\n\n"
        "### Question 2\n\nQ2\n\n**Answer:** A2\n\n"
    )


def test_vqa_format_rules(spark):
    df = spark.createDataFrame(
        [
            ("q ![i](a/b.png) text", "ans", "sol ![j](c/d.png)\n\n\n\nbody"),
            ("", "a", "s"),        # empty question → skipped
            ("q2", "", ""),        # empty assistant → skipped
            ("q3", "", "only solution"),
        ],
        "question string, answer string, solution string",
    )
    rows = pv.vqa_format(df).collect()
    assert len(rows) == 2
    r0 = rows[0]
    assert r0.images == ["a/b.png", "c/d.png"]
    assert r0.user_content == "<image><image>q  text"
    assert r0.assistant_content == "ans\n\nsol \n\nbody"
    assert rows[1].assistant_content == "only solution"
    sg = pv.sharegpt_json(pv.vqa_format(df)).collect()[0]
    assert [m.role for m in sg.messages] == ["user", "assistant"]
    assert '"messages"' in sg.json and '"images"' in sg.json


def test_vqa_format_image_base(spark):
    df = spark.createDataFrame([("![i](x.png) q", "a", "")], "question string, answer string, solution string")
    r = pv.vqa_format(df, image_base=F.lit("/base")).collect()[0]
    assert r.images == ["/base/x.png"]


def test_merge_pdfs_gated(tmp_path):
    with pytest.raises(NotImplementedError, match="pypdf"):
        pv.merge_pdfs([str(tmp_path / "a.pdf")], str(tmp_path / "out.pdf"))


def test_plan_merged_pdf_paths(spark):
    df = spark.createDataFrame([("m1",)], "name string")
    r = pv.plan_merged_pdf_paths(df, "/out").collect()[0]
    assert r.merged_pdf_path == "/out/m1/m1_merged.pdf"


# ---------------------------------------------------------------------------
# SMILES canonicalizer
# ---------------------------------------------------------------------------

_EQ_PAIRS = [
    ("CCO", "OCC"), ("CCO", "C(O)C"), ("CC(C)(N)O", "CC(O)(N)C"),
    ("CC(C)(N)O", "CC(N)(C)O"), ("C1CCCCC1", "C2CCCCC2"),
    ("Cc1ccccc1", "c1ccccc1C"), ("Cc1ccccc1", "c1ccc(C)cc1"),
    ("N#Cc1ccccc1", "c1ccccc1C#N"), ("[NH4+].[Cl-]", "[Cl-].[NH4+]"),
    ("C/C=C/C", "CC=CC"), ("OC(=O)c1ccccc1", "c1ccccc1C(O)=O"),
    ("C1CC2CCC1CC2", "C2CC1CCC2CC1"), ("CC(=O)OC", "COC(C)=O"),
    ("[13CH4]", "[13CH4]"), ("ClCCBr", "BrCCCl"),
]
_NE_PAIRS = [
    ("CCO", "CCN"), ("C1CC1", "CCC"), ("CC(=O)O", "CCO"),
    ("c1ccccc1", "C1=CC=CC=C1"),  # no kekulization (documented)
    ("CC(C)C", "CCCC"), ("[13CH4]", "C"), ("[NH4+]", "N"),
    ("CC=CC", "CCC=C"), ("ClCCBr", "ClCCCl"),
]


def test_smiles_equivalence_table():
    for a, b in _EQ_PAIRS:
        assert _smiles.equivalent(a, b), (a, b)
    for a, b in _NE_PAIRS:
        assert not _smiles.equivalent(a, b), (a, b)


def test_smiles_parse_failures():
    for bad in ["", "C(", "C)", "C1CC", "[Xx!]", "C%1", "not_a_smiles", None]:
        assert not _smiles.equivalent(bad, "C")
    with pytest.raises(_smiles.SmilesError):
        _smiles.canonical("C(")


def test_smiles_random_relabel_invariance():
    """Emit each molecule under many random atom rankings — every emission
    must parse back and canonicalize to the same string (automorphism /
    traversal invariance of the canonical form)."""
    rng = random.Random(11)
    mols = [a for a, _ in _EQ_PAIRS] + [b for _, b in _EQ_PAIRS]
    for smi in mols:
        base = _smiles.canonical(smi)
        for comp in smi.split("."):
            atoms, bonds = _smiles.parse(comp)
            adj = [[] for _ in atoms]
            for (x, y), o in bonds.items():
                adj[x].append((y, o))
                adj[y].append((x, o))
            for _ in range(6):
                ranks = list(range(len(atoms)))
                rng.shuffle(ranks)
                variant = _smiles._emit(atoms, adj, ranks)
                assert _smiles.canonical(variant) == _smiles.canonical(comp), (
                    smi, comp, variant
                )
        assert _smiles.canonical(smi) == base


def _graphs_isomorphic(s1: str, s2: str) -> bool:
    """Independent oracle: brute-force labeled-graph isomorphism over the
    parsed molecular graphs (components matched as multisets)."""

    def comps(s):
        out = []
        for c in s.split("."):
            atoms, bonds = _smiles.parse(c)
            out.append((atoms, bonds))
        return out

    def label(a):
        return (a["sym"], a["arom"], a["charge"], a["h"], a["iso"])

    def iso(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        if len(a1) != len(a2) or len(b1) != len(b2):
            return False
        if sorted(map(label, a1)) != sorted(map(label, a2)):
            return False
        for perm in itertools.permutations(range(len(a1))):
            if any(label(a1[i]) != label(a2[perm[i]]) for i in range(len(a1))):
                continue
            mapped = {
                (min(perm[x], perm[y]), max(perm[x], perm[y])): o
                for (x, y), o in b1.items()
            }
            if mapped == b2:
                return True
        return False

    g1, g2 = comps(s1), comps(s2)
    if len(g1) != len(g2):
        return False
    for p in itertools.permutations(range(len(g2))):
        if all(iso(g1[i], g2[p[i]]) for i in range(len(g1))):
            return True
    return False


def test_smiles_vs_isomorphism_oracle():
    small = [p for p in _EQ_PAIRS + _NE_PAIRS if max(len(p[0]), len(p[1])) <= 12]
    assert len(small) >= 10
    for a, b in small:
        try:
            expect = _graphs_isomorphic(a, b)
        except _smiles.SmilesError:
            continue
        assert _smiles.equivalent(a, b) == expect, (a, b)


# ---------------------------------------------------------------------------
# chem block scoring
# ---------------------------------------------------------------------------


def _blocks_df(spark):
    g = chem.golden_schema()
    return spark.createDataFrame(
        [
            (
                [
                    {"abbreviation": "EtOH", "full_name": "ethanol", "smiles": "CCO"},
                    {"abbreviation": "Tol", "full_name": "toluene", "smiles": "Cc1ccccc1"},
                    {"abbreviation": "Missing", "full_name": "m", "smiles": "CC"},
                ],
                [
                    {"abbreviation": "EtOH", "full_name": "", "smiles": "stale"},
                    {"abbreviation": "EtOH", "full_name": "", "smiles": "OCC"},  # last wins
                    {"abbreviation": "Tol", "full_name": "", "smiles": "c1ccccc1"},
                    {"abbreviation": None, "full_name": "", "smiles": "CCO"},  # skipped
                    {"abbreviation": "NullSmi", "full_name": "", "smiles": None},
                ],
            ),
            ([], None),  # empty block → accuracy None
        ],
        f"golden_label {g}, synth_smiles {g}",
    )


def test_chem_block_scores_canonical(spark):
    rows = chem.smiles_block_scores(_blocks_df(spark), mode="canonical").collect()
    r0 = rows[0]
    scores = {f["abbreviation"]: f["score"] for f in r0.final_result}
    assert scores == {"EtOH": 1, "Tol": 0, "Missing": 0}
    assert (r0.block_score, r0.block_total) == (1, 3)
    assert r0.block_accuracy == pytest.approx(1 / 3)
    assert rows[1].block_total == 0 and rows[1].block_accuracy is None
    summary = chem.overall_summary(
        chem.smiles_block_scores(_blocks_df(spark), mode="canonical")
    ).collect()[0]
    assert (summary.overall_score, summary.overall_total) == (1, 3)


def test_chem_block_scores_exact_and_stage(spark):
    rows = chem.smiles_block_scores(_blocks_df(spark), mode="exact").collect()
    scores = {f["abbreviation"]: f["score"] for f in rows[0].final_result}
    assert scores == {"EtOH": 0, "Tol": 0, "Missing": 0}  # OCC != CCO textually
    st = get_operator("SmilesEquivalenceDatasetEvaluator", mode="canonical")
    out = st(_blocks_df(spark)).collect()[0]
    assert out.block_score == 1
    with pytest.raises(ValueError):
        chem.smiles_block_scores(_blocks_df(spark), mode="bogus")
