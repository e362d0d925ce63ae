"""Metric operators vs a Counter-based re-statement of the reference
semantics (tag_evaluating.py / entity_evaluating.py / cluener_score.py)
on a small fixture."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ner_funtool_spark.operators import metrics as M

GOLD = [
    ["O", "B-x", "E-x", "O"],
    ["S-y", "O", "B-x", "M-x", "E-x"],
    ["O", "O", "S-y"],
]
PRED = [
    ["O", "B-x", "E-x", "S-y"],
    ["S-y", "O", "B-x", "E-x", "E-x"],
    ["B-x", "O", "O"],
]


def _reference_tag_metrics(gold, pred, remove_o=True):
    """Direct restatement of tag_evaluating.Metrics (flatten, remove
    gold-O positions pairwise, gold tagset, per-tag tp/gold/pred)."""
    g = [t for row in gold for t in row]
    p = [t for row in pred for t in row]
    if remove_o:
        keep = [i for i in range(len(g)) if g[i] != "O"]
        g = [g[i] for i in keep]
        p = [p[i] for i in keep]
    tagset = set(g)
    tp = Counter(gt for gt, pt in zip(g, p) if gt == pt)
    gn, pn = Counter(g), Counter(p)
    out = {}
    for t in tagset:
        prec = tp.get(t, 0) / pn[t] if pn[t] else 0.0
        rec = tp.get(t, 0) / gn[t]
        out[t] = (tp.get(t, 0), gn[t], pn[t], prec, rec, 2 * prec * rec / (prec + rec + 1e-10))
    return out, g, p


@pytest.fixture(scope="module")
def pairs(spark):
    df = spark.createDataFrame(
        list(zip(GOLD, PRED)), "gold_tags array<string>, pred_tags array<string>"
    )
    return M.tag_pairs(df).cache()


def test_tag_metrics_match_reference(spark, pairs):
    want, _, _ = _reference_tag_metrics(GOLD, PRED)
    got = {r["tag"]: r for r in M.tag_metrics(pairs).collect()}
    assert set(got) == set(want)
    for t, (tp, gn, pn, p, r, f1) in want.items():
        row = got[t]
        assert (row["tp"], row["gold_n"], row["pred_n"]) == (tp, gn, pn)
        assert abs(row["precision"] - p) < 1e-6
        assert abs(row["recall"] - r) < 1e-6
        assert abs(row["f1"] - f1) < 1e-6


def test_weighted_avg_matches_reference(spark, pairs):
    want, g, _ = _reference_tag_metrics(GOLD, PRED)
    total = len(g)
    wp = sum(v[3] * v[1] for v in want.values()) / total
    wr = sum(v[4] * v[1] for v in want.values()) / total
    wf = sum(v[5] * v[1] for v in want.values()) / total
    row = M.tag_metrics_weighted_avg(pairs).first()
    assert row["support"] == total
    assert abs(row["precision"] - wp) < 1e-6
    assert abs(row["recall"] - wr) < 1e-6
    assert abs(row["f1"] - wf) < 1e-6


def test_confusion_matrix_skips_unseen_gold_preds(spark, pairs):
    # 'B-x' appears as pred at a gold-O position (removed); gold tagset
    # after removal = {B-x, E-x, M-x, S-y}; pred 'E-x' at gold 'M-x'
    # position must appear; any pred tag outside the gold set must not.
    got = {(r["gold"], r["pred"]): r["n"] for r in M.confusion_matrix(pairs).collect()}
    want, g, p = _reference_tag_metrics(GOLD, PRED)
    tagset = set(g)
    expect = Counter((gt, pt) for gt, pt in zip(g, p) if pt in tagset)
    assert got == dict(expect)


def test_entity_prf_counts(spark):
    pred = spark.createDataFrame(
        [(1, 0, 2, "a", "x"), (1, 4, 5, "b", "y"), (2, 0, 1, "c", "x")],
        "sent bigint, b int, e int, text string, etype string",
    )
    gold = spark.createDataFrame(
        [(1, 0, 2, "a", "x"), (2, 0, 1, "c", "y")],
        "sent bigint, b int, e int, text string, etype string",
    )
    row = M.entity_prf(pred, gold, ["sent", "b", "e", "text", "etype"]).first()
    assert (row["n_pred"], row["n_gold"], row["n_inter"]) == (3, 2, 1)
    assert abs(row["precision"] - 1 / 3) < 1e-6
    assert abs(row["recall"] - 1 / 2) < 1e-6


def test_entity_prf_empty_intersection_is_all_zero(spark):
    pred = spark.createDataFrame([(1, "a")], "sent bigint, text string")
    gold = spark.createDataFrame([(2, "b")], "sent bigint, text string")
    row = M.entity_prf(pred, gold, ["sent", "text"]).first()
    assert (row["precision"], row["recall"], row["f1"]) == (0.0, 0.0, 0.0)


def test_label_f1_matches_reference_shape(spark):
    pred = spark.createDataFrame(
        [(1, "org", "acme"), (1, "org", "umbrella"), (2, "loc", "mars")],
        "line bigint, etype string, text string",
    )
    gold = spark.createDataFrame(
        [(1, "org", "acme"), (2, "loc", "venus"), (2, "per", "bob")],
        "line bigint, etype string, text string",
    )
    got = {r["label"]: r for r in M.label_f1(pred, gold, ["line"]).collect()}
    assert got["org"]["tp"] == 1 and got["org"]["fp"] == 1 and got["org"]["fn"] == 0
    assert got["loc"]["tp"] == 0 and got["loc"]["fp"] == 1 and got["loc"]["fn"] == 1
    assert got["per"]["tp"] == 0 and got["per"]["fn"] == 1


def test_tag_metrics_micro_replays_tf_metrics(spark):
    """Micro P/R/Fβ vs a literal numpy replay of the reference's
    pr_re_fbeta over the masked confusion matrix
    (public_tools/tf_metrics.py:145-215, average='micro')."""
    import numpy as np

    tags = ["O", "op", "obj"]
    idx = {t: i for i, t in enumerate(tags)}
    rows = [
        ("O", "O"), ("O", "op"), ("O", "obj"),       # O-gold FPs count!
        ("op", "op"), ("op", "op"), ("op", "obj"), ("op", "O"),
        ("obj", "obj"), ("obj", "op"),
    ]
    df = spark.createDataFrame(rows, "gold string, pred string")

    cm = np.zeros((3, 3))
    for g, p in rows:
        cm[idx[g], idx[p]] += 1
    pos = [idx["op"], idx["obj"]]
    tp = sum(cm[i, i] for i in pos)
    tot_pred = cm[:, pos].sum()
    tot_gold = cm[pos, :].sum()
    p = tp / tot_pred
    r = tp / tot_gold

    got = {row["beta"]: row for row in M.tag_metrics_micro(df).collect()}
    assert set(got) == {0.5, 1.0, 2.0}
    for beta, row in got.items():
        assert (row["tp"], row["gold_n"], row["pred_n"]) == (
            int(tp), int(tot_gold), int(tot_pred))
        assert abs(row["precision"] - round(p, 6)) < 1e-9
        assert abs(row["recall"] - round(r, 6)) < 1e-9
        want_f = (1 + beta**2) * p * r / (beta**2 * p + r)
        assert abs(row["fbeta"] - round(want_f, 6)) < 1e-9


def test_tag_metrics_micro_zero_guards(spark):
    """safe_div parity: empty positive sets yield 0.0, not NULL/error."""
    df = spark.createDataFrame([("O", "O")], "gold string, pred string")
    for row in M.tag_metrics_micro(df).collect():
        assert (row["precision"], row["recall"], row["fbeta"]) == (0.0, 0.0, 0.0)
        assert (row["tp"], row["gold_n"], row["pred_n"]) == (0, 0, 0)
