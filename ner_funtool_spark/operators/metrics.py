"""Metric aggregations (A3-A12) as pure DataFrame ops.

Re-expresses the reference's evaluation stack relationally:

* tag-level P/R/F1 + weighted average — public_tools/tag_evaluating.py:
  tp per tag via zip equality (:105-115), per-tag p/r/f1 (:37-62 with
  the +1e-10 f1 guard), support-weighted averages (:117-135), optional
  remove_O that drops positions whose GOLD tag is O from both sides
  (:137-152).  The tag universe is the set of *gold* tags (:23).
* confusion matrix — tag_evaluating.py:183-207 (gold-tag rows/cols;
  predictions whose tag never occurs in gold are skipped :200-201).
  Long format (gold, pred, n) — a pivot would make the schema
  data-dependent.
* entity-level set-intersection P/R/F1 — entity_evaluating.py:60-81:
  inner join on the full mention identity.
* per-label TP/FP/FN F1 (CLUE scorer) — cluener_score.py:10-49:
  inner join for TP, anti joins for FP/FN, macro average.

All aggregations decompose into groupBy/join (partial aggregation +
single shuffle each); no UDFs, no UDAFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

F1_EPS = 1e-10  # tag_evaluating.py:61


def tag_pairs(df: DataFrame, gold_col: str = "gold_tags", pred_col: str = "pred_tags",
              remove_o: bool = True) -> DataFrame:
    """Aligned tag arrays -> one (gold, pred) row per token position.

    arrays_zip is the positional-zip join (SURVEY §2.6) — no shuffle.
    """
    pairs = df.select(
        F.explode(F.arrays_zip(F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred"))).alias("z")
    ).select(F.col("z.gold").alias("gold"), F.col("z.pred").alias("pred"))
    if remove_o:
        pairs = pairs.filter(F.col("gold") != "O")
    return pairs


def tag_metrics(pairs: DataFrame) -> DataFrame:
    """(gold, pred) rows -> per-tag (tag, tp, gold_n, pred_n, precision,
    recall, f1), tag universe = gold tags."""
    gold_n = pairs.groupBy(F.col("gold").alias("tag")).agg(F.count("*").alias("gold_n"))
    pred_n = pairs.groupBy(F.col("pred").alias("tag")).agg(F.count("*").alias("pred_n"))
    tp = (
        pairs.filter(F.col("gold") == F.col("pred"))
        .groupBy(F.col("gold").alias("tag"))
        .agg(F.count("*").alias("tp"))
    )
    m = (
        gold_n.join(pred_n, "tag", "left")
        .join(tp, "tag", "left")
        .fillna(0, subset=["pred_n", "tp"])
    )
    p = F.when(F.col("pred_n") == 0, F.lit(0.0)).otherwise(F.col("tp") / F.col("pred_n"))
    r = F.col("tp") / F.col("gold_n")
    return m.select(
        "tag",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("gold_n").cast("bigint").alias("gold_n"),
        F.col("pred_n").cast("bigint").alias("pred_n"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(2 * p * r / (p + r + F.lit(F1_EPS)), 6).alias("f1"),
    )


def tag_metrics_weighted_avg(pairs: DataFrame) -> DataFrame:
    """Support-weighted avg over the gold tagset (tag_evaluating.py:117-135):
    sum(metric * gold_n) / total_gold_tokens."""
    m = tag_metrics_unrounded(pairs)
    return m.agg(
        F.round(F.sum(F.col("precision") * F.col("gold_n")) / F.sum("gold_n"), 6).alias("precision"),
        F.round(F.sum(F.col("recall") * F.col("gold_n")) / F.sum("gold_n"), 6).alias("recall"),
        F.round(F.sum(F.col("f1") * F.col("gold_n")) / F.sum("gold_n"), 6).alias("f1"),
        F.sum("gold_n").cast("bigint").alias("support"),
    )


def tag_metrics_unrounded(pairs: DataFrame) -> DataFrame:
    """Internal: per-tag metrics at full double precision (for averaging)."""
    gold_n = pairs.groupBy(F.col("gold").alias("tag")).agg(F.count("*").alias("gold_n"))
    pred_n = pairs.groupBy(F.col("pred").alias("tag")).agg(F.count("*").alias("pred_n"))
    tp = (
        pairs.filter(F.col("gold") == F.col("pred"))
        .groupBy(F.col("gold").alias("tag"))
        .agg(F.count("*").alias("tp"))
    )
    m = (
        gold_n.join(pred_n, "tag", "left")
        .join(tp, "tag", "left")
        .fillna(0, subset=["pred_n", "tp"])
    )
    p = F.when(F.col("pred_n") == 0, F.lit(0.0)).otherwise(F.col("tp") / F.col("pred_n"))
    r = F.col("tp") / F.col("gold_n")
    return m.select(
        "tag", "tp", "gold_n", "pred_n",
        p.alias("precision"), r.alias("recall"),
        (2 * p * r / (p + r + F.lit(F1_EPS))).alias("f1"),
    )


def tag_metrics_micro(pairs: DataFrame, pos_tags=None,
                      betas=(0.5, 1.0, 2.0)) -> DataFrame:
    """Micro-averaged P/R/Fβ over the positive classes — the reference's
    headline training-eval metric (public_tools/tf_metrics.py:15-134,
    default ``average='micro'``; called at run_bert_crf.py:628-630 with
    pos_indices = every label except O/[CLS]/[SEP]).

    Micro semantics from the confusion matrix (tf_metrics.py:145-165):
      tp     = Σ diag over positive classes
      pred_n = Σ columns of positive classes (ALL gold rows, incl. O)
      gold_n = Σ rows of positive classes (ALL pred cols, incl. O)
    so ``pairs`` must be built with remove_o=False — micro MASKS the
    matrix, it does not drop O-gold positions (a prediction of a
    positive tag on an O-gold token is a false positive here, which the
    remove_O path would silently discard).

    Fβ = (1+β²)·p·r / (β²·p + r), zero-guarded like tf_metrics.safe_div
    (tf_metrics.py:97-134 exports the β parameter; f1 is fbeta(β=1)).
    One row per β: (beta, tp, gold_n, pred_n, precision, recall, fbeta).
    ONE distributed aggregation; the per-β fan-out is over a 1-row frame.
    """
    if pos_tags is None:
        gold_pos = ~F.col("gold").isin("O", "[CLS]", "[SEP]")
        pred_pos = ~F.col("pred").isin("O", "[CLS]", "[SEP]")
    else:
        gold_pos = F.col("gold").isin(*[F.lit(t) for t in pos_tags])
        pred_pos = F.col("pred").isin(*[F.lit(t) for t in pos_tags])
    one = F.lit(1).cast("bigint")
    counts = pairs.agg(
        F.sum(F.when(gold_pos & (F.col("gold") == F.col("pred")), one)
              .otherwise(F.lit(0))).cast("bigint").alias("tp"),
        F.sum(F.when(gold_pos, one).otherwise(F.lit(0)))
        .cast("bigint").alias("gold_n"),
        F.sum(F.when(pred_pos, one).otherwise(F.lit(0)))
        .cast("bigint").alias("pred_n"),
    )
    p = F.when(F.col("pred_n") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / F.col("pred_n"))
    r = F.when(F.col("gold_n") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / F.col("gold_n"))
    betas_df = counts.sparkSession.createDataFrame(
        [(float(b),) for b in betas], "beta double"
    )
    b2 = F.col("beta") * F.col("beta")
    denom = b2 * p + r
    fbeta = F.when(denom == 0, F.lit(0.0)).otherwise(
        (1 + b2) * p * r / denom)
    return counts.crossJoin(F.broadcast(betas_df)).select(
        F.round("beta", 6).alias("beta"),
        "tp", "gold_n", "pred_n",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(fbeta, 6).alias("fbeta"),
    )


def tag_metrics_tf_macro(pairs: DataFrame, pos_tags=None,
                         beta: float = 1.0) -> DataFrame:
    """Macro-averaged P/R/Fβ over the positive classes
    (tf_metrics.py:168-215, ``average='macro'``): per-class metrics
    from the FULL confusion matrix (each class's pred_n counts O-gold
    rows too — unlike tag_metrics' remove_O universe), then an
    UNWEIGHTED mean over pos classes.  ``pairs`` must be built with
    remove_o=False, exactly as tag_metrics_micro.

    Class universe semantics (tf_metrics parity): with explicit
    ``pos_tags`` the mean runs over EXACTLY those classes — a positive
    class absent from the data contributes (0, 0, 0), as the
    reference's fixed pos_indices list does; with pos_tags=None the
    universe is the observed non-special tags (the label inventory is
    unknown, so absence cannot be distinguished from non-membership).
    One row: (n_classes, precision, recall, fbeta)."""
    if pos_tags is None:
        gold_pos = ~F.col("gold").isin("O", "[CLS]", "[SEP]")
        pred_pos = ~F.col("pred").isin("O", "[CLS]", "[SEP]")
        classes = pairs.filter(gold_pos) \
            .select(F.col("gold").alias("tag")) \
            .union(pairs.filter(pred_pos).select(F.col("pred").alias("tag"))) \
            .distinct()
    else:
        gold_pos = F.col("gold").isin(*[F.lit(t) for t in pos_tags])
        pred_pos = F.col("pred").isin(*[F.lit(t) for t in pos_tags])
        classes = pairs.sparkSession.createDataFrame(
            [(t,) for t in pos_tags], "tag string"
        )
    tp = (
        pairs.filter((F.col("gold") == F.col("pred")) & gold_pos)
        .groupBy(F.col("gold").alias("tag")).agg(F.count("*").alias("tp"))
    )
    pred_n = pairs.groupBy(F.col("pred").alias("tag")).agg(
        F.count("*").alias("pred_n"))
    gold_n = pairs.groupBy(F.col("gold").alias("tag")).agg(
        F.count("*").alias("gold_n"))
    m = (
        classes.join(tp, "tag", "left")
        .join(pred_n, "tag", "left")
        .join(gold_n, "tag", "left")
        .fillna(0, subset=["tp", "pred_n", "gold_n"])
    )
    p = F.when(F.col("pred_n") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / F.col("pred_n"))
    r = F.when(F.col("gold_n") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / F.col("gold_n"))
    b2 = beta * beta
    denom = F.lit(b2) * p + r
    fb = F.when(denom == 0, F.lit(0.0)).otherwise(
        (1 + b2) * p * r / denom)
    return m.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.round(F.avg(p), 6).alias("precision"),
        F.round(F.avg(r), 6).alias("recall"),
        F.round(F.avg(fb), 6).alias("fbeta"),
    )


def confusion_matrix(pairs: DataFrame) -> DataFrame:
    """(gold, pred, n) long-format confusion counts; pred tags that never
    occur as gold are skipped (tag_evaluating.py:200-201)."""
    tagset = pairs.select(F.col("gold").alias("pred")).distinct()
    return (
        pairs.join(F.broadcast(tagset), "pred", "left_semi")
        .groupBy("gold", "pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def entity_prf(pred_m: DataFrame, gold_m: DataFrame, keys: list[str]) -> DataFrame:
    """Entity-set-intersection P/R/F1 (entity_evaluating.py:60-81).

    The reference's ``[i for i in pred if i in gold]`` is an inner join
    on the full mention identity; identities here include positions so
    duplicates cannot occur.  Returns a single row
    (n_pred, n_gold, n_inter, precision, recall, f1) — all zeros if the
    intersection is empty, matching the reference's early return.
    """
    p_k = pred_m.select(*keys)
    g_k = gold_m.select(*keys)
    inter = p_k.join(g_k, keys, "inner")
    counts = (
        p_k.agg(F.count("*").alias("n_pred"))
        .crossJoin(g_k.agg(F.count("*").alias("n_gold")))
        .crossJoin(inter.agg(F.count("*").alias("n_inter")))
    )
    p = F.col("n_inter") / F.col("n_pred")
    r = F.col("n_inter") / F.col("n_gold")
    zero = F.col("n_inter") == 0
    return counts.select(
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_gold").cast("bigint").alias("n_gold"),
        F.col("n_inter").cast("bigint").alias("n_inter"),
        F.round(F.when(zero, 0.0).otherwise(p), 6).alias("precision"),
        F.round(F.when(zero, 0.0).otherwise(r), 6).alias("recall"),
        F.round(F.when(zero, 0.0).otherwise(2 * p * r / (p + r)), 6).alias("f1"),
    )


def _label_f1_counts(pred_m: DataFrame, gold_m: DataFrame, line_keys: list[str],
                     label_col: str, word_col: str) -> DataFrame:
    """Internal: per-label (label, tp, fp, fn) counts on distinct keys."""
    keys = line_keys + [label_col, word_col]
    p_k = pred_m.select(*keys).distinct()
    g_k = gold_m.select(*keys).distinct()
    tp = p_k.join(g_k, keys, "inner").groupBy(label_col).agg(F.count("*").alias("tp"))
    fp = p_k.join(g_k, keys, "left_anti").groupBy(label_col).agg(F.count("*").alias("fp"))
    fn = g_k.join(p_k, keys, "left_anti").groupBy(label_col).agg(F.count("*").alias("fn"))
    labels = p_k.select(label_col).union(g_k.select(label_col)).distinct()
    return (
        labels.join(tp, label_col, "left")
        .join(fp, label_col, "left")
        .join(fn, label_col, "left")
        .fillna(0)
    )


def label_f1(pred_m: DataFrame, gold_m: DataFrame, line_keys: list[str],
             label_col: str = "etype", word_col: str = "text") -> DataFrame:
    """CLUE-style per-label TP/FP/FN + P/R/F1 (cluener_score.py:10-35).

    The reference compares *distinct word keys* per (line, label) —
    dict keys — so both sides are deduplicated before the joins.
    """
    m = _label_f1_counts(pred_m, gold_m, line_keys, label_col, word_col)
    # try_divide: a label with zero predictions (or p=r=0) yields NULL
    # where the reference scorer would raise ZeroDivisionError
    p = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    r = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    return m.select(
        F.col(label_col).alias("label"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(F.try_divide(2 * p * r, p + r), 6).alias("f1"),
    )


def label_f1_macro(pred_m: DataFrame, gold_m: DataFrame, line_keys: list[str],
                   label_col: str = "etype", word_col: str = "text") -> DataFrame:
    """Macro average over labels — the reference's headline CLUE number
    (cluener_score.py:38-49: sum of per-label f1 / number of labels).

    Averages the UNROUNDED per-label values; labels whose p/r/f1 is
    undefined (zero denominators, where the reference scorer would raise
    ZeroDivisionError) are NULL and excluded by avg() — identically in
    Spark and DuckDB.  One row: (n_labels, precision, recall, f1).
    """
    m = _label_f1_counts(pred_m, gold_m, line_keys, label_col, word_col)
    p = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    r = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    f1 = F.try_divide(2 * p * r, p + r)
    return m.agg(
        F.count("*").cast("bigint").alias("n_labels"),
        F.round(F.avg(p), 6).alias("precision"),
        F.round(F.avg(r), 6).alias("recall"),
        F.round(F.avg(f1), 6).alias("f1"),
    )
