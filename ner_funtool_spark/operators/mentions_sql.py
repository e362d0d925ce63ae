"""Relational (UDF-free) mention extraction over the documents table.

The same maximal-run BMES semantics as the Arrow-CRF pipeline, but
expressed entirely with JVM-side expressions + window functions —
the "SQL-expressible via window/aggregate" variant SURVEY.md §2.9 maps
the reference's span extractors to.  Serves three purposes:

1. an independent second implementation that cross-checks the CRF path,
2. the "other model" in metric demos (with perturbed word lists),
3. a template for users who want pure-SQL extraction at scale.

Scale note: the only shuffle is the window partition by doc — the same
key the groupBy uses, so Catalyst reuses one exchange for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DOC_OBJ_WORDS, DOC_OP_WORDS
from .tagger import MAX_LEN


def doc_tokens(documents: DataFrame, max_len: int = MAX_LEN) -> DataFrame:
    """documents -> (doc_id, source, pos, tok, tok_begin) token rows.

    tok_begin = char offset of the token in the original text
    (single-space separated corpus), computed with a running window sum.
    """
    toks = documents.select(
        "doc_id",
        "source",
        F.posexplode(F.slice(F.split(F.col("text"), " "), 1, max_len)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    return toks.withColumn(
        "tok_begin",
        (F.coalesce(F.sum(F.length("tok")).over(w), F.lit(0)) + F.col("pos")).cast("int"),
    )


def classify(tok, op_words, obj_words):
    return (
        F.when(tok.isin(*op_words), "op")
        .when(tok.isin(*obj_words), "obj")
        .otherwise(F.lit(None).cast("string"))
    )


def mentions_relational(documents: DataFrame,
                        op_words=DOC_OP_WORDS, obj_words=DOC_OBJ_WORDS,
                        max_len: int = MAX_LEN) -> DataFrame:
    """Maximal same-class runs -> mention rows
    (repo, path, sent_id, mbegin, mend, text, etype)."""
    t = doc_tokens(documents, max_len).withColumn(
        "cls", classify(F.col("tok"), op_words, obj_words)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    t = t.withColumn(
        "brk",
        F.when(F.col("cls").eqNullSafe(F.lag("cls").over(w)), 0).otherwise(1),
    ).withColumn("gid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = (
        t.filter(F.col("cls").isNotNull())
        .groupBy("doc_id", "source", "gid", "cls")
        .agg(
            F.min("tok_begin").alias("mbegin"),
            F.max(F.col("tok_begin") + F.length("tok")).cast("int").alias("mend"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x["tok"]
                ),
                " ",
            ).alias("text"),
        )
    )
    return runs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.lit(0).cast("bigint").alias("sent_id"),
        F.col("mbegin"),
        F.col("mend"),
        "text",
        F.col("cls").alias("etype"),
    )


def doc_tag_pairs(documents: DataFrame, gold_op=DOC_OP_WORDS, gold_obj=DOC_OBJ_WORDS,
                  pred_op=None, pred_obj=None, remove_o: bool = True,
                  max_len: int = MAX_LEN) -> DataFrame:
    """(gold, pred) class-tag pairs per token — feeds the A3-A8 metric
    aggregations with two deterministic 'models'."""
    t = doc_tokens(documents, max_len)
    gold = F.coalesce(classify(F.col("tok"), gold_op, gold_obj), F.lit("O"))
    pred = F.coalesce(classify(F.col("tok"), pred_op, pred_obj), F.lit("O"))
    pairs = t.select(gold.alias("gold"), pred.alias("pred"))
    if remove_o:
        pairs = pairs.filter(F.col("gold") != "O")
    return pairs
