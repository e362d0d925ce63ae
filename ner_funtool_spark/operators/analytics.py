"""Relational analytics over the TPC-H-ish tables — the §2.6 join/agg/
window shapes as explicit, oracle-checked plans.

Each function is deliberately written the way the 100 TB plan should
look: filters before joins (pushdown), broadcast hints on dimensions,
single-shuffle aggregations, window top-k instead of per-group sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-filter -> partial+final hash aggregation."""
    return (
        lineitem.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, nation: DataFrame) -> DataFrame:
    """Join chain with broadcast dimensions: lineitem is the fact table;
    customer/nation broadcast; one shuffle for the final aggregation."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """NOT EXISTS as a left anti join."""
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def top_parts_per_supplier(lineitem: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group via window row_number (no per-group sort-all)."""
    rev = lineitem.groupBy("l_suppkey", "l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("l_suppkey", "l_partkey", "revenue", F.col("rank").cast("int").alias("rank"))
    )


def order_priority_distribution(orders: DataFrame) -> DataFrame:
    """Distinct-count + grouping: per priority, orders and customers."""
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


def tfidf(documents, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, token, tf, df, tfidf): smoothed TF-IDF over whitespace
    tokens — the retrieval feature a document pipeline materializes
    next to embeddings.  idf = ln((1 + N) / (1 + df)) + 1 (the
    add-one-smoothed form, never negative/divide-by-zero), tfidf
    rounded to 6 decimals (cross-engine float rule).

    Shape at scale: one explode + one (doc, token) groupBy for tf, one
    token groupBy for df, a broadcast of the (small) token-df dimension
    back onto tf, and the corpus size N as a 1-row broadcast — two
    shuffles total, both on bounded keys.
    """
    from pyspark.sql import functions as F

    toks = documents.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = documents.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col), "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round(
                F.col("tf")
                * (F.log((1 + F.col("n_docs")) / (1 + F.col("df"))) + 1), 6
            ).alias("tfidf"),
        )
    )


def bigram_stats(documents, text_col: str = "text", min_n: int = 5):
    """(w1, w2, n, p): corpus bigram counts with the conditional
    probability p = P(w2 | w1), n >= min_n — the n-gram LM statistic
    (and the signal behind collocation/boilerplate detection).  One
    explode producing adjacent pairs + two aggregations."""
    from pyspark.sql import functions as F

    toks = F.split(F.col(text_col), " ")
    pairs = documents.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2").filter((F.col("w1") != "") & (F.col("w2") != ""))
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    firsts = pairs.groupBy("w1").agg(F.count("*").alias("n1"))
    return (
        counts.join(F.broadcast(firsts), "w1")
        .filter(F.col("n") >= min_n)
        .select(
            "w1", "w2", F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("n1"), 6).alias("p"),
        )
    )


def key_skew_report(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """(key, n, share, cum_share, rank): the hot-key profile a pipeline
    reads BEFORE choosing salt factors / bucket counts — the north_rule's
    "skew handled explicitly" starts with measuring it.  rank orders by
    (count desc, key asc); share and cum_share are fractions of all rows.

    Shape at scale: one per-key aggregation (map-side partial combine),
    then a global top-k via orderBy().limit() — Spark plans TakeOrdered,
    a per-partition heap + driver merge of top_k rows, NOT a global
    sort.  The window functions run on the already-limited top_k rows
    (single tiny partition by construction); the total is a 1-row
    broadcast.  cum_share divides an INTEGER running sum once at the
    end, so no float-summation-order dependence cross-engine.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").alias("t"))
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    cum = Window.orderBy(F.desc("n"), F.asc("key")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .withColumn("cum_n", F.sum("n").over(cum))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
            F.round(F.col("cum_n") / F.col("t"), 6).alias("cum_share"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sketch_profile_violations(documents: DataFrame,
                              max_distinct_rel_err: float = 0.10,
                              max_quantile_rel_err: float = 0.05) -> DataFrame:
    """Sketch-vs-exact profiling gate: per source, compare
    approx_count_distinct (HyperLogLog++) and approx_percentile
    (median, accuracy 1000) against their exact counterparts, emitting
    one row per violation of the relative-error bound — expected EMPTY.

    At 100 TB the profiling pass runs on sketches (fixed-size state,
    one pass, mergeable across partitions) and never on exact
    distincts; this gate pins the sketches' error on the driver corpus
    so a regression in accuracy parameters (rsd, percentile accuracy)
    fails the oracle check instead of silently degrading profiles.
    Both sketches are deterministic for a fixed input + implementation,
    so the empty result is stable, not flaky.
    """
    # rsd=0.01: the default 5% HLL sketch has discrete small-cardinality
    # bias (measured 12% off at 25 distincts); the 1% sketch is exact
    # in its sparse range and still fixed-size mergeable state at scale
    #
    # r6 plan fix (measured 3.4 s -> 0.9 s at sf0.1): the DISTINCT
    # aggregate must NOT share a groupBy with the sketch aggregates —
    # Spark rewrites a mixed distinct/non-distinct aggregation into a
    # two-level plan keyed by (source, text), which materializes and
    # shuffles the full HLL + percentile partial buffers (~1.6k state
    # words) once PER DISTINCT TEXT instead of once per partition.
    # Splitting into two aggregations joined on the group key keeps
    # every sketch buffer per-partition; at corpus scale the mixed form
    # would shuffle sketch-state x distinct-keys — O(corpus) buffers.
    exact_d = documents.groupBy("source").agg(
        F.count_distinct("text").cast("double").alias("exact_distinct"),
    )
    sketches = documents.groupBy("source").agg(
        F.approx_count_distinct("text", 0.01).cast("double")
        .alias("approx_distinct"),
        F.percentile("n_chars", 0.5).cast("double").alias("exact_p50"),
        F.expr("approx_percentile(n_chars, 0.5, 1000)")
        .cast("double").alias("approx_p50"),
    )
    prof = exact_d.join(sketches, "source")
    rel = lambda a, b: F.abs(a - b) / F.greatest(a, F.lit(1.0))  # noqa: E731
    checks = prof.select(
        "source",
        F.when(
            rel(F.col("exact_distinct"), F.col("approx_distinct"))
            > max_distinct_rel_err,
            F.lit("distinct"),
        ).alias("v1"),
        F.when(
            rel(F.col("exact_p50"), F.col("approx_p50")) > max_quantile_rel_err,
            F.lit("quantile"),
        ).alias("v2"),
        "exact_distinct", "approx_distinct", "exact_p50", "approx_p50",
    )
    return (
        checks.select(
            "source",
            F.explode(
                F.filter(F.array("v1", "v2"), lambda c: c.isNotNull())
            ).alias("check_name"),
            F.round("exact_distinct", 6).alias("exact_distinct"),
            F.round("approx_distinct", 6).alias("approx_distinct"),
            F.round("exact_p50", 6).alias("exact_p50"),
            F.round("approx_p50", 6).alias("approx_p50"),
        )
    )
