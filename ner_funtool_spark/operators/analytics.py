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
