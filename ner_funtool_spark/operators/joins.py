"""Skew-safe join utilities.

``salted_join`` is the classic remedy for a shuffle join whose key
distribution is power-law (the north_star calls out "salted keys for
skewed popular-repo partitions"): a hot key puts its entire row set in
ONE reducer partition; salting splits that key's LEFT rows across
``n_salt`` sub-keys and replicates the (small relative to the hot key's
row count) RIGHT rows once per salt, so the hot key's work spreads over
``n_salt`` partitions.

Result equality: the join condition (keys + salt) with the right side
replicated over ALL salt values matches each left row exactly as the
plain keys-join would — salting changes the partitioning, never the
result (Q:triples_degrees_salted is gated against the plain-join
oracle).

AQE's skew-join splitting (enabled in session.py) handles moderate skew
at runtime; explicit salting is the deterministic tool for the extreme
case — a key so hot one partition cannot even hold its sorted run —
and for co-partitioning with a salted store layout (operators/triples
writes salted buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, keys: list[str],
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi join on ``keys`` with the left side salted ``n_salt`` ways.

    The salt is a deterministic hash of the whole left row (identical
    duplicate rows share a salt — harmless: skew comes from many
    DISTINCT rows sharing a key, which hash apart).  The right side is
    replicated once per salt value with ``explode`` (n_salt x |right|
    rows — the right side must be the smaller input, as in any skew
    recipe).  Output columns = plain ``left.join(right, keys, how)``.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l_s = left.withColumn("_salt", salt.cast("int"))
    r_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l_s.join(r_s, keys + ["_salt"], how).drop("_salt")
