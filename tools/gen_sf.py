"""Deterministic sf1 test-data synthesis (r4 verdict item 2: a 100x
correctness-gate-scale verification sweep needs sf1 inputs, and
/root/testdata is read-only and tops out at sf0.1).

Construction: 10x KEY-SHIFTED REPLICATION of the driver's sf0.1
tables (seedless — pure arithmetic on the existing deterministic
data), preserving every FK relationship by shifting all key columns of
a replica by ``r * (max_key + 1)``:

* ``documents``: doc_id shifted; replica r > 0 appends a per-replica
  suffix token to ``text``.  Replicas are therefore NEAR-duplicates of
  their originals — deliberately: a web-scale corpus is full of
  boilerplate near-dup families, so sf1 stresses the dedup tier with
  10-member near-dup cliques while staying oracle-checkable (Spark and
  DuckDB read the same parquet).
* ``embeddings``: vec_id shifted; a deterministic per-(replica, dim)
  perturbation in [-3e-3, 3e-3] keeps replicas near their originals
  (ANN finds them as close neighbors — the scale shape) without exact
  ties.  Replica 0 is bit-identical, so the fixed query ids 0..49
  keep their original vectors.
* ``events``: event_id/user_id shifted, timestamps unchanged (10x
  density in the same date range — the pruning layout's hot-partition
  case).
* TPC-H tables: all *key columns shifted per replica; ``region`` /
  ``nation`` stay as-is (fixed dimension tables — FK targets).

Pure pyarrow (no Spark, no RNG).  Usage:
    python tools/gen_sf.py [out_dir=/tmp/nfs_sf1] [factor=10]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key columns to shift per table (FK-consistent: same shift everywhere)
KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
# which shift-space each key column belongs to (shared across tables)
KEY_SPACE = {
    "doc_id": "doc", "vec_id": "vec", "event_id": "event",
    "user_id": "user", "c_custkey": "cust", "o_orderkey": "order",
    "o_custkey": "cust", "l_orderkey": "order", "l_partkey": "part",
    "l_suppkey": "supp", "p_partkey": "part", "s_suppkey": "supp",
}
PASSTHROUGH = ["region", "nation"]


def _spaces() -> dict[str, int]:
    """max+1 per key space across all source tables (the shift unit)."""
    hi: dict[str, int] = {}
    for table, cols in KEY_COLS.items():
        t = pq.read_table(f"{SRC}/{table}.parquet", columns=cols)
        for c in cols:
            m = pc.max(t.column(c)).as_py() or 0
            sp = KEY_SPACE[c]
            hi[sp] = max(hi.get(sp, 0), int(m) + 1)
    return hi


def _replicate(table: str, factor: int, spaces: dict[str, int]) -> pa.Table:
    t = pq.read_table(f"{SRC}/{table}.parquet")
    parts = []
    for r in range(factor):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in KEY_COLS.get(table, []):
                shift = r * spaces[KEY_SPACE[name]]
                col = pc.add(col, pa.scalar(shift, type=col.type))
            elif table == "documents" and name == "text" and r > 0:
                col = pc.binary_join_element_wise(
                    col.cast(pa.string()), pa.scalar(f"rep{r}x"), " "
                )
            elif table == "documents" and name == "n_chars" and r > 0:
                # keep the length column consistent with the suffix
                col = pc.add(col, pa.scalar(len(f" rep{r}x"),
                                            type=col.type))
            elif table == "embeddings" and name == "embedding" and r > 0:
                arr = col.combine_chunks()
                flat = np.asarray(arr.flatten().to_numpy(
                    zero_copy_only=False))
                dim = len(flat) // len(arr)
                # irrational step: the driver's embeddings are stored
                # 6dp-rounded, and a clean decimal perturbation makes
                # near-parallel replica cosines land exactly on
                # .5e-6 rounding boundaries where Spark (half-up) and
                # DuckDB (half-even) legitimately differ — measured:
                # one ann_topk row at 0.9998745.  sqrt(2) scatters the
                # mantissa so boundary hits are measure-zero.
                pert = ((((r * 31 + np.arange(dim)) % 7) - 3)
                        * 1e-3 * np.sqrt(2.0))
                flat = (flat.reshape(-1, dim) + pert).reshape(-1)
                col = pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, type=arr.type.value_type), dim
                ) if pa.types.is_fixed_size_list(arr.type) else \
                    pa.ListArray.from_arrays(
                        arr.offsets, pa.array(
                            flat, type=arr.type.value_type))
            cols[name] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nfs_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    spaces = _spaces()
    for table in PASSTHROUGH:
        pq.write_table(pq.read_table(f"{SRC}/{table}.parquet"),
                       f"{out}/{table}.parquet")
        print(f"{table}: passthrough")
    for table in KEY_COLS:
        rt = _replicate(table, factor, spaces)
        pq.write_table(rt, f"{out}/{table}.parquet")
        print(f"{table}: {rt.num_rows} rows")
    print(f"wrote sf1 ({factor}x sf0.1) under {out}")


if __name__ == "__main__":
    main()
