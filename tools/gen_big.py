#!/usr/bin/env python3
"""Generate a larger bench fixture by replicating sf0.1 with key offsets.

Local bench tooling only (mirrors tools/check_oracle.py's role) — the
engine itself never depends on this. Each replica r shifts every key
column by r*OFFSET, so referential integrity (orders.o_custkey ->
customer.c_custkey, lineitem.l_orderkey -> orders.o_orderkey, ...)
holds across replicas. Dimension tables (region, nation) are shared,
matching how dims behave at real scale. Texts/embeddings are reused
verbatim, which plants exact cross-replica duplicates — the dedup and
near-dup queries then have 4x the corpus AND a denser duplicate
population, the adversarial direction for their candidate volume.

Usage: gen_big.py [replicas] [src_dir] [out_dir] [tables]
  tables: optional comma list restricting output (e.g. "documents" for
  a docs-only 10^6 fixture at 200 replicas without 120M lineitem rows)
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
from pathlib import Path

OFFSET = 10_000_000  # > every key value at sf0.1

KEY_COLS = {
    "customer":   ["c_custkey"],
    "supplier":   ["s_suppkey"],
    "part":       ["p_partkey"],
    "orders":     ["o_orderkey", "o_custkey"],
    "lineitem":   ["l_orderkey", "l_partkey", "l_suppkey"],
    "events":     ["event_id", "user_id"],
    "documents":  ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    src = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    out = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfbig")
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    out.mkdir(parents=True, exist_ok=True)

    for name in SHARED:
        if only is not None and name not in only:
            continue
        t = pq.read_table(src / f"{name}.parquet")
        pq.write_table(t, out / f"{name}.parquet")
        print(f"{name}: {t.num_rows} rows (shared)")

    for name, keys in KEY_COLS.items():
        if only is not None and name not in only:
            continue
        t = pq.read_table(src / f"{name}.parquet")
        parts = [t]
        for r in range(1, replicas):
            cols = []
            for field in t.schema.names:
                col = t[field]
                if field in keys:
                    col = pc.add(col, r * OFFSET)
                cols.append(col)
            parts.append(pa.table(cols, names=t.schema.names))
        big = pa.concat_tables(parts)
        pq.write_table(big, out / f"{name}.parquet")
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
