#!/usr/bin/env python3
"""Generate a large embeddings-only bench fixture (local tooling, like
gen_big.py — the engine never depends on this).

Layout for n total vectors, from the sf0.1 embeddings (2000 rows):
  - replica 0: the originals, verbatim (ids 0..1999);
  - replica 1: EXACT copies at id offset 10M — the planted near-dup
    population (every original gains one cosine-1.0 duplicate, same
    construction the l6 query uses);
  - replicas 2..k: independent seeded N(0,1) float32 vectors — the
    realistic background a web-scale corpus has (near-orthogonal,
    adversarial for banding/celling).

This is the shape that stresses ANN candidate volume honestly: the
duplicate population is a fixed 2% sliver, not a 50x wall of copies
that would let bucket joins answer from duplicates alone.

Usage: gen_embed.py [total_n] [src_dir] [out_dir]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pathlib import Path

OFFSET = 10_000_000

def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    src = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    out = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf_embed")
    out.mkdir(parents=True, exist_ok=True)

    t = pq.read_table(src / "embeddings.parquet")
    base_n = t.num_rows
    dim = len(t["embedding"][0])
    ids = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    labels = t["label"].to_pylist()

    parts_id = [ids, ids + OFFSET]
    parts_emb = [emb, emb]
    rng = np.random.default_rng(42)
    r = 2
    while sum(len(p) for p in parts_id) < total:
        k = min(base_n, total - sum(len(p) for p in parts_id))
        parts_id.append(np.arange(k, dtype=np.int64) + r * OFFSET)
        parts_emb.append(rng.standard_normal((k, dim)).astype(np.float32))
        r += 1

    all_ids = np.concatenate(parts_id)
    all_emb = np.concatenate(parts_emb)
    all_labels = (labels * ((len(all_ids) + base_n - 1) // base_n))[: len(all_ids)]
    out_t = pa.table(
        {
            "vec_id": pa.array(all_ids, type=pa.int64()),
            "embedding": pa.array(all_emb.tolist(),
                                  type=pa.list_(pa.float32())),
            "label": pa.array(all_labels, type=t.schema.field("label").type),
        }
    )
    pq.write_table(out_t, out / "embeddings.parquet")
    print(f"embeddings: {out_t.num_rows} rows, dim={dim}, "
          f"planted exact-dup pairs: {base_n}")

if __name__ == "__main__":
    main()
