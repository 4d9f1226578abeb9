#!/usr/bin/env python3
"""Generate a large embeddings-only bench fixture (local tooling, like
gen_big.py — the engine never depends on this).

Layout for n total vectors, from the sf0.1 embeddings (2000 rows):
  - replica 0: the originals, verbatim (ids 0..1999);
  - replica 1: EXACT copies at id offset 10M — the planted near-dup
    population (every original gains one cosine-1.0 duplicate, same
    construction the l6 query uses);
  - NEAR-THRESHOLD tier at id offset 5M: every original also gains a
    noised copy rotated to cosine ~ U[0.81, 0.95] (seeded) — exact
    copies share every band signature BY CONSTRUCTION, so they cannot
    exercise the probabilistic banding math; recall at tau=0.8 is
    governed by pairs in exactly this range;
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
NEAR_OFFSET = 5_000_000  # id offset of the near-threshold noised copies

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

    # near-threshold tier: rotate each original toward a seeded random
    # orthogonal direction by acos(c), c ~ U[0.81, 0.95] — cos(v, w) = c
    # up to float32, and the 0.81 floor keeps the 1e-3 quantization
    # wobble of the engine's scaled cosine away from the tau=0.8 gate
    rng_near = np.random.default_rng(7)
    v64 = emb.astype(np.float64)
    vnorm = np.linalg.norm(v64, axis=1, keepdims=True)
    vhat = v64 / vnorm
    g = rng_near.standard_normal((base_n, dim))
    g -= (g * vhat).sum(axis=1, keepdims=True) * vhat
    ghat = g / np.linalg.norm(g, axis=1, keepdims=True)
    c = rng_near.uniform(0.81, 0.95, size=base_n)
    near = ((c[:, None] * vhat + np.sqrt(1 - c**2)[:, None] * ghat)
            * vnorm).astype(np.float32)

    parts_id = [ids, ids + OFFSET, ids + NEAR_OFFSET]
    parts_emb = [emb, emb, near]
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
          f"planted exact-dup pairs: {base_n}, "
          f"near-threshold pairs (cos 0.81-0.95): {base_n}")

if __name__ == "__main__":
    main()
