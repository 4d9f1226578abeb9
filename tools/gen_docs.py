#!/usr/bin/env python3
"""Generate a large mostly-UNIQUE documents bench fixture (local tooling,
like gen_embed.py — the engine never depends on this).

gen_big.py replicates texts verbatim, which is the right adversary for
dedup operators with LINEAR outputs (every window/paragraph duplicated
Nx), but the wrong shape for PAIR-LISTING operators: a 200x-duplicated
corpus has ~10^8 true near-dup pairs, so any correct pair/group listing
is quadratic in the replication, not a measure of the operator. This
generator mirrors gen_embed.py's shape for the TEXT tier instead:

  - replica 0: the sf0.1 documents, verbatim (doc_ids 0..4999);
  - planted tier at id offset 10M: an exact copy of every original —
    each text gains exactly ONE duplicate (the l1/l6 construction), so
    the true pair set is 5000 pairs and group recall is checkable;
  - background at id offset 20M: independent seeded random-token texts
    (~55 tokens from a 20k-word vocabulary, the originals' length
    scale) — near-orthogonal shingle sets, the realistic web-corpus
    mass that stresses banding candidate volume without drowning the
    output in true pairs.

Usage: gen_docs.py [total_n] [src_dir] [out_dir]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pathlib import Path

OFFSET = 10_000_000
BG_OFFSET = 20_000_000


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    src = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    out = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf_docsu")
    out.mkdir(parents=True, exist_ok=True)

    t = pq.read_table(src / "documents.parquet")
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    n0 = len(ids)

    rng = np.random.default_rng(42)
    vocab = np.array(["w%05d" % i for i in range(20_000)])

    parts = [t]
    # planted exact duplicates (one per original)
    parts.append(pa.table({
        "doc_id": pa.array(ids + OFFSET, pa.int64()),
        "text": t.column("text"),
        "lang": t.column("lang"),
        "source": t.column("source"),
        "n_chars": t.column("n_chars"),
    }))

    n_bg = max(total - 2 * n0, 0)
    chunk = 100_000
    made = 0
    while made < n_bg:
        m = min(chunk, n_bg - made)
        lens = rng.integers(30, 80, size=m)
        flat = vocab[rng.integers(0, len(vocab), size=int(lens.sum()))]
        offs = np.concatenate([[0], np.cumsum(lens)])
        rows = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(m)]
        parts.append(pa.table({
            "doc_id": pa.array(BG_OFFSET + made + np.arange(m), pa.int64()),
            "text": pa.array(rows, pa.string()),
            "lang": pa.array([langs[(made + i) % n0] for i in range(m)], pa.string()),
            "source": pa.array([sources[(made + i) % n0] for i in range(m)], pa.string()),
            "n_chars": pa.array([len(r) for r in rows], pa.int64()),
        }))
        made += m

    big = pa.concat_tables(parts)
    pq.write_table(big, out / "documents.parquet", row_group_size=200_000)
    print(f"documents: {big.num_rows} rows, planted exact-dup pairs: {n0}, "
          f"background: {n_bg}")


if __name__ == "__main__":
    main()
