#!/usr/bin/env python3
"""Scale-factor extrapolation generator (NOT part of the library).

Usage: python3 tools/gen_scale.py <srcSfDir> <outDir> [factor] [seed]

Generates a larger synthetic corpus with the SAME schema and
distribution shape as the driver's testdata (TESTDATA.md), for
measuring wall-clock scale slopes (BASELINE.md's slope table): run the
heavy queries at sf0.1 and at the generated sf1 and fit warm-time
ratios. Never touches /root/testdata (read-only).

Method, table by table:
- region/nation: copied verbatim (dimension tables don't scale).
- customer/supplier/part/orders/lineitem/events: TILED `factor` times
  with coherent key offsets (custkey/orderkey/partkey/suppkey/
  event_id/user_id shift by copy x domain). Tiling preserves the
  driver's value distributions, referential integrity, and skew RATIO
  exactly, and matches the driver's own convention of growing the
  user domain with sf (15 -> 150 -> 1500). Timestamps keep their
  window: a corpus grows by rate, not by calendar.
- documents: FRESH generation from the measured process (uniform
  draws over the same ~30-word vocab, uniform word-count matching the
  44..577 n_chars range, lang mix ~41% en / ~15% each de/fr/es/zh,
  20 uniform sources, and ~5% planted near-dup copies of an earlier
  doc with " dup" appended — the sf0.1 structure: 250/5000 docs,
  247 long-prefix pairs). Tiling would instead create factor-sized
  exact-dup cliques and blow the near-dup pair count quadratically —
  an artifact, not a measurement.
- embeddings: row 0 (THE query vector) copied from the source so ANN
  queries probe the same point; the rest fresh L2-normalized
  64-dim gaussians (the measured shape: component std 0.125 = 1/sqrt(64),
  unit norms), labels uniform 0..9.

Deterministic under the seed argument (default 1842). events.ts is
written as parquet TIMESTAMP(NANOS) — the physical type the engine's
nanosAsLong contract expects.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def tile(src, out, name, factor, offsets):
    t = pq.read_table(f"{src}/{name}.parquet")
    n = t.num_rows
    copies = []
    for i in range(factor):
        cols = {}
        for field in t.schema.names:
            col = t.column(field)
            if field in offsets and i > 0:
                base = offsets[field]
                cols[field] = pa.chunked_array([
                    pa.array(np.asarray(c, dtype=np.int64) + i * base,
                             type=col.type) for c in col.chunks])
            else:
                cols[field] = col
        copies.append(pa.table(cols, schema=t.schema))
    out_t = pa.concat_tables(copies)
    pq.write_table(out_t, f"{out}/{name}.parquet")
    print(f"  {name}: {n} -> {out_t.num_rows}")


def gen_documents(src, out, factor, rng):
    n_src = pq.read_table(f"{src}/documents.parquet").num_rows
    n = n_src * factor
    texts, langs, sources = [], [], []
    for i in range(n):
        # ~5% near-dup plants once a base pool exists, as in the source
        if i > 20 and rng.random() < 0.05:
            base = texts[rng.integers(0, len(texts))]
            texts.append(base + " dup")
        else:
            k = int(rng.integers(8, 111))
            words = rng.integers(0, len(VOCAB), size=k)
            texts.append(" ".join(VOCAB[w] for w in words))
        langs.append(LANGS[rng.choice(len(LANGS), p=LANG_P)])
        sources.append(f"src{int(rng.integers(0, 20))}")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(sources, type=pa.string()),
        "n_chars": pa.array(np.array([len(x) for x in texts], dtype=np.int64)),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"  documents: {n_src} -> {n} (fresh)")


def gen_embeddings(src, out, factor, rng):
    t = pq.read_table(f"{src}/embeddings.parquet")
    n_src = t.num_rows
    n = n_src * factor
    q = t.slice(0, 1)  # vec_id 0: the ANN query vector, kept identical
    dim = len(q.column("embedding")[0].as_py())
    v = rng.standard_normal((n - 1, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rest = pa.table({
        "vec_id": pa.array(np.arange(1, n, dtype=np.int64)),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n - 1).astype(np.int32)),
    }, schema=t.schema)
    pq.write_table(pa.concat_tables([q, rest]), f"{out}/embeddings.parquet")
    print(f"  embeddings: {n_src} -> {n} (fresh, query vector kept)")


def main(src, out, factor=10, seed=1842):
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{out}/{name}.parquet")
        print(f"  {name}: copied")
    tile(src, out, "customer", factor, {"c_custkey": 15000})
    tile(src, out, "supplier", factor, {"s_suppkey": 1000})
    tile(src, out, "part", factor, {"p_partkey": 20000})
    tile(src, out, "orders", factor, {"o_orderkey": 150000, "o_custkey": 15000})
    tile(src, out, "lineitem", factor,
         {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000})
    tile(src, out, "events", factor, {"event_id": 100000, "user_id": 1500})
    gen_documents(src, out, factor, rng)
    gen_embeddings(src, out, factor, rng)


if __name__ == "__main__":
    a = sys.argv
    main(a[1], a[2], int(a[3]) if len(a) > 3 else 10,
         int(a[4]) if len(a) > 4 else 1842)
