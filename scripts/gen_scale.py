"""Generate a scaled-up copy of the driver testdata for scale validation.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md); the judge asked for proof
that the catalog survives 10x that (VERDICT r3, next-round item 1).  This
script builds an sf1-shaped dataset locally WITHOUT touching /root/testdata:

* ``region``/``nation``        copied verbatim (fixed-cardinality dims).
* ``customer supplier part orders lineitem``  replicated ``mult`` times with
  per-copy key offsets, so FK integrity holds and per-key group sizes stay
  constant while key cardinality grows — the realistic 100 TB shape (more
  orders, not 10x lineitems per order).
* ``events``  replicated with fresh ``user_id``/``event_id`` per copy and the
  timestamps kept, so windows densify and user cardinality grows.
* ``documents``  freshly generated from the corpus' own vocabulary and
  length/lang/source distributions, with exact-duplicate and near-duplicate
  documents planted at the rates observed in the source data (so dedup
  workloads see the same duplicate fraction, not a 10x-duplicated corpus
  whose quadratic pair count would be an artifact of replication).
* ``embeddings``  freshly sampled from per-label Gaussian fits of the source
  vectors (10 clusters stay 10 clusters with 10x the points).

Determinism: seeded numpy RNG; same inputs -> byte-identical outputs.

Usage: python scripts/gen_scale.py [--mult 10] [--src /root/testdata/sf0.1]
       [--dst .localdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _write(dst: str, name: str, table: pa.Table) -> None:
    os.makedirs(dst, exist_ok=True)
    pq.write_table(table, os.path.join(dst, f"{name}.parquet"))


def _offset_copies(table: pa.Table, mult: int, offsets: dict[str, int]) -> pa.Table:
    """Concat ``mult`` copies, adding ``copy_index * offsets[col]`` to key cols."""
    parts = []
    for k in range(mult):
        t = table
        if k:
            for col, off in offsets.items():
                idx = t.schema.get_field_index(col)
                shifted = pa.compute.add(t.column(col), off * k).cast(t.schema.field(col).type)
                t = t.set_column(idx, t.schema.field(col), shifted)
        parts.append(t)
    return pa.concat_tables(parts)


def _pow10_offset(table: pa.Table, col: str) -> int:
    mx = pa.compute.max(table.column(col)).as_py() or 0
    off = 1
    while off <= mx:
        off *= 10
    return off


def gen_tpch(src: str, dst: str, mult: int) -> None:
    for name in ("region", "nation"):
        _write(dst, name, _read(src, name))

    cust = _read(src, "customer")
    supp = _read(src, "supplier")
    part = _read(src, "part")
    orders = _read(src, "orders")
    c_off = _pow10_offset(cust, "c_custkey")
    s_off = _pow10_offset(supp, "s_suppkey")
    p_off = _pow10_offset(part, "p_partkey")
    o_off = _pow10_offset(orders, "o_orderkey")

    _write(dst, "customer", _offset_copies(cust, mult, {"c_custkey": c_off}))
    _write(dst, "supplier", _offset_copies(supp, mult, {"s_suppkey": s_off}))
    _write(dst, "part", _offset_copies(part, mult, {"p_partkey": p_off}))
    _write(dst, "orders", _offset_copies(
        orders, mult, {"o_orderkey": o_off, "o_custkey": c_off}))
    _write(dst, "lineitem", _offset_copies(
        _read(src, "lineitem"), mult,
        {"l_orderkey": o_off, "l_partkey": p_off, "l_suppkey": s_off}))


def gen_events(src: str, dst: str, mult: int) -> None:
    ev = _read(src, "events")
    e_off = _pow10_offset(ev, "event_id")
    u_off = _pow10_offset(ev, "user_id")
    _write(dst, "events", _offset_copies(
        ev, mult, {"event_id": e_off, "user_id": u_off}))


def gen_documents(src: str, dst: str, mult: int, rng: np.random.Generator) -> None:
    docs = _read(src, "documents")
    n_src = docs.num_rows
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = sorted(set(docs.column("source").to_pylist()))

    vocab = sorted({w for t in texts[:2000] for w in t.split()})
    lang_vals, lang_counts = np.unique(np.asarray(langs), return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    lens = np.asarray([len(t.split()) for t in texts])
    lo, hi = int(lens.min()), int(lens.max())

    # Observed duplicate structure in the source corpus (sf0.1: 8 exact-dup
    # pairs / 5000 docs, ~216 near-dup prefix groups): plant at the same rate.
    n_total = n_src * mult
    n_exact = max(1, round(n_total * 8 / 5000))
    n_near = max(1, round(n_total * 216 / 5000))
    n_base = n_total - n_exact - n_near

    word_idx = rng.integers(0, len(vocab), size=int(np.mean(lens) * n_base * 2))
    base_texts: list[str] = []
    pos = 0
    doc_lens = rng.integers(lo, hi + 1, size=n_base)
    for L in doc_lens:
        if pos + L > len(word_idx):
            word_idx = rng.integers(0, len(vocab), size=len(word_idx))
            pos = 0
        base_texts.append(" ".join(vocab[i] for i in word_idx[pos:pos + L]))
        pos += L

    out_texts = list(base_texts)
    # exact duplicates: re-emit a random base doc verbatim
    for i in rng.integers(0, n_base, size=n_exact):
        out_texts.append(base_texts[i])
    # near duplicates: one or two word substitutions
    for i in rng.integers(0, n_base, size=n_near):
        words = base_texts[i].split()
        for j in rng.integers(0, len(words), size=int(rng.integers(1, 3))):
            words[j] = vocab[int(rng.integers(0, len(vocab)))]
        out_texts.append(" ".join(words))
    perm = rng.permutation(len(out_texts))
    out_texts = [out_texts[i] for i in perm]

    out_langs = rng.choice(lang_vals, size=n_total, p=lang_p)
    out_sources = [sources[i] for i in rng.integers(0, len(sources), size=n_total)]
    _write(dst, "documents", pa.table({
        "doc_id": pa.array(range(n_total), type=pa.int64()),
        "text": pa.array(out_texts),
        "lang": pa.array([str(x) for x in out_langs]),
        "source": pa.array(out_sources),
        "n_chars": pa.array([len(t) for t in out_texts], type=pa.int64()),
    }))


def gen_embeddings(src: str, dst: str, mult: int, rng: np.random.Generator) -> None:
    emb = _read(src, "embeddings")
    # zero-copy list<float32> → (n, dim) view (r7: the to_pylist /
    # tolist round-trips built tens of GB of python objects at
    # mult ≥ 100 — the arrow buffers ARE the data; values unchanged)
    col = emb.column("embedding").combine_chunks()
    dim = len(col[0])
    vecs = np.asarray(col.values, dtype=np.float32).reshape(-1, dim)
    labels = emb.column("label").to_numpy()
    n_total = emb.num_rows * mult
    uniq = np.unique(labels)
    out_label = uniq[rng.integers(0, len(uniq), size=n_total)]
    out = np.empty((n_total, dim), dtype=np.float32)
    for lab in uniq:
        mu = vecs[labels == lab].mean(axis=0)
        sd = vecs[labels == lab].std(axis=0)
        mask = out_label == lab
        out[mask] = mu + sd * rng.standard_normal((int(mask.sum()), dim))
    offsets = pa.array(
        np.arange(0, (n_total + 1) * dim, dim, dtype=np.int64)
    )
    flat = pa.array(out.reshape(-1), type=pa.float32())
    _write(dst, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_total, dtype=np.int64)),
        "embedding": pa.LargeListArray.from_arrays(offsets, flat).cast(
            pa.list_(pa.float32())
        ),
        "label": pa.array(out_label.astype(np.int32)),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1"))
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    gen_tpch(args.src, args.dst, args.mult)
    gen_events(args.src, args.dst, args.mult)
    gen_documents(args.src, args.dst, args.mult, rng)
    gen_embeddings(args.src, args.dst, args.mult, rng)
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        t = pq.read_metadata(os.path.join(args.dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows")


if __name__ == "__main__":
    main()
