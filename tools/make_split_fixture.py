"""One-off fixtures for the maxPartitionBytes A/B (r12 ledger open item 2,
r12 VERDICT #9).

The sf1 fixture is too small to measure scan split sizing honestly
(lineitem sf1 = 105 MB = one 128m split), so split_size_ab.py needs two
purpose-built inputs:

- ``.scaling/scan/lineitem.parquet`` — the sf0.1 lineitem replicated with
  the make_sf1 offset-block recipe at SCALE=300 (~sf30, ~3.2 GB, 180M
  rows): large enough that 128m vs 512m is 25 vs 7 splits, so per-split
  overhead and parallelism effects separate from noise. Written in
  multi-block row groups (~110 MB) so byte-range splits align to row
  groups the way a production table's would; SNAPPY to match the driver
  fixtures.
- ``.scaling/sf3/{documents,embeddings}.parquet`` — the make_sf1
  document/embedding recipes at SCALE=30 (similarity density and Gram
  statistics stationary by construction), for the heavy-extended-query
  arm of the A/B (q_dedup_clusters / q_hybrid_neardup / q_pagerank2 read
  only these two tables).

Both land under .scaling/ (gitignored; seeds pinned; idempotent).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling"
)
SCAN_DIR = os.path.join(ROOT, "scan")
SF3_DIR = os.path.join(ROOT, "sf3")
SCAN_SCALE = 300  # ~3.2 GB snappy — 25x 128m splits / 7x 512m splits
SF3_SCALE = 30
SEED = 20260


def _offset_block(t: pa.Table, key_offsets: dict[str, int], b: int) -> pa.Table:
    cols = {}
    for c in t.schema.names:
        if c in key_offsets and b > 0:
            arr = t.column(c).to_numpy(zero_copy_only=False)
            cols[c] = pa.array(
                arr + b * key_offsets[c], type=t.schema.field(c).type
            )
        else:
            cols[c] = t.column(c)
    return pa.table(cols)


def make_scan_lineitem() -> None:
    out = os.path.join(SCAN_DIR, "lineitem.parquet")
    if os.path.exists(out):
        print(f"{out}: exists, skipping")
        return
    os.makedirs(SCAN_DIR, exist_ok=True)
    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    part = pq.read_table(os.path.join(SRC, "part.parquet"))
    supplier = pq.read_table(os.path.join(SRC, "supplier.parquet"))

    def span(t, c):
        return int(t.column(c).to_numpy(zero_copy_only=False).max()) + 1

    offs = {
        "l_orderkey": span(orders, "o_orderkey"),
        "l_partkey": span(part, "p_partkey"),
        "l_suppkey": span(supplier, "s_suppkey"),
    }
    writer = pq.ParquetWriter(out, li.schema, compression="snappy")
    group: list[pa.Table] = []
    for b in range(SCAN_SCALE):
        group.append(_offset_block(li, offs, b))
        if len(group) == 10:  # ~6M rows / ~110 MB per row-group flush
            writer.write_table(pa.concat_tables(group))
            group = []
    if group:
        writer.write_table(pa.concat_tables(group))
    writer.close()
    sz = os.path.getsize(out) / 1e9
    print(f"scan lineitem: {SCAN_SCALE * li.num_rows} rows, {sz:.2f} GB")


def make_sf3_documents() -> None:
    out = os.path.join(SF3_DIR, "documents.parquet")
    if os.path.exists(out):
        print(f"{out}: exists, skipping")
        return
    os.makedirs(SF3_DIR, exist_ok=True)
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    tokens = [s.split(" ") for s in text]
    vocab, counts = np.unique(
        np.concatenate([np.array(tk) for tk in tokens]), return_counts=True
    )
    p = counts / counts.sum()
    lengths = np.array([len(tk) for tk in tokens])

    rng = np.random.default_rng(SEED)
    n_orig = len(doc_id)
    n_new = n_orig * (SF3_SCALE - 1)
    tmpl = rng.integers(0, n_orig, size=n_new)
    new_lengths = lengths[tmpl]
    draws = rng.choice(vocab, size=int(new_lengths.sum()), p=p)

    new_ids, new_text, new_lang, new_src = [], [], [], []
    pos = 0
    next_id = max(doc_id) + 1
    for i in range(n_new):
        ln = int(new_lengths[i])
        new_text.append(" ".join(draws[pos : pos + ln]))
        pos += ln
        new_ids.append(next_id + i)
        new_lang.append(lang[tmpl[i]])
        new_src.append(source[tmpl[i]])

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_id + new_ids, pa.int64()),
                "text": pa.array(text + new_text, pa.string()),
                "lang": pa.array(lang + new_lang, pa.string()),
                "source": pa.array(source + new_src, pa.string()),
                "n_chars": pa.array(
                    [len(s) for s in text] + [len(s) for s in new_text],
                    pa.int64(),
                ),
            }
        ),
        out,
    )
    print(f"sf3 documents: {n_orig * SF3_SCALE} rows")


def make_sf3_embeddings() -> None:
    out = os.path.join(SF3_DIR, "embeddings.parquet")
    if os.path.exists(out):
        print(f"{out}: exists, skipping")
        return
    os.makedirs(SF3_DIR, exist_ok=True)
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    n = t.num_rows
    rng = np.random.default_rng(SEED + 1)
    vec_id = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = t.column("embedding").to_pylist()
    label = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    extra = n * (SF3_SCALE - 1)
    pick = rng.integers(0, n, size=extra)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(
                    np.concatenate([vec_id, vec_id.max() + 1 + np.arange(extra)]),
                    pa.int64(),
                ),
                "embedding": pa.array(
                    emb + [emb[i] for i in pick], pa.list_(pa.float32())
                ),
                "label": pa.array(
                    np.concatenate([label, label[pick]]), pa.int32()
                ),
            }
        ),
        out,
    )
    print(f"sf3 embeddings: {n * SF3_SCALE} rows")


if __name__ == "__main__":
    make_scan_lineitem()
    make_sf3_documents()
    make_sf3_embeddings()
