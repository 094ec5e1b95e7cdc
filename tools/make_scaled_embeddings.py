"""Deterministic 5x embeddings fixture for the scaling-slope bench (r8).

The r8 linear-algebra operators (q_pca_power's Gram accumulation,
q_label_noise's centroid build + distance fold) run on ``embeddings``;
this script amplifies sf0.1's embeddings table to 5x while keeping the
cost drivers stationary:

- the original rows are kept verbatim;
- each synthetic row samples a template row (seeded, with replacement)
  and keeps its VECTOR and LABEL unchanged — the Gram matrix and label
  centroids of the scaled corpus stay statistically identical, so any
  time growth is attributable to row count alone;
- vec_id is remapped into a 5x id space (max_id+1 offset blocks).

Output: .scaling/sf0.5/embeddings.parquet (gitignored; seed pinned).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaling",
    "sf0.5",
)
SEED = 1337
SCALE = 5


def main() -> None:
    t = pq.read_table(SRC)
    n = t.num_rows
    rng = np.random.default_rng(SEED)

    vec_id = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = t.column("embedding").to_pylist()
    label = np.asarray(t.column("label").to_pylist(), dtype=np.int32)

    extra = n * (SCALE - 1)
    pick = rng.integers(0, n, size=extra)

    out = pa.table(
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
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(out, os.path.join(OUT_DIR, "embeddings.parquet"))
    print(f"wrote {out.num_rows} rows to {OUT_DIR}/embeddings.parquet")


if __name__ == "__main__":
    main()
