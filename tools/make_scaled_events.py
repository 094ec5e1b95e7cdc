"""Deterministic 5x events fixture for the scaling-slope bench (r7).

tools/make_scaled_documents.py gives the slope bench its second scale
point for the DOCUMENT-heavy operators; the r7 histogram rank-selection
family (q_latency_sla, q_histogram_median, q_ks_drift, q_psi_drift) runs
on ``events``, so this script amplifies sf0.1's events table to 5x
(500,000 rows) while keeping the cost drivers stationary:

- the original 100,000 rows are kept verbatim;
- each synthetic row samples a template row (seeded, with replacement)
  and keeps its event_type, VALUE (resampled i.i.d. from the per-type
  empirical distribution by construction — the template's own value),
  and props; timestamps jitter uniformly inside the original time span
  (so per-day densities scale ~5x); user_id is remapped into a 5x id
  space so per-user event density stays constant rather than deepening.

Output: .scaling/sf0.5/events.parquet (gitignored; seed pinned).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/events.parquet"
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

    event_id = np.asarray(t.column("event_id").to_pylist(), dtype=np.int64)
    ts = np.asarray(t.column("ts").cast(pa.int64()).to_pylist(), dtype=np.int64)
    user_id = np.asarray(t.column("user_id").to_pylist(), dtype=np.int64)
    etype = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    value = np.asarray(t.column("value").to_pylist(), dtype=np.float64)
    props = np.asarray(t.column("props").to_pylist(), dtype=object)

    extra = n * (SCALE - 1)
    pick = rng.integers(0, n, size=extra)
    lo, hi = ts.min(), ts.max()
    new_ts = rng.integers(lo, hi + 1, size=extra)
    max_user = user_id.max() + 1
    new_user = user_id[pick] + max_user * rng.integers(1, SCALE, size=extra)

    out = pa.table(
        {
            "event_id": pa.array(
                np.concatenate([event_id, event_id.max() + 1 + np.arange(extra)]),
                pa.int64(),
            ),
            "ts": pa.array(
                np.concatenate([ts, new_ts]), pa.int64()
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(
                np.concatenate([user_id, new_user]), pa.int64()
            ),
            "event_type": pa.array(
                np.concatenate([etype, etype[pick]]).tolist(), pa.string()
            ),
            "value": pa.array(
                np.concatenate([value, value[pick]]), pa.float64()
            ),
            "props": pa.array(
                np.concatenate([props, props[pick]]).tolist(), pa.string()
            ),
        }
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(out, os.path.join(OUT_DIR, "events.parquet"))
    print(f"wrote {out.num_rows} rows to {OUT_DIR}/events.parquet")


if __name__ == "__main__":
    main()
