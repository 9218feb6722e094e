"""Generate the sf1-class soak corpus: 10x documents/embeddings.

Round-5 verdict task #6: soak the dedup/ANN family beyond sf0.1 and
measure scaling exponents against the claimed Sigma-k^2 / O(N^2/K)
bounds.  This synthesizes NOTHING new semantically — it tiles the
driver's own sf0.1 tables into 10 cohorts engineered so the
duplicate/similarity structure scales LINEARLY by construction:

- documents: cohort k holds every sf0.1 document with
  doc_id' = doc_id + (max_id+1)*k; for k > 0 every whitespace word gets a
  ``~k`` suffix, so each cohort's intra-cohort near-dup structure is
  isomorphic to the original while cross-cohort token sets are
  disjoint (no artificial 10-way duplicate clusters whose pair counts
  would scale quadratically no matter what the engine does).
- embeddings: cohort k applies a seeded dimension permutation to every
  vector (norm-preserving, intra-cohort geometry intact, cross-cohort
  cosines scrambled to background level).

Output: /tmp/sf1ish/{documents,embeddings}.parquet as multi-file
datasets (32 files each) so scans arrive pre-parallelized, the way
real multi-file tables do.  The soak queries only read these two
tables.  Usage: python tools/make_sf1ish.py [out_dir] [n_cohorts]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1ish"
    n_cohorts = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    embs = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    # cohort id stride = max_id + 1, NOT row count: if the source ids
    # are ever sparse (max id >= row count), striding by len() would
    # collide cohorts on doc_id and silently corrupt the
    # linear-by-construction duplicate structure the soak relies on.
    doc_stride = int(docs["doc_id"].max()) + 1
    vec_stride = int(embs["vec_id"].max()) + 1
    dim = len(embs["embedding"].iloc[0])

    doc_parts, emb_parts = [], []
    for k in range(n_cohorts):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + doc_stride * k
        if k > 0:
            suffix = f"~{k}"
            d["text"] = d["text"].map(
                lambda t, s=suffix: re.sub(r"(\S+)", r"\1" + s, t)
                if isinstance(t, str)
                else t
            )
            d["n_chars"] = d["text"].map(
                lambda t: len(t) if isinstance(t, str) else 0
            )
        doc_parts.append(d)

        e = embs.copy()
        e["vec_id"] = e["vec_id"] + vec_stride * k
        if k > 0:
            perm = np.random.RandomState(k).permutation(dim)
            e["embedding"] = e["embedding"].map(
                lambda v, p=perm: np.asarray(v)[p]
            )
        emb_parts.append(e)

    # events (round 8): cohort k shifts user ids by a stride and
    # timestamps by k * 35 days, so each cohort's funnel/cohort/RFM
    # structure is isomorphic to the original while user populations
    # AND calendar weeks are disjoint across cohorts — per-user state,
    # cohort cells, and funnel counts all scale exactly linearly by
    # construction.
    evs = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    ev_stride = int(evs["event_id"].max()) + 1
    user_stride = int(evs["user_id"].max()) + 1
    ev_parts = []
    for k in range(n_cohorts):
        ev = evs.copy()
        ev["event_id"] = ev["event_id"] + ev_stride * k
        ev["user_id"] = ev["user_id"] + user_stride * k
        ev["ts"] = ev["ts"] + pd.Timedelta(days=35 * k)
        ev_parts.append(ev)
    all_evs = pd.concat(ev_parts, ignore_index=True)

    # dims (round 8): copied verbatim — the tiled facts keep their
    # original foreign keys (only the fact's own primary key strides),
    # so every cohort joins the same dimension rows, and dim-side
    # broadcast sizes stay constant under the 10x soak (as they would
    # at 100 TB: facts grow, dims don't).
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(
            f"{SRC}/{dim}.parquet", os.path.join(out_dir, f"{dim}.parquet")
        )

    # lineitem/orders (round 8): id-strided tiling with ONE SHARED
    # order-key stride, because shipping_priority joins the tiled
    # facts on l_orderkey = o_orderkey — independent per-table strides
    # would silently mis-join every cohort k > 0 whenever the two
    # maxes differ (review-found; they happen to be equal today).
    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    ok_stride = max(int(li["l_orderkey"].max()), int(od["o_orderkey"].max())) + 1
    fact_parts = {}
    for name, key, t in (
        ("lineitem", "l_orderkey", li),
        ("orders", "o_orderkey", od),
    ):
        parts = []
        for k in range(n_cohorts):
            c = t.copy()
            c[key] = c[key] + ok_stride * k
            parts.append(c)
        fact_parts[name] = pd.concat(parts, ignore_index=True)

    all_docs = pd.concat(doc_parts, ignore_index=True)
    all_embs = pd.concat(emb_parts, ignore_index=True)

    for name, pdf in (
        ("documents", all_docs),
        ("embeddings", all_embs),
        ("events", all_evs),
        ("lineitem", fact_parts["lineitem"]),
        ("orders", fact_parts["orders"]),
    ):
        path = os.path.join(out_dir, f"{name}.parquet")
        os.makedirs(path, exist_ok=True)
        n_files = 32
        chunk = (len(pdf) + n_files - 1) // n_files
        for i in range(n_files):
            part = pdf.iloc[i * chunk : (i + 1) * chunk]
            if len(part) == 0:
                continue
            pq.write_table(
                pa.Table.from_pandas(part, preserve_index=False),
                os.path.join(path, f"part-{i:05d}.parquet"),
            )
        print(f"wrote {path}: {len(pdf)} rows, {n_files} files")


if __name__ == "__main__":
    main()
