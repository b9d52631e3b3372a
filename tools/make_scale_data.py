"""Synthesize a scale-replica of a testdata directory (the committed,
repeatable form of SCALE.md's 10x sweep — VERDICT r3 #4).

``replicate_sf(src, out, factor)`` writes ``factor`` copies of every table
with shifted keys so the result is a legal, larger instance of the same
schema rather than a degenerate duplicate set:

* all id/key columns shift by ``replica * OFFSET`` (joins still line up
  within a replica, never across);
* ``documents.text`` gets EVERY token suffixed with ``\x1f<replica>`` (unit
  separator — a bare digit suffix would collide with digit-final base
  tokens), so the
  replicas share no vocabulary — replicating text verbatim (or perturbing
  only one token, as the first cut of this script did) makes each replica
  a TRUE near-duplicate of its base, and the pair-generating operators
  then correctly emit quadratically more pairs: the 10x soak measured
  dedup_simhash_pairs at 67 s purely from that data artifact. A linearity
  check must vary data volume, not duplicate-cluster size;
* ``embeddings.embedding`` gets a tiny deterministic per-replica
  perturbation on one dimension for the same reason.

Driver-side pandas per table keeps this simple; source tables at sf0.1 fit
trivially (the big one is 600k lineitem rows).
"""

from __future__ import annotations

import os

OFFSET = 1 << 33

# key columns to shift per table (foreign keys shift identically so
# intra-replica joins keep working)
_SHIFT = {
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id", "doc_id"],
}
_SMALL = ["region", "nation", "supplier", "part"]


def replicate_sf(src_dir: str, out_dir: str, factor: int) -> str:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, f".complete_x{factor}")
    if os.path.exists(done_marker):
        return out_dir
    for name in _SMALL:
        tbl = pq.read_table(f"{src_dir}/{name}.parquet")
        pq.write_table(tbl, f"{out_dir}/{name}.parquet")
    for name, keys in _SHIFT.items():
        pdf = pq.read_table(f"{src_dir}/{name}.parquet").to_pandas()
        parts = []
        for rep in range(factor):
            p = pdf.copy()
            for k in keys:
                if k in p.columns:
                    p[k] = p[k] + rep * OFFSET
            if name == "documents" and rep > 0:
                # unit-separator delimited: a bare digit suffix collides
                # with digit-final base tokens ("foo"+"1" == base "foo1")
                suffix = "\x1f" + str(rep)
                p["text"] = p["text"].map(
                    lambda t, s=suffix: " ".join(w + s for w in t.split(" "))
                )
            if name == "embeddings" and rep > 0:
                p["embedding"] = p["embedding"].map(
                    lambda v, r=rep: [float(v[0]) + r * 0.001] + [float(x) for x in v[1:]]
                )
            parts.append(p)
        big = pd.concat(parts, ignore_index=True)
        # many row groups, not one: a parquet ROW GROUP is the minimum
        # split unit, and a single-row-group table caps every scan (and
        # all map-side work before the first shuffle) at ~1 effective
        # task no matter what minPartitionNum asks for — measured on the
        # full-corpus ppjoin profile: compute-heavy tokenize stages ran
        # (1+1)/2 tasks on a 32-core box. 64+ groups mirrors a real
        # many-file 100 TB table; per-group size stays >= 1024 rows.
        pq.write_table(
            pa.Table.from_pandas(big, preserve_index=False),
            f"{out_dir}/{name}.parquet",
            row_group_size=max(1024, len(big) // 64),
        )
    with open(done_marker, "w") as f:
        f.write("ok")
    return out_dir


if __name__ == "__main__":
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparsity_scale_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(replicate_sf(src, out, factor))
