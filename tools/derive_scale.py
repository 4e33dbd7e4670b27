"""Derive a larger scale factor from the driver's sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). SCALING.md
argues per-family linear scaling; this tool substantiates it with a real
10x data point by deriving an sf1-equivalent dataset under
``<repo>/.derived/sf1`` (gitignored) without touching ``/root/testdata``.

Each derived table is R=10 replicas of the sf0.1 table, transformed so
the *workload shape* scales the way an organically generated sf1 would:

- ``region``/``nation`` — dimension tables, copied unchanged (TPC-H
  likewise holds them constant across scale factors).
- ``customer``/``supplier``/``part``/``orders``/``lineitem`` — replica r
  offsets every key column by ``r * (max_key + 1)`` consistently across
  tables, so foreign keys keep resolving and per-key join/agg densities
  stay constant (10x keys, not 10x rows per key).
- ``events`` — ``event_id``/``user_id`` strided the same way: 10x users
  with unchanged per-user event density, so session/window state scales
  in keys (the 100 TB direction) rather than in per-key row counts.
- ``documents`` — replica 0 is the original corpus; replicas 1..9 apply
  a per-replica random *bijection* on the word vocabulary. A bijection
  on words induces a bijection on shingles, so exact-dup groups, n-gram
  Jaccard similarities, and minhash/simhash near-dup structure are
  preserved EXACTLY within each replica (the planted pairs scale 10x),
  while cross-replica docs share almost no shingles (a random
  permutation of a ~30-word vocab has ~1 expected fixed point) — i.e.
  near-dup candidate counts scale linearly, not quadratically, exactly
  as a 10x organic corpus would.
- ``embeddings`` — replica r applies a fixed random orthogonal rotation
  (QR of a seeded Gaussian): cosine similarities within a replica are
  preserved exactly (planted near-dup/ANN structure scales 10x), while
  cross-replica cosines are scrambled to the random-vector baseline.

Everything is seeded; reruns are byte-stable. Usage:

    python tools/derive_scale.py [--replicas 10] [--out .derived/sf1]
"""
from __future__ import annotations

import argparse
import os
import re

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 20260814

# key columns to stride, per table: {column: table_that_owns_the_key}
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events:event_id", "user_id": "events:user_id"},
}
COPY_ONLY = ["region", "nation"]


def _stride(con: duckdb.DuckDBPyConnection, owner: str) -> int:
    if ":" in owner:
        tbl, col = owner.split(":")
    else:
        tbl, col = owner, None
        col = {
            "customer": "c_custkey",
            "supplier": "s_suppkey",
            "part": "p_partkey",
            "orders": "o_orderkey",
        }[tbl]
    return (
        con.sql(f"select max({col}) + 1 from '{SRC}/{tbl}.parquet'").fetchone()[0]
    )


def derive_relational(out: str, replicas: int) -> None:
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.sql(
            f"copy (select * from '{SRC}/{t}.parquet') to '{out}/{t}.parquet'"
        )
        print(f"{t}: copied (dimension)")
    for t, keys in KEYED.items():
        strides = {c: _stride(con, owner) for c, owner in keys.items()}
        cols = [
            r[0]
            for r in con.sql(
                f"describe select * from '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for r in range(replicas):
            proj = ", ".join(
                f"({c} + {r * strides[c]}) as {c}" if c in strides else c
                for c in cols
            )
            selects.append(f"select {proj} from '{SRC}/{t}.parquet'")
        union = " union all ".join(selects)
        con.sql(f"copy ({union}) to '{out}/{t}.parquet'")
        n = con.sql(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({replicas} strided replicas)")


def derive_documents(out: str, replicas: int) -> None:
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    texts = tbl.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.split()})
    rng = np.random.RandomState(SEED)
    doc_stride = int(max(tbl.column("doc_id").to_pylist())) + 1
    parts = []
    for r in range(replicas):
        if r == 0:
            parts.append(tbl)
            continue
        perm = rng.permutation(len(vocab))
        mapping = {vocab[i]: vocab[perm[i]] for i in range(len(vocab))}
        pat = re.compile(r"\S+")
        new_texts = [pat.sub(lambda m: mapping[m.group(0)], t) for t in texts]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(
                        [d + r * doc_stride for d in tbl.column("doc_id").to_pylist()],
                        type=tbl.schema.field("doc_id").type,
                    ),
                    "text": pa.array(new_texts),
                    "lang": tbl.column("lang"),
                    "source": tbl.column("source"),
                    "n_chars": pa.array(
                        [len(t) for t in new_texts],
                        type=tbl.schema.field("n_chars").type,
                    ),
                }
            )
        )
    combined = pa.concat_tables(parts)
    pq.write_table(combined, f"{out}/documents.parquet")
    print(f"documents: {combined.num_rows} rows ({replicas} vocab-permuted replicas)")


def derive_embeddings(out: str, replicas: int) -> None:
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    rng = np.random.RandomState(SEED + 1)
    vec_stride = int(max(tbl.column("vec_id").to_pylist())) + 1
    parts = []
    for r in range(replicas):
        if r == 0:
            rotated = vecs
        else:
            q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            rotated = (vecs @ q.astype(np.float32)).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        [v + r * vec_stride for v in tbl.column("vec_id").to_pylist()],
                        type=tbl.schema.field("vec_id").type,
                    ),
                    "embedding": pa.array(
                        [row.tolist() for row in rotated],
                        type=tbl.schema.field("embedding").type,
                    ),
                    "label": tbl.column("label"),
                }
            )
        )
    combined = pa.concat_tables(parts)
    pq.write_table(combined, f"{out}/embeddings.parquet")
    print(f"embeddings: {combined.num_rows} rows ({replicas} rotated replicas)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(__file__)), ".derived/sf1"),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    derive_relational(args.out, args.replicas)
    derive_documents(args.out, args.replicas)
    derive_embeddings(args.out, args.replicas)
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
