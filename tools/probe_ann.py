#!/usr/bin/env python3
"""ANN-family scale probe (VERDICT r4 #5).

Replicates the sf0.1 embeddings table REP× (default 20× = 40k vectors,
distinct vec_ids; query ids 0..n_queries-1 keep their original vectors)
and runs every ANN variant with a 1000-query broadcast matrix — the
shape the family must hold at web scale: broadcast query side, per-block
partial top-k, bounded merge.

Usage: ray stop --force && python tools/probe_ann.py [--rep 20 --queries 1000]
Owns its Ray session (tools/* rule, CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rep", type=int, default=20)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, ignore_reinit_error=True)

    src = pq.read_table(f"{args.sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    n = src.num_rows
    out_path = f"/tmp/probe_ann_emb_{args.rep}x.parquet"
    if not os.path.exists(out_path):
        ids = src.column("vec_id").to_numpy()
        parts = [src]
        for r in range(1, args.rep):
            parts.append(pa.table({
                "vec_id": pa.array(ids + r * n, pa.int64()),
                "embedding": src.column("embedding")}))
        pq.write_table(pa.concat_tables(parts), out_path)
    n_total = n * args.rep

    res = {"n_vectors": n_total, "rep": args.rep,
           "n_queries": args.queries, "k": args.k, "cpus": args.cpus}

    def emb():
        return ray.data.read_parquet(out_path,
                                     columns=["vec_id", "embedding"])

    def timed(name, fn):
        t0 = time.perf_counter()
        ds = fn()
        rows = ds.count()
        res[name] = {"wall_sec": round(time.perf_counter() - t0, 2),
                     "rows": rows}
        print(name, res[name], flush=True)

    from go_light_rag_ray.stages.quantize import pq_ann_topk
    from go_light_rag_ray.stages.similarity import (ann_topk, ann_topk_ivf,
                                                    ann_topk_lsh)

    Q, K = args.queries, args.k
    timed("ann_topk_brute", lambda: ann_topk(emb(), n_queries=Q, k=K))
    timed("ann_radius", lambda: ann_topk(emb(), n_queries=Q, k=K,
                                         min_sim=0.2))
    timed("ann_topk_lsh", lambda: ann_topk_lsh(emb(), n_queries=Q, k=K,
                                               sign_bits=4))
    timed("ann_topk_ivf", lambda: ann_topk_ivf(emb(), n_queries=Q, k=K,
                                               n_centroids=32))
    timed("ann_topk_pq_1q", lambda: pq_ann_topk(emb(), n_subspaces=4,
                                                n_centroids=8, k=K))
    timed("ann_topk_pq_multi", lambda: pq_ann_topk(
        emb(), n_subspaces=4, n_centroids=8, k=K, n_queries=Q))
    from go_light_rag_ray.stages.quantize import ann_topk_ivfpq
    timed("ann_topk_ivfpq", lambda: ann_topk_ivfpq(
        emb(), n_queries=Q, k=K, n_centroids=32, n_subspaces=4,
        n_pq_centroids=8, nprobe=2))
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
