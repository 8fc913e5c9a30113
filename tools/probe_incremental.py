#!/usr/bin/env python3
"""Incremental-family scale probe (VERDICT r4 #3).

Builds a replicated spans corpus (default 2000x sf0.1 = 10M docs), persists
its mention stream once to parquet (the staged-ingest layout incremental
ops consume), materializes the prior canonical graph, then measures:

  - full rebuild wall (the baseline an incremental op must beat),
  - delete_documents of a 1% id sample (wall + driver max RSS),
  - insert_documents of a 1% mid-corpus batch (wall + driver max RSS),

at two delete sizes to show how cost tracks the affected-key slice.

Closed-vocabulary caveat this probe quantifies rather than hides: with
word_cooccurrence rules every document touches the same gazetteer keys,
so even a 0.1% delete affects ~ALL keys and the rebuild slice is ~the
whole retained mention stream — the probe's value is showing the
incremental path's cost structure (one pruned scan + one canonicalize,
no re-chunk/re-extract of the corpus) and the flat driver RSS, not a
sublinear wall, which only an open vocabulary could produce.

Usage: ray stop --force && python tools/probe_incremental.py [--rep 2000]
Owns its Ray session (tools/* rule, CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rep", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--frac", type=float, default=0.01)
    ap.add_argument("--out", default="/tmp/probe_incremental")
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from go_light_rag_ray.pipelines.kg import (
        Handler, build_graph, chunk_documents, delete_documents,
        extract_mentions, insert_documents)
    from go_light_rag_ray.sources import io as table_io

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, ignore_reinit_error=True)

    rep = args.rep

    def replicate_interleaved(b: pa.Table):
        # the bench.py kg_scale generator shape: replicate + adapt to the
        # spans schema inside one yielding task (~64k docs per block)
        n = b.num_rows
        if n == 0:
            return
        per = max(1, 65536 // n)
        ids = pc.cast(b.column("doc_id").combine_chunks(), pa.string())
        texts = b.column("text").combine_chunks()
        for r0 in range(0, rep, per):
            k = min(rep, r0 + per) - r0
            idx = pa.array(np.tile(np.arange(n, dtype=np.int64), k))
            suffix = pc.cast(pa.array(np.repeat(
                np.arange(r0, r0 + k, dtype=np.int64), n)), pa.string())
            out = pa.table({
                "doc_id": pc.binary_join_element_wise(
                    ids.take(idx), pa.array(["r"] * (n * k), pa.string()),
                    suffix, ""),
                "text": texts.take(idx)})
            yield table_io.flat_documents_as_interleaved(out)

    def corpus():
        return (table_io.read_documents(
                    f"{args.sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
                .repartition(256)
                .map_batches(replicate_interleaved, batch_format="pyarrow",
                             batch_size=20, num_cpus=0.9))

    handler = Handler(tokenizer="regex", rules="word_cooccurrence",
                      content_mode="spans")
    import pyarrow.parquet as pq
    n_seed = pq.ParquetFile(
        f"{args.sf_dir}/documents.parquet").metadata.num_rows
    n_docs = n_seed * rep
    res = {"n_docs": n_docs, "rep": rep, "cpus": args.cpus}

    # ---- persist the mention stream once (staged-ingest layout) --------
    ment_dir = f"{args.out}/mentions"
    t0 = time.perf_counter()
    extract_mentions(chunk_documents(corpus(), handler),
                     handler).write_parquet(ment_dir)
    res["mentions_persist_sec"] = round(time.perf_counter() - t0, 1)
    mentions = ray.data.read_parquet(ment_dir)
    res["n_mentions"] = mentions.count()

    # ---- prior graph + the full-rebuild baseline ------------------------
    t0 = time.perf_counter()
    prior = build_graph(ray.data.read_parquet(ment_dir),
                        handler).materialize()
    res["full_rebuild_from_mentions_sec"] = round(time.perf_counter() - t0, 1)
    res["graph_rows"] = prior.count()

    # ---- doc id universe for sampling -----------------------------------
    seed_ids = pq.read_table(f"{args.sf_dir}/documents.parquet",
                             columns=["doc_id"]).column("doc_id").to_pylist()

    def sample_ids(frac: float) -> list[str]:
        k = max(1, int(n_docs * frac))
        rng = np.random.default_rng(7)
        seeds = rng.integers(0, n_seed, k)
        reps = rng.integers(0, rep, k)
        return sorted({f"doc-{seed_ids[s]}r{r}" for s, r in zip(seeds, reps)})

    for frac in (0.001, args.frac):
        ids = sample_ids(frac)
        r0 = rss_mb()
        t0 = time.perf_counter()
        out = delete_documents(prior, ray.data.read_parquet(ment_dir),
                               ids, handler)
        rows = out.count()
        res[f"delete_{frac}"] = {
            "n_ids": len(ids), "wall_sec": round(time.perf_counter() - t0, 1),
            "rows": rows, "driver_rss_mb_before": round(r0),
            "driver_rss_mb_after": round(rss_mb())}

    # ---- 1% mid-corpus insert -------------------------------------------
    k = max(1, int(n_docs * args.frac))
    rng = np.random.default_rng(11)
    seeds = rng.integers(0, n_seed, k)
    texts = pq.read_table(f"{args.sf_dir}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    # 'q' < 'r' lexicographically: the new ids sort BETWEEN existing
    # replicas of the same seed — a genuine mid-corpus insert
    flat = pa.table({
        "doc_id": pa.array([f"{seed_ids[s]}q{j}" for j, s in enumerate(seeds)],
                           pa.string()),
        "text": pa.array([texts[s] for s in seeds], pa.string())})
    new_docs = ray.data.from_arrow(
        table_io.flat_documents_as_interleaved(flat))
    r0 = rss_mb()
    t0 = time.perf_counter()
    out = insert_documents(prior, ray.data.read_parquet(ment_dir),
                           new_docs, handler)
    rows = out.count()
    res["insert_0.01"] = {
        "n_new_docs": k, "wall_sec": round(time.perf_counter() - t0, 1),
        "rows": rows, "driver_rss_mb_before": round(r0),
        "driver_rss_mb_after": round(rss_mb())}

    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
