"""Per-stage profile of the flagship KG pipeline (the measure-don't-guess
loop): wall time + Ray Data stats excerpt per stage, with materialize
boundaries so numbers are attributable.

Usage: python tools/profile_kg.py [sf_dir] [--cpus N] [--rep R]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rep", type=int, default=1,
                    help="replicate the corpus N× with distinct ids")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow as pa

    from go_light_rag_ray.pipelines.kg import (
        Handler,
        build_graph,
        chunk_documents,
        extract_mentions,
    )
    from go_light_rag_ray.sources import io as table_io

    docs = table_io.read_documents(
        f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    if args.rep > 1:
        rep = args.rep

        def replicate(b: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            n = b.num_rows
            idx = pa.array(np.tile(np.arange(n, dtype=np.int64), rep))
            suf = pc.cast(pa.array(
                np.repeat(np.arange(rep, dtype=np.int64), n)), pa.string())
            ids = pc.binary_join_element_wise(
                pc.cast(b.column("doc_id").combine_chunks().take(idx),
                        pa.string()),
                pa.array(["r"] * (n * rep), pa.string()), suf, "")
            return pa.table({
                "doc_id": ids,
                "text": b.column("text").combine_chunks().take(idx)})

        docs = docs.map_batches(replicate, batch_format="pyarrow")
    docs = docs.map_batches(
        table_io.flat_documents_as_interleaved, batch_format="pyarrow"
    )
    handler = Handler(tokenizer="regex", rules="word_cooccurrence",
                      content_mode="spans")

    def stage(name, ds):
        t0 = time.perf_counter()
        m = ds.materialize()
        wall = time.perf_counter() - t0
        rows = m.count()
        print(f"{name:12s} {wall:8.2f}s  rows={rows:>10}  blocks={m.num_blocks()}")
        for line in re.findall(r"Operator \d+ [^:]+: .*", m.stats()):
            print("   ", line[:110])
        return m

    docs_m = stage("prep", docs)
    chunks = stage("chunk", chunk_documents(docs_m, handler))
    mentions = stage("extract", extract_mentions(chunks, handler))
    stage("canonicalize", build_graph(mentions, handler))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
