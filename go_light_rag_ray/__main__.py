"""Job entrypoint: ``python -m go_light_rag_ray`` — the ``ray job submit``
surface (north-star launch path).

    ray job submit -- python -m go_light_rag_ray \
        --input /data/documents --ckpt /data/ckpt --out /data/graph \
        [--shards 64] [--flat-adapter] [--prior /data/graph-prev] \
        [--rules word_cooccurrence] [--merge-cap 512]

Runs the checkpointed pipeline (resumable per shard via manifests), then
materializes partitioned node/edge tables + GRAPH-MANIFEST.json.  With
``--prior`` the run merges into an existing graph snapshot (incremental
insert).  This CLI owns its Ray session; on a cluster, ``ray.init()``
attaches to the running cluster via RAY_ADDRESS.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="go_light_rag_ray")
    ap.add_argument("--input", required=True, help="documents table (parquet dir/file or lance)")
    ap.add_argument("--dir-source", action="store_true",
                    help="--input is a raw source TREE: walk + .gitignore + "
                         "extension-routed chunking (go/markdown/default), "
                         "unchanged files skipped via the ckpt hash store")
    ap.add_argument("--ckpt", required=True, help="checkpoint dir (manifests + staged mentions)")
    ap.add_argument("--out", required=True, help="output graph dir (nodes/, edges/, manifest)")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--flat-adapter", action="store_true",
                    help="input is the flat (doc_id, text) shape; adapt to spans")
    ap.add_argument("--prior", default=None, help="prior graph dir for incremental insert")
    ap.add_argument("--rules", default="pattern")
    ap.add_argument("--tokenizer", default="regex")
    ap.add_argument("--merge-cap", type=int, default=512)
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--num-buckets", type=int, default=16, help="output hash buckets")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    import ray.data

    from .pipelines.kg import (
        Handler,
        build_graph,
        chunk_documents,
        extract_mentions,
        run_kg,
        write_graph,
    )
    from .sources import io as table_io
    from .stages.canonicalize import canonicalize_incremental

    handler = Handler(
        rules=args.rules,
        tokenizer=args.tokenizer,
        merge_cap=args.merge_cap,
        salt_buckets=args.salt_buckets,
        content_mode="text" if args.flat_adapter else "spans",
    )
    if args.flat_adapter:
        handler.content_mode = "spans"  # adapter emits the spans shape

    if args.prior:
        import os

        docs = table_io.read_documents(args.input)
        if args.flat_adapter:
            docs = docs.map_batches(
                table_io.flat_documents_as_interleaved, batch_format="pyarrow"
            )
        mentions = extract_mentions(chunk_documents(docs, handler), handler)
        prior_nodes = ray.data.read_parquet(os.path.join(args.prior, "nodes"))
        prior_edges = ray.data.read_parquet(os.path.join(args.prior, "edges"))

        def as_graph_rows(kind):
            from .stages.canonicalize import GRAPH_SCHEMA

            def f(b):
                import pyarrow as pa

                rows = []
                for r in b.to_pylist():
                    rows.append({
                        "kind": kind,
                        "entity_id": r.get("entity_id", ""),
                        "entity_type": r.get("entity_type", ""),
                        "src": r.get("src", ""), "tgt": r.get("tgt", ""),
                        "weight": r.get("weight", 0.0),
                        "descriptions": r.get("descriptions", []),
                        "keywords": r.get("keywords", []),
                        "source_ids": r.get("source_ids", []),
                        "mention_count": r.get("mention_count", 0),
                        # preserve the type-vote tally when the prior
                        # snapshot has it (exact incremental re-entry)
                        "type_names": r.get("type_names") or [],
                        "type_votes": r.get("type_votes") or [],
                    })
                return pa.Table.from_pylist(rows, schema=GRAPH_SCHEMA)
            return f

        prior = prior_nodes.map_batches(
            as_graph_rows("node"), batch_format="pyarrow"
        ).union(prior_edges.map_batches(
            as_graph_rows("edge"), batch_format="pyarrow"
        ))
        graph = canonicalize_incremental(
            mentions, prior, salt_buckets=handler.salt_buckets,
            batch_size=handler.mention_batch_size, merge_cap=handler.merge_cap,
        )
    elif args.dir_source:
        import os

        from .pool import auto_pool
        from .sources.dirwalk import read_directory_documents, save_hash_store
        from .stages.chunker import ChunkerConfig
        from .stages.handlers import HandlerChunker

        os.makedirs(args.ckpt, exist_ok=True)
        hash_store = os.path.join(args.ckpt, "file_hashes.json")
        docs = read_directory_documents(args.input, hash_store=hash_store)
        docs = docs.materialize()
        if docs.count() == 0:
            # every file unchanged — nothing to do (the reference logs
            # "File unchanged, skipping" per file and inserts nothing)
            print(json.dumps({"lineage": {"input": args.input,
                                          "ckpt": args.ckpt},
                              "counters": {"nodes": 0, "edges": 0},
                              "skipped": "all files unchanged"}))
            ray.shutdown()
            return 0
        chunks = docs.map_batches(
            HandlerChunker,
            fn_constructor_kwargs={"config": ChunkerConfig(
                max_tokens=handler.chunk_max_tokens,
                overlap_tokens=handler.chunk_overlap_tokens,
                tokenizer=handler.tokenizer,
                content_mode="text",
                doc_id_format="{}",
            )},
            batch_format="pyarrow",
            concurrency=auto_pool(),
        )
        mentions = extract_mentions(chunks, handler)
        graph = build_graph(mentions, handler)
        graph = graph.materialize()  # before the hash store advances
        save_hash_store(docs, hash_store)
    else:
        graph = run_kg(args.input, args.ckpt, handler, n_shards=args.shards,
                       flat_adapter=args.flat_adapter)

    manifest = write_graph(
        graph, args.out, num_buckets=args.num_buckets,
        lineage={"input": args.input, "ckpt": args.ckpt,
                 "prior": args.prior or "", "rules": args.rules},
    )
    print(json.dumps(manifest))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
