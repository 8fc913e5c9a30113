"""Embedding encoder stage (reference T5, storage/embed.go:5-6,
chromem.go:31-44): content → vector, as an actor-pool ``map_batches``.

The reference calls OpenAI's embedding endpoint per upsert; here encoding
is a batched actor stage writing an ``embeddings`` table
(chunk_id, model, vector list<float32>, dims — the ContentEmbedding shape,
reference rag.go:163-176).  No model weights exist in this container, so
the default encoder is a deterministic hash-projection (real plumbing,
fake features — same pattern as stages/multimodal.py); a real
sentence-transformers backend slots in behind the import guard.

The hash projection is still a genuine vector-space embedding of token
multisets: each token maps to a stable pseudo-random unit direction
(seeded by md5), a document embeds as the L2-normalized sum — so shared
vocabulary ⇒ cosine similarity, which makes the downstream ANN/dedup
stages meaningfully testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

try:  # pragma: no cover - not in this container
    import sentence_transformers  # type: ignore  # noqa: F401

    HAVE_ST = True
except ImportError:
    HAVE_ST = False

EMBEDDINGS_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("model", pa.string()),
        ("vector", pa.list_(pa.float32())),
        ("dims", pa.int32()),
    ]
)


class HashEncoder:
    """Actor-pool encoder: deterministic token-direction sum.

    Per-actor state: the token→direction cache (shared across every batch
    this actor sees — the analog of pinned model weights), capped at
    ``CACHE_CAP`` entries with clear-on-full eviction so a long-lived actor
    over web-scale vocabulary stays bounded (same scheme as
    ``dedup.MinHasher``/``SimHasher``).
    """

    CACHE_CAP = 1 << 20

    def __init__(self, dims: int = 64, model_name: str = "hash-proj-v1") -> None:
        self.dims = dims
        self.model_name = model_name
        self._dirs: dict[str, np.ndarray] = {}

    def _direction(self, token: str) -> np.ndarray:
        d = self._dirs.get(token)
        if d is None:
            seed = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
            rng = np.random.default_rng(seed)
            d = rng.standard_normal(self.dims)
            d /= np.linalg.norm(d)
            if len(self._dirs) >= self.CACHE_CAP:
                self._dirs.clear()
            self._dirs[token] = d
        return d

    def encode(self, text: str) -> np.ndarray:
        toks = (text or "").split()
        if not toks:
            return np.zeros(self.dims)
        v = np.zeros(self.dims)
        for t in toks:
            v += self._direction(t)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column("chunk_id").to_pylist()
        texts = b.column("content").to_pylist()
        vecs = [self.encode(t).astype(np.float32).tolist() for t in texts]
        return pa.Table.from_pydict(
            {
                "chunk_id": pa.array(ids, pa.string()),
                "model": pa.array([self.model_name] * len(ids), pa.string()),
                "vector": pa.array(vecs, pa.list_(pa.float32())),
                "dims": pa.array([self.dims] * len(ids), pa.int32()),
            },
            schema=EMBEDDINGS_SCHEMA,
        )


class RealEncoder:  # pragma: no cover - model libs not in this container
    def __init__(self, model_name: str = "all-MiniLM-L6-v2") -> None:
        if not HAVE_ST:
            raise NotImplementedError(
                "real embedding encode requires sentence-transformers; "
                "use HashEncoder"
            )


def encode_chunks(
    chunks: ray.data.Dataset,
    dims: int = 64,
    batch_size: int = 512,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """chunks (chunk_id, content) → embeddings table.  Batched actor pool;
    size batch × concurrency to the worker heap when vectors are large."""
    from ..pool import auto_pool

    return chunks.map_batches(
        HashEncoder,
        fn_constructor_kwargs={"dims": dims},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
    )


def encode_graph_content(graph: ray.data.Dataset, dims: int = 64) -> ray.data.Dataset:
    """Vector-store content views (reference insert.go:561, 683-685):
    nodes embed name+descriptions, edges embed keywords+src+tgt+descs."""

    def to_content(b: pa.Table) -> pa.Table:
        ids, texts = [], []
        kinds = b.column("kind").to_pylist()
        for i, kind in enumerate(kinds):
            descs = " ".join(b.column("descriptions")[i].as_py())
            if kind == "node":
                eid = b.column("entity_id")[i].as_py()
                ids.append(eid)
                texts.append(f"{eid} {descs}")
            else:
                src = b.column("src")[i].as_py()
                tgt = b.column("tgt")[i].as_py()
                kws = " ".join(b.column("keywords")[i].as_py())
                ids.append(f"{src}-{tgt}")
                texts.append(f"{kws} {src} {tgt} {descs}")
        return pa.Table.from_pydict(
            {"chunk_id": pa.array(ids, pa.string()),
             "content": pa.array(texts, pa.string())}
        )

    return encode_chunks(graph.map_batches(to_content, batch_format="pyarrow"),
                         dims=dims)
