"""Multimodal span stages: media columns as opaque refs + typed metadata.

The interleaved documents table (input_hint) carries media spans
(kind ∈ {image, audio, video}, ``media_ref``) alongside text.  The decode
libraries (PIL / torchaudio / av) are NOT in this container, so the decode
itself is stubbed — ``backend="real"`` raises ``NotImplementedError``
unless the lib imports — but all the Ray-side plumbing is real and tested:
span explosion, actor-pool featurizer with per-actor state, stable output
schema, small-batch sizing for large binary payloads.

``backend="fake"`` produces deterministic md5-derived features so the
DuckDB oracle can value-check the full dataflow.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

try:  # pragma: no cover - not in this container
    from PIL import Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_index", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("f0", pa.int32()),
        ("f1", pa.int32()),
        ("f2", pa.int32()),
        ("f3", pa.int32()),
    ]
)


def extract_media_spans(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Explode non-text spans of the interleaved table →
    (doc_id, span_index, kind, media_ref) rows.  Stateless flat-map; span
    order (the per-row invariant) is preserved in ``span_index``."""

    def explode(b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_pylist()
        spans_col = b.column("spans").to_pylist()
        out_d, out_i, out_k, out_r = [], [], [], []
        for did, spans in zip(doc_ids, spans_col):
            for i, sp in enumerate(spans or []):
                if sp["kind"] != "text":
                    out_d.append(did)
                    out_i.append(i)
                    out_k.append(sp["kind"])
                    out_r.append(sp["media_ref"])
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_d, pa.string()),
             "span_index": pa.array(out_i, pa.int32()),
             "kind": pa.array(out_k, pa.string()),
             "media_ref": pa.array(out_r, pa.string())}
        )

    return docs.map_batches(explode, batch_format="pyarrow")


class MediaFeaturizer:
    """Actor-pool stage: media ref → decoded metadata + feature vector.

    State (the decoder / model) is built once per actor in ``__init__``;
    ``__call__`` is per batch.  With real payloads, pass a small
    ``batch_size`` to ``map_batches`` so batch × concurrency fits the
    worker heap (binary payloads are large).

    fake backend: width = 64 + h[0] % 192, height = 64 + h[1] % 192,
    f_k = byte k+2 of md5(media_ref) — deterministic and SQL-replicable.
    """

    def __init__(self, backend: str = "fake") -> None:
        if backend == "real" and not HAVE_PIL:
            raise NotImplementedError(
                "real media decode requires PIL/torchaudio/av, not present "
                "in this container; use backend='fake'"
            )
        self.backend = backend

    def _decode_real(self, media_ref: str):  # pragma: no cover
        raise NotImplementedError("fetch+decode of real media payloads")

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.backend == "real":  # pragma: no cover
            self._decode_real("")
        refs = b.column("media_ref").to_pylist()
        w, h, f = [], [], [[] for _ in range(4)]
        for ref in refs:
            digest = hashlib.md5((ref or "").encode()).digest()
            w.append(64 + digest[0] % 192)
            h.append(64 + digest[1] % 192)
            for k in range(4):
                f[k].append(digest[k + 2])
        cols = {
            "doc_id": b.column("doc_id"),
            "span_index": b.column("span_index"),
            "kind": b.column("kind"),
            "media_ref": b.column("media_ref"),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
        }
        for k in range(4):
            cols[f"f{k}"] = pa.array(f[k], pa.int32())
        return pa.Table.from_pydict(cols, schema=MEDIA_FEATURES_SCHEMA)


def featurize_media(
    docs: ray.data.Dataset,
    backend: str = "fake",
    batch_size: int = 64,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """interleaved docs → media feature table (the full multimodal path).
    The pool sizes to the cluster by default (``pool.auto_pool`` — the
    round-2 fixed-(1,4) lesson); pass ``concurrency`` to pin it."""
    from ..pool import auto_pool

    return extract_media_spans(docs).map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=auto_pool(concurrency),
    )


def frame_sample_refs(
    media: ray.data.Dataset, fps_mod: int = 4
) -> ray.data.Dataset:
    """Video frame sampling (plumbing): each ``video`` span expands to
    1 + md5[3] % fps_mod frame refs ``ref#frame{i}``; other kinds pass
    through with frame 0.  Deterministic, SQL-replicable."""

    def sample(b: pa.Table) -> pa.Table:
        kinds = b.column("kind").to_pylist()
        refs = b.column("media_ref").to_pylist()
        docs = b.column("doc_id").to_pylist()
        idxs = b.column("span_index").to_pylist()
        out = {"doc_id": [], "span_index": [], "kind": [], "frame_ref": []}
        for did, si, kind, ref in zip(docs, idxs, kinds, refs):
            if kind == "video":
                n = 1 + hashlib.md5((ref or "").encode()).digest()[3] % fps_mod
            else:
                n = 1
            for i in range(n):
                out["doc_id"].append(did)
                out["span_index"].append(si)
                out["kind"].append(kind)
                out["frame_ref"].append(f"{ref}#frame{i}")
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out["doc_id"], pa.string()),
             "span_index": pa.array(out["span_index"], pa.int32()),
             "kind": pa.array(out["kind"], pa.string()),
             "frame_ref": pa.array(out["frame_ref"], pa.string())}
        )

    return media.map_batches(sample, batch_format="pyarrow")
