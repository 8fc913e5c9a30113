"""Table IO: readers for the documents table and the Lance-or-Parquet sink.

``lance`` is not installed in this container, so ``TableIO`` writes
partitioned Parquet directories with the same fragment/manifest layout
(SURVEY.md §7.0 design decision); when ``lance`` is importable the same
calls target Lance datasets.  Output is always a *directory of part files*
(resumable; never one giant file).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import ray.data

try:  # pragma: no cover - lance not available in this container
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read an interleaved documents table (parquet dir/file or lance)."""
    if HAVE_LANCE and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def flat_documents_as_interleaved(batch: pa.Table) -> pa.Table:
    """Adapter: the driver's flat documents table → the input_hint spans shape.

    One text span per document (offset 0), plus deterministic media spans —
    one ``image`` span per full 40 words of text, ref
    ``media://doc-{id}/{k}`` — so multimodal stages have real rows to chew
    on.  Deterministic and SQL-expressible for the oracle.

    Vectorized (this adapter sits inside the timed flagship path): span
    structs assemble from flat Arrow arrays + offsets — no per-doc Python.

    ASCII contract (deliberate, see CLAUDE.md's ``pc.ascii_*`` rule): media
    span ``offset`` is the text's BYTE length (``pc.binary_length``), and
    word counts come from ``ascii_split_whitespace`` — both byte-identical
    to code-point semantics for the ASCII corpus this engine targets, but a
    non-ASCII input would see byte offsets (not code points) and ASCII-only
    whitespace splitting.  Matching the oracle's ``\\S+`` requires exactly
    this pairing.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..schemas import DOCUMENTS_SCHEMA

    n = batch.num_rows
    if n == 0:
        return DOCUMENTS_SCHEMA.empty_table()
    doc_ids = pc.binary_join_element_wise(
        pa.array(["doc-"] * n, pa.string()),
        pc.cast(batch.column("doc_id"), pa.string()), "").combine_chunks()
    texts = pc.cast(batch.column("text"), pa.string()).combine_chunks()
    texts = texts.fill_null("")
    # words per doc → media span count (one image per full 40 words);
    # \S+ count = non-empty split pieces (ascii_split_whitespace pads
    # boundary whitespace runs with empty strings)
    split = pc.ascii_split_whitespace(texts)
    par_w = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(pc.list_flatten(split), "").to_numpy(
        zero_copy_only=False)
    n_words = np.bincount(par_w[nonempty], minlength=n).astype(np.int64)
    n_media = n_words // 40
    lens = 1 + n_media
    offsets = pa.array(np.concatenate(([0], np.cumsum(lens))).astype(np.int32))
    total = int(lens.sum())
    # flat span fields: position 0 in each doc = the text span, the rest
    # are image spans with k = position - 1
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = np.arange(total) - np.repeat(starts, lens)
    parent = np.repeat(np.arange(n), lens)
    is_text = pos == 0
    kind = pa.array(np.where(is_text, "text", "image"), pa.string())
    text_flat = pc.if_else(pa.array(is_text),
                           texts.take(pa.array(parent)), "")
    tlen = pc.binary_length(texts).cast(pa.int32()).to_numpy(
        zero_copy_only=False)
    offset_col = pa.array(np.where(is_text, 0, tlen[parent]), pa.int32())
    media = pc.binary_join_element_wise(
        pa.array(["media://"] * total, pa.string()),
        doc_ids.take(pa.array(parent)),
        pa.array(["/"] * total, pa.string()),
        pc.cast(pa.array(np.maximum(pos - 1, 0)), pa.string()), "")
    media_col = pc.if_else(pa.array(is_text), "", media)
    flat = pc.make_struct(kind, text_flat, media_col, offset_col,
                          field_names=["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(offsets, flat)
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans},
                                schema=DOCUMENTS_SCHEMA)


def list_input_fragments(path: str) -> list[str]:
    """Enumerate the parquet fragments of an input table (the resume unit)."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return [path]


def write_table(ds: ray.data.Dataset, out_dir: str, partition_cols: list[str] | None = None,
                min_rows_per_file: int | None = None) -> None:
    """Write a Dataset as a partitioned table (lance if available, else parquet)."""
    if HAVE_LANCE and out_dir.endswith(".lance"):
        ds.write_lance(out_dir)
        return
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
