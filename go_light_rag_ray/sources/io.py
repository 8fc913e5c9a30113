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
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def flat_documents_as_interleaved(batch: pa.Table) -> pa.Table:
    """Adapter: the driver's flat documents table → the input_hint spans shape.

    One text span per document (offset 0), plus deterministic media spans —
    one ``image`` span per full 40 words of text, ref
    ``media://doc-{id}/{k}`` — so multimodal stages have real rows to chew
    on.  Deterministic and SQL-expressible for the oracle.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids: list[str] = []
    out_spans: list[list[dict]] = []
    for raw_id, text in zip(doc_ids, texts):
        doc_id = f"doc-{raw_id}"
        text = text or ""
        spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
        n_words = len(text.split())
        for k in range(n_words // 40):
            spans.append(
                {"kind": "image", "text": "", "media_ref": f"media://{doc_id}/{k}",
                 "offset": len(text)}
            )
        out_ids.append(doc_id)
        out_spans.append(spans)
    from ..schemas import DOCUMENTS_SCHEMA

    return pa.Table.from_pydict({"doc_id": out_ids, "spans": out_spans},
                                schema=DOCUMENTS_SCHEMA)


def list_input_fragments(path: str) -> list[str]:
    """Enumerate the parquet fragments of an input table (the resume unit)."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return [path]


def write_table(ds: ray.data.Dataset, out_dir: str, partition_cols: list[str] | None = None,
                min_rows_per_file: int | None = None) -> None:
    """Write a Dataset as a partitioned table (lance if available, else parquet)."""
    if HAVE_LANCE and out_dir.endswith(".lance"):  # pragma: no cover
        ds.write_lance(out_dir)
        return
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
