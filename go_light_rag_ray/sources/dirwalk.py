"""Directory document source: walk + .gitignore + extension routing.

The reference's multi-handler example ingests a source tree
(examples/multiple/main.go:228-330): two passes — compile every
``.gitignore`` into a per-directory matcher, then enumerate files skipping
``.git`` dirs, ``.gitignore`` files themselves, and anything an ancestor
directory's matcher ignores — and routes each file by extension
(main.go:417-424: ``.go`` → Go handler, else Default), with doc id =
relative path, separators replaced by ``_`` (main.go:399-403), and an
unchanged-content hash skip (main.go:405-413).

Ray-Data-first split: enumeration is driver-side METADATA work (paths
only, like any Dataset source discovering fragments); file CONTENT loads
inside ``map_batches`` tasks, so reads scale out.  The emitted rows
``(doc_id, text, doc_kind)`` feed ``HandlerChunker`` directly — doc_kind
"go" / "markdown" / "default" mirrors the reference's router.

The gitignore matcher implements the core semantics (comments, blanks,
``dir/`` suffix, anchored ``/`` prefix, ``*`` globs via fnmatch, ``!``
negation with last-match-wins, patterns without ``/`` matching any path
segment); exotic corners (``**`` in the middle, escapes) are out of scope
and documented here.
"""

from __future__ import annotations

import fnmatch
import hashlib
import json
import os

import pyarrow as pa
import ray.data

DEFAULT_KINDS_BY_EXT = {
    ".go": "go",
    ".md": "markdown",
    ".markdown": "markdown",
}


class GitignoreMatcher:
    """One compiled .gitignore; matches paths RELATIVE to its directory."""

    def __init__(self, lines: list[str]) -> None:
        self.rules: list[tuple[str, bool, bool]] = []  # (pattern, negate, dir_only)
        for raw in lines:
            line = raw.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            negate = line.startswith("!")
            if negate:
                line = line[1:]
            dir_only = line.endswith("/")
            line = line.rstrip("/")
            self.rules.append((line, negate, dir_only))

    def ignores(self, rel_path: str, is_dir: bool = False) -> bool:
        rel_path = rel_path.replace(os.sep, "/")
        ignored = False
        for pattern, negate, dir_only in self.rules:
            if dir_only and not is_dir:
                # a dir pattern also ignores everything under the dir
                if not any(fnmatch.fnmatch(seg, pattern)
                           for seg in rel_path.split("/")[:-1]):
                    continue
                ignored = not negate
                continue
            if "/" in pattern:
                target = pattern.lstrip("/")
                hit = fnmatch.fnmatch(rel_path, target) or fnmatch.fnmatch(
                    rel_path, target + "/*")
            else:
                hit = any(fnmatch.fnmatch(seg, pattern)
                          for seg in rel_path.split("/"))
            if hit:
                ignored = not negate
        return ignored


def walk_documents_dir(root: str) -> list[tuple[str, str]]:
    """→ [(abs_path, rel_path)] honoring .git skips and .gitignore files
    (the reference's two-pass walk, main.go:238-304)."""
    root = os.path.abspath(root)
    matchers: dict[str, GitignoreMatcher] = {}
    for dirpath, dirnames, filenames in os.walk(root):
        if ".git" in dirnames:
            dirnames.remove(".git")
        if ".gitignore" in filenames:
            with open(os.path.join(dirpath, ".gitignore"),
                      encoding="utf-8", errors="replace") as f:
                matchers[dirpath] = GitignoreMatcher(f.readlines())

    def ignored(path: str) -> bool:
        # every ancestor's matcher gets a say, path relative to the
        # matcher's own directory (main.go:352-377)
        d = os.path.dirname(path)
        while True:
            m = matchers.get(d)
            if m is not None and m.ignores(os.path.relpath(path, d)):
                return True
            if d == root or len(d) < len(root):
                return False
            d = os.path.dirname(d)

    out: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(root):
        if ".git" in dirnames:
            dirnames.remove(".git")
        for fn in sorted(filenames):
            if fn == ".gitignore":
                continue
            path = os.path.join(dirpath, fn)
            if ignored(path):
                continue
            out.append((path, os.path.relpath(path, root)))
    out.sort(key=lambda t: t[1])
    return out


def file_doc_id(rel_path: str) -> str:
    """main.go:403: relative path, separators → '_'."""
    return rel_path.replace(os.sep, "_").replace("/", "_")


def read_directory_documents(
    root: str,
    kinds_by_ext: dict[str, str] | None = None,
    hash_store: str | None = None,
) -> ray.data.Dataset:
    """Directory tree → Dataset (doc_id, text, doc_kind).

    Enumeration (metadata) on the driver; file content loads inside
    ``map_batches`` tasks.  ``hash_store`` (a JSON path) enables the
    reference's unchanged-content skip: files whose md5 matches the store
    are dropped BEFORE the read fans out; call ``save_hash_store`` with
    the processed dataset afterwards to advance it.
    """
    kinds = dict(DEFAULT_KINDS_BY_EXT)
    if kinds_by_ext:
        kinds.update(kinds_by_ext)
    files = walk_documents_dir(root)
    prior: dict[str, str] = {}
    if hash_store and os.path.exists(hash_store):
        with open(hash_store, encoding="utf-8") as f:
            prior = json.load(f)

    items = []
    for path, rel in files:
        ext = os.path.splitext(rel)[1].lower()
        items.append({
            "path": path,
            "doc_id": file_doc_id(rel),
            "doc_kind": kinds.get(ext, "default"),
        })

    def load(b: pa.Table) -> pa.Table:
        out = {"doc_id": [], "text": [], "doc_kind": [], "text_md5": []}
        for path, did, kind in zip(b.column("path").to_pylist(),
                                   b.column("doc_id").to_pylist(),
                                   b.column("doc_kind").to_pylist()):
            with open(path, encoding="utf-8", errors="replace") as f:
                text = f.read()
            digest = hashlib.md5(text.encode("utf-8")).hexdigest()
            if prior.get(did) == digest:
                continue  # unchanged (main.go:410-413)
            out["doc_id"].append(did)
            out["text"].append(text)
            out["doc_kind"].append(kind)
            out["text_md5"].append(digest)
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "doc_kind": pa.array(out["doc_kind"], pa.string()),
            "text_md5": pa.array(out["text_md5"], pa.string()),
        })

    if not items:
        return ray.data.from_arrow(pa.Table.from_pydict(
            {"doc_id": pa.array([], pa.string()),
             "text": pa.array([], pa.string()),
             "doc_kind": pa.array([], pa.string()),
             "text_md5": pa.array([], pa.string())}))
    return ray.data.from_items(items).map_batches(load, batch_format="pyarrow")


def save_hash_store(docs: ray.data.Dataset, hash_store: str) -> None:
    """Advance the unchanged-file store after a successful run: merge the
    processed docs' md5s over the existing entries (main.go:437-439)."""
    prior: dict[str, str] = {}
    if os.path.exists(hash_store):
        with open(hash_store, encoding="utf-8") as f:
            prior = json.load(f)
    for row in docs.select_columns(["doc_id", "text_md5"]).take_all():
        prior[row["doc_id"]] = row["text_md5"]
    tmp = hash_store + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(prior, f, sort_keys=True)
    os.replace(tmp, hash_store)
