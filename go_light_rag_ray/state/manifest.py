"""Per-partition checkpoint manifests — the resumable-output seam.

Generalizes the reference's two-phase work queue (``sources`` +
``unprocessed`` KV buckets + per-doc xxhash skip, reference
insert.go:102-171, bolt.go:83-143, tests/rag_test.go:578-624) into
partition-level lineage manifests (SURVEY.md §4 "Checkpoint / resume"):

* the expensive narrow stages (chunk → extract) run *per input shard* and
  write their mentions output to ``<ckpt>/mentions/shard=<id>/`` followed by
  an atomic ``MANIFEST-<id>.json`` carrying lineage (input fragments +
  a content fingerprint + code version) and counter metrics (docs, chunks,
  mentions);
* resume = anti-join of planned shards vs completed manifests: a shard with
  a valid manifest whose lineage fingerprint matches is skipped; an
  incomplete shard directory is deleted and re-written idempotently;
* the wide aggregation (canonicalize shuffle) reads all shards' mentions
  and is re-run on resume — it is cheap relative to extraction and pure.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import asdict, dataclass, field

CODE_VERSION = 1  # bump to invalidate prior checkpoints on semantic change


@dataclass
class ShardManifest:
    shard_id: str
    input_fragments: list[str]
    fingerprint: str
    code_version: int = CODE_VERSION
    counters: dict[str, int] = field(default_factory=dict)


def shard_fingerprint(fragments: list[str]) -> str:
    """Lineage fingerprint: fragment paths + sizes + mtimes (no full re-read)."""
    h = hashlib.sha256()
    for f in sorted(fragments):
        st = os.stat(f)
        h.update(f"{f}|{st.st_size}|{int(st.st_mtime)}".encode())
    h.update(str(CODE_VERSION).encode())
    return h.hexdigest()[:32]


def manifest_path(ckpt_dir: str, shard_id: str, stage: str = "mentions") -> str:
    return os.path.join(ckpt_dir, f"MANIFEST-{stage}-{shard_id}.json")


def shard_out_dir(ckpt_dir: str, stage: str, shard_id: str) -> str:
    return os.path.join(ckpt_dir, stage, f"shard={shard_id}")


def write_manifest(ckpt_dir: str, m: ShardManifest, stage: str = "mentions") -> None:
    """Atomic write: tmp file + rename (partial manifests never observed)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = manifest_path(ckpt_dir, m.shard_id, stage)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1)
    os.replace(tmp, path)


def load_manifest(ckpt_dir: str, shard_id: str, stage: str = "mentions") -> ShardManifest | None:
    path = manifest_path(ckpt_dir, shard_id, stage)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            data = json.load(f)
        return ShardManifest(**data)
    except (json.JSONDecodeError, TypeError):
        return None


def plan_shards(fragments: list[str], n_shards: int) -> dict[str, list[str]]:
    """Deterministic round-robin assignment of input fragments to shards."""
    n_shards = max(1, min(n_shards, len(fragments)))
    shards: dict[str, list[str]] = {f"{i:04d}": [] for i in range(n_shards)}
    for i, frag in enumerate(sorted(fragments)):
        shards[f"{i % n_shards:04d}"].append(frag)
    return shards


def pending_shards(
    ckpt_dir: str, shards: dict[str, list[str]], stage: str = "mentions"
) -> list[str]:
    """Shards without a valid, lineage-matching manifest (the resume set).

    Stale output directories of pending shards are removed so the re-write
    is idempotent.
    """
    pending: list[str] = []
    for shard_id, fragments in shards.items():
        m = load_manifest(ckpt_dir, shard_id, stage)
        if (
            m is not None
            and m.code_version == CODE_VERSION
            and m.fingerprint == shard_fingerprint(fragments)
        ):
            continue
        out = shard_out_dir(ckpt_dir, stage, shard_id)
        if os.path.exists(out):
            shutil.rmtree(out)
        pending.append(shard_id)
    return pending
