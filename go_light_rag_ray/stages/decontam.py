"""Benchmark decontamination: flag corpus documents overlapping an eval set.

Training-data pipelines must detect test-set contamination before
training: any document sharing enough n-gram shingles with a held-out
benchmark is flagged (the standard n-gram-overlap decontamination of
large-corpus training runs).  Ray-Data shape:

* the EVAL side is small by construction (benchmarks are thousands of
  rows, the corpus is billions): its distinct shingle set is built once,
  broadcast via ``ray.put``, and probed per batch — never a join, never a
  shuffle of the corpus;
* the probe is one ``is_in`` Arrow kernel over the corpus's flattened
  shingle stream + ``bincount`` per document — no Python loop in the
  corpus path;
* output is one row per corpus doc: matched-shingle count, total
  shingles, and the contamination ratio (an integer-derived ratio, so the
  DuckDB oracle matches bit-exactly).

``min_matches`` is the flag threshold (≥1 shared shingle already marks
exact quote overlap at the chosen ``shingle_k``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..pool import auto_pool
from .dedup import _shingles

__all__ = ["eval_shingle_set", "decontaminate",
           "eval_bloom_filter", "decontaminate_bloom",
           "decontaminate_multi", "BLOOM_BITS", "BLOOM_PROBES"]

BLOOM_BITS = 1 << 20    # 128 KiB packed — the broadcast is THIS, fixed
BLOOM_PROBES = 4        # md5's 32 hex chars = 4 disjoint 8-hex probes


def eval_shingle_set(
    eval_docs: ray.data.Dataset, shingle_k: int = 3, text_col: str = "text",
) -> pa.Array:
    """Distinct k-word shingles of the (small) eval side, sorted.

    Collected to the driver by design — the benchmark set is the
    deliberately small side of the asymmetric comparison."""
    shingles: set[str] = set()
    for batch in eval_docs.select_columns([text_col]).iter_batches(
            batch_format="pyarrow"):
        for t in batch.column(text_col).to_pylist():
            shingles.update(_shingles(t or "", shingle_k))
    return pa.array(sorted(shingles), pa.string())


class Decontaminator:
    """Actor-pool stage: corpus batch → per-doc contamination stats."""

    def __init__(self, shingle_ref, shingle_k: int,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.eval_shingles = ray.get(shingle_ref)
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        out_sh: list[str] = []
        par: list[int] = []
        totals = np.zeros(b.num_rows, dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingles(t or "", self.shingle_k)
            totals[i] = len(sh)
            out_sh.extend(sh)
            par.extend([i] * len(sh))
        par_arr = np.asarray(par, dtype=np.int64)
        hit = pc.is_in(pa.array(out_sh, pa.string()),
                       value_set=self.eval_shingles).to_numpy(
            zero_copy_only=False).astype(bool)
        matched = np.bincount(par_arr[hit], minlength=b.num_rows) \
            .astype(np.int64) if len(par_arr) else np.zeros(
            b.num_rows, dtype=np.int64)
        safe = np.maximum(totals, 1)
        # tie-stable 6-dp rounding: floor(x*1e6 + 0.5) on BOTH sides — the
        # same op sequence as the SQL oracle (np.round is half-to-even,
        # DuckDB round() half-away; exact dyadic ties like 1/128 diverge).
        ratio = np.floor(matched.astype(np.float64) / safe * 1e6 + 0.5) / 1e6
        ratio[totals == 0] = 0.0
        return pa.Table.from_pydict({
            "doc_id": b.column(self.id_col),
            "n_shingles": pa.array(totals),
            "matched_shingles": pa.array(matched),
            "contamination": pa.array(ratio),
        })


def decontaminate(
    corpus: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    shingle_k: int = 3,
    min_matches: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] | None = None,
    flag_only: bool = True,
) -> ray.data.Dataset:
    """Corpus × eval-set n-gram overlap.

    Returns contaminated docs (``matched_shingles ≥ min_matches``) when
    ``flag_only``, else every doc with its stats (the clean side is the
    complement — filter downstream)."""
    shingle_ref = ray.put(eval_shingle_set(eval_docs, shingle_k, text_col))
    scored = corpus.map_batches(
        Decontaminator,
        fn_constructor_kwargs={"shingle_ref": shingle_ref,
                               "shingle_k": shingle_k,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )
    if flag_only:
        scored = scored.filter(expr=f"matched_shingles >= {min_matches}")
    return scored


class MultiDecontaminator:
    """Actor-pool stage: corpus batch → per-doc matched counts against D
    eval suites in ONE tokenize + ONE probe (the shingle→suite-bitmask
    broadcast), instead of D separate corpus scans."""

    def __init__(self, shingle_ref, mask_ref, suite_names: list[str],
                 shingle_k: int, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        self.shingles = ray.get(shingle_ref)
        self.masks = ray.get(mask_ref)
        self.suite_names = suite_names
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        out_sh: list[str] = []
        par: list[int] = []
        totals = np.zeros(b.num_rows, dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingles(t or "", self.shingle_k)
            totals[i] = len(sh)
            out_sh.extend(sh)
            par.extend([i] * len(sh))
        par_arr = np.asarray(par, dtype=np.int64)
        cols: dict = {"doc_id": b.column(self.id_col),
                      "n_shingles": pa.array(totals)}
        if len(par_arr):
            idx = pc.index_in(pa.array(out_sh, pa.string()),
                              value_set=self.shingles)
            valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            pos = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            mask = np.zeros(len(out_sh), dtype=np.uint64)
            mask[valid] = self.masks[pos[valid]]
            for j, name in enumerate(self.suite_names):
                hit = ((mask >> np.uint64(j)) & np.uint64(1)).astype(bool)
                cols[f"matched_{name}"] = pa.array(np.bincount(
                    par_arr[hit], minlength=b.num_rows).astype(np.int64))
        else:
            for name in self.suite_names:
                cols[f"matched_{name}"] = pa.array(
                    np.zeros(b.num_rows, dtype=np.int64))
        return pa.Table.from_pydict(cols)


def decontaminate_multi(
    corpus: ray.data.Dataset,
    suites: dict[str, ray.data.Dataset],
    shingle_k: int = 3,
    min_matches: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] | None = None,
    flag_only: bool = True,
) -> ray.data.Dataset:
    """Decontamination matrix: corpus × D eval suites in ONE corpus scan.

    A production decontam sweep checks every training document against
    many benchmarks at once (MMLU, GSM8K, HumanEval, …).  Running
    ``decontaminate`` D times tokenizes and probes the 100 TB corpus D
    times; this broadcasts ONE combined distinct-shingle array plus a
    parallel uint64 suite-bitmask (suite i = bit i, ≤64 suites) and gets
    all D matched-counts from a single ``index_in`` probe — the corpus
    side costs the same as one suite.

    Output: (doc_id, n_shingles, matched_<suite>…); ``flag_only`` keeps
    docs where ANY suite reaches ``min_matches``."""
    if len(suites) > 64:
        raise ValueError("≤64 suites per pass (uint64 bitmask)")
    names = list(suites)
    masks: dict[str, int] = {}
    for j, name in enumerate(names):
        for s in eval_shingle_set(
                suites[name], shingle_k, text_col).to_pylist():
            masks[s] = masks.get(s, 0) | (1 << j)
    keys = sorted(masks)
    shingle_ref = ray.put(pa.array(keys, pa.string()))
    mask_ref = ray.put(np.array([masks[s] for s in keys], dtype=np.uint64))
    scored = corpus.map_batches(
        MultiDecontaminator,
        fn_constructor_kwargs={"shingle_ref": shingle_ref,
                               "mask_ref": mask_ref,
                               "suite_names": names,
                               "shingle_k": shingle_k,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )
    if flag_only:
        def any_flag(b: pa.Table) -> pa.Table:
            keep = None
            for n in names:
                h = pc.greater_equal(b.column(f"matched_{n}"), min_matches)
                keep = h if keep is None else pc.or_(keep, h)
            return b.filter(keep)

        scored = scored.map_batches(any_flag, batch_format="pyarrow")
    return scored


def _bloom_positions(shingle: str, m_bits: int, k_probes: int) -> list[int]:
    """Probe j's bit = int(md5(s)[8j : 8j+8], 16) % m_bits — hex-aligned
    slices so the DuckDB oracle replicates each position exactly."""
    import hashlib

    h = hashlib.md5(shingle.encode()).hexdigest()
    return [int(h[8 * j: 8 * j + 8], 16) % m_bits for j in range(k_probes)]


def eval_bloom_filter(
    eval_docs: ray.data.Dataset,
    shingle_k: int = 3,
    text_col: str = "text",
    m_bits: int = BLOOM_BITS,
    k_probes: int = BLOOM_PROBES,
) -> np.ndarray:
    """Packed-uint64 Bloom bit array of the eval shingle set.

    The scale story vs the exact ``is_in`` set: the broadcast is a FIXED
    ``m_bits/8`` bytes (128 KiB at the default) no matter how many
    benchmarks the decontam sweep covers — a thousand-benchmark eval
    union whose distinct-shingle set reaches GBs still ships as one
    object-store put.  The price is a deterministic false-positive rate
    (~(1-e^{-kn/m})^k; size ``m_bits`` ≥ ~15 bits/shingle for <1 %);
    flagged docs can be re-checked exactly with ``decontaminate``."""
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    for s in eval_shingle_set(eval_docs, shingle_k, text_col).to_pylist():
        for pos in _bloom_positions(s, m_bits, k_probes):
            bits[pos >> 6] |= np.uint64(1 << (pos & 63))
    return bits


class BloomDecontaminator:
    """Actor-pool stage: corpus batch → per-doc contamination stats via
    the broadcast Bloom filter (same output schema as Decontaminator)."""

    def __init__(self, bloom_ref, shingle_k: int, m_bits: int,
                 k_probes: int, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        self.bits = ray.get(bloom_ref)
        self.shingle_k = shingle_k
        self.m_bits = m_bits
        self.k_probes = k_probes
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        pos_rows: list[list[int]] = []
        par: list[int] = []
        totals = np.zeros(b.num_rows, dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingles(t or "", self.shingle_k)
            totals[i] = len(sh)
            for s in sh:
                pos_rows.append(
                    _bloom_positions(s, self.m_bits, self.k_probes))
            par.extend([i] * len(sh))
        if pos_rows:
            pos = np.asarray(pos_rows, dtype=np.int64)  # (n_shingles, k)
            words = self.bits[pos >> 6]
            hit = ((words >> (pos & 63).astype(np.uint64))
                   & np.uint64(1)).astype(bool).all(axis=1)
            par_arr = np.asarray(par, dtype=np.int64)
            matched = np.bincount(
                par_arr[hit], minlength=b.num_rows).astype(np.int64)
        else:
            matched = np.zeros(b.num_rows, dtype=np.int64)
        safe = np.maximum(totals, 1)
        ratio = np.floor(matched.astype(np.float64) / safe * 1e6 + 0.5) / 1e6
        ratio[totals == 0] = 0.0
        return pa.Table.from_pydict({
            "doc_id": b.column(self.id_col),
            "n_shingles": pa.array(totals),
            "matched_shingles": pa.array(matched),
            "contamination": pa.array(ratio),
        })


def decontaminate_bloom(
    corpus: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    shingle_k: int = 3,
    min_matches: int = 1,
    m_bits: int = BLOOM_BITS,
    k_probes: int = BLOOM_PROBES,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int | tuple[int, int] | None = None,
    flag_only: bool = True,
) -> ray.data.Dataset:
    """Bloom-filter decontamination: identical contract to
    ``decontaminate`` but the broadcast side is the fixed-size bit array
    (matches may include Bloom false positives — deterministic and
    oracle-replicable, re-checkable exactly downstream)."""
    bloom_ref = ray.put(eval_bloom_filter(
        eval_docs, shingle_k, text_col, m_bits, k_probes))
    scored = corpus.map_batches(
        BloomDecontaminator,
        fn_constructor_kwargs={"bloom_ref": bloom_ref,
                               "shingle_k": shingle_k,
                               "m_bits": m_bits, "k_probes": k_probes,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )
    if flag_only:
        scored = scored.filter(expr=f"matched_shingles >= {min_matches}")
    return scored
