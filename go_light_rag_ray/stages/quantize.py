"""Embedding quantization: symmetric int8 per-vector scaling.

Vector stores ship embeddings quantized (Milvus/FAISS SQ8: one scale per
vector, elements rounded to int8) — at 100 TB the 4× storage/bandwidth cut
is the difference between an index that fits in cluster RAM and one that
doesn't.  The reference's Milvus backend would apply this inside the
store; an engine owning its vectors applies it as a narrow stage.

``quantize_embeddings`` is a stateless vectorized ``map_batches`` (fuses
with the read, no shuffle): per vector, ``scale = qmax / max|x|`` and
``q_i = clip(floor(x_i · scale + 0.5), -qmax, qmax)``.  The returned
per-vector summary is INTEGER-derived (sum / min / max / nonzero count of
the quantized codes, plus ``max_abs`` which is an input element upcast
f32→f64 — exact), so the DuckDB oracle matches bit-for-bit with zero
float-order caveats; the quantized codes themselves ride along as
``list<int8>`` for downstream sinks.

All arithmetic runs on the flattened element stream (offsets +
``np.repeat`` segment ops) — no Python loop over vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["quantize_embeddings", "pq_seed_codebooks", "pq_codes",
           "pq_ann_topk", "ann_topk_ivfpq"]


def quantize_embeddings(
    embeddings: ray.data.Dataset,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """→ (vec_id, n_dims, max_abs, q_sum, q_min, q_max, q_nonzero, q) with
    q = the int8 (or int16 for bits>8) codes.  All-zero vectors quantize
    to all-zero codes (scale 0 guard)."""
    qmax = (1 << (bits - 1)) - 1
    code_type = pa.int8() if bits <= 8 else pa.int16()

    def quant(b: pa.Table) -> pa.Table:
        vecs = b.column(vec_col).combine_chunks()
        lens = pc.list_value_length(vecs).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        n = len(lens)
        flat = pc.list_flatten(vecs).to_numpy(zero_copy_only=False)
        flat = np.asarray(flat, dtype=np.float64)  # f32→f64 is exact
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        absflat = np.abs(flat)
        max_abs = np.zeros(n, dtype=np.float64)
        if len(flat):
            np.maximum.at(max_abs, np.repeat(np.arange(n), lens), absflat)
        safe = np.where(max_abs > 0, max_abs, 1.0)
        scale = np.where(max_abs > 0, qmax / safe, 0.0)
        q = np.floor(flat * np.repeat(scale, lens) + 0.5)
        q = np.clip(q, -qmax, qmax).astype(np.int64)
        row = np.repeat(np.arange(n), lens)
        q_sum = np.zeros(n, dtype=np.int64)
        np.add.at(q_sum, row, q)
        q_min = np.zeros(n, dtype=np.int64)
        q_max = np.zeros(n, dtype=np.int64)
        if len(flat):
            np.minimum.at(q_min, row, q)
            np.maximum.at(q_max, row, q)
        q_nonzero = np.zeros(n, dtype=np.int64)
        np.add.at(q_nonzero, row, (q != 0).astype(np.int64))
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(lens))).astype(np.int32),
            pa.int32())
        codes = pa.ListArray.from_arrays(
            offsets, pa.array(q, pa.int64()).cast(code_type))
        return pa.Table.from_pydict({
            "vec_id": b.column(id_col),
            "n_dims": pa.array(lens, pa.int64()),
            "max_abs": pa.array(max_abs, pa.float64()),
            "q_sum": pa.array(q_sum, pa.int64()),
            "q_min": pa.array(q_min, pa.int64()),
            "q_max": pa.array(q_max, pa.int64()),
            "q_nonzero": pa.array(q_nonzero, pa.int64()),
            "q": codes,
        })

    return embeddings.map_batches(quant, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# product quantization (FAISS IVF-PQ's compression half)
# ---------------------------------------------------------------------------

def pq_seed_codebooks(
    embeddings: ray.data.Dataset,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(S, K, D/S) float64 codebooks seeded from the first ``n_centroids``
    vectors by id — the deterministic oracle mode, mirroring the IVF
    seed-centroid convention (similarity.load_query_matrix).  The trained
    scale path plugs externally trained codebooks (e.g. per-subspace
    Lloyd over a sample) into ``pq_codes(codebooks=…)``; seed mode alone
    already exercises the full encode/search machinery."""
    rows = (
        embeddings.filter(expr=f"{id_col} < {n_centroids}")
        .select_columns([id_col, vec_col])
        .take_all()
    )
    rows.sort(key=lambda r: r[id_col])
    mat = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    d = mat.shape[1] // n_subspaces
    return np.stack([mat[:, s * d:(s + 1) * d] for s in range(n_subspaces)])


def _sub_micro_dists(x: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, S, K) int64 micro-quantized subspace euclidean distances —
    floor(d·1e6 + 0.5), the engine's tie-stable quantization, identical
    to the SQL ``floor(list_distance(...)·1000000 + 0.5)``.  After this
    every PQ comparison and sum is integer-exact."""
    n_sub, n_cent, d = cb.shape
    out = np.empty((x.shape[0], n_sub, n_cent), dtype=np.int64)
    for s in range(n_sub):
        xs = x[:, s * d:(s + 1) * d]
        diff = xs[:, None, :] - cb[s][None, :, :]
        dist = np.sqrt((diff * diff).sum(-1))
        out[:, s, :] = np.floor(dist * 1e6 + 0.5).astype(np.int64)
    return out


def pq_codes(
    embeddings: ray.data.Dataset,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    codebooks: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Product-quantization codes: each vector compresses to S small ints
    (64 dims f32 → 4 bytes at the defaults, a 64× cut — the difference
    between an in-RAM and an on-disk ANN index at 10⁹ vectors).  Returns
    ``(vec_id, code_0 … code_{S-1})`` wide int64 columns.

    code_s = argmin over centroids of the micro-quantized subspace
    euclidean distance — an INTEGER argmin (ties → lower centroid id), so
    assignment is bit-stable and the DuckDB oracle replicates it exactly.
    Codebooks broadcast via ``ray.put``; the encode is one stateless
    vectorized scan (no shuffle)."""
    import ray as _ray

    if codebooks is None:
        codebooks = pq_seed_codebooks(
            embeddings, n_subspaces, n_centroids, id_col, vec_col)
    cb_ref = _ray.put(np.ascontiguousarray(codebooks, dtype=np.float64))
    n_sub = codebooks.shape[0]

    def encode(b: pa.Table) -> pa.Table:
        cb = _ray.get(cb_ref)
        x = np.asarray(
            b.column(vec_col).combine_chunks().to_numpy(
                zero_copy_only=False).tolist(), dtype=np.float64)
        if x.size == 0:
            x = x.reshape(0, cb.shape[0] * cb.shape[2])
        m = _sub_micro_dists(x, cb)           # (n, S, K) int64
        codes = m.argmin(axis=2)              # first-min = lowest id
        cols = {id_col: b.column(id_col)}
        for s in range(n_sub):
            cols[f"code_{s}"] = pa.array(codes[:, s], pa.int64())
        return pa.table(cols)

    return embeddings.map_batches(encode, batch_format="pyarrow")


def pq_ann_topk(
    embeddings: ray.data.Dataset,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    k: int = 5,
    codebooks: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 1,
) -> ray.data.Dataset:
    """Asymmetric-distance (ADC) approximate top-k: each query builds an
    (S × K) lookup table of SQUARED micro-distances to every centroid
    once; each corpus vector's approximate distance is then the INTEGER
    sum of S table entries over its PQ codes — order-independent,
    bit-exact, and the scan never touches the original vectors (the real
    IVF-PQ memory story).

    ``n_queries=1`` (default) keeps the legacy single-query shape
    ``(rank, vec_id, adist)`` for query = the first embedding row — the
    driver-green oracle contract.  ``n_queries > 1`` broadcasts LUTs for
    ids < n_queries and returns ``(query_id, rank, vec_id, adist)``; the
    per-batch cost of the extra queries is ONE (Q, B) gather per subspace
    on top of the shared encode, and the per-batch top-k resolves every
    query in one lexsort (no per-query Python)."""
    import ray as _ray

    if codebooks is None:
        codebooks = pq_seed_codebooks(
            embeddings, n_subspaces, n_centroids, id_col, vec_col)
    qrows = (embeddings.filter(expr=f"{id_col} < {n_queries}")
             .select_columns([id_col, vec_col]).take_all())
    qrows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.asarray([r[vec_col] for r in qrows], dtype=np.float64)
    luts = _sub_micro_dists(qmat, codebooks)  # (Q, S, K) micro-euclid
    luts = luts * luts                        # squared, still int64
    # the multi-query path marks self-matches with a 2^62 sentinel; any
    # REACHABLE adist must stay below it (also rules out int64 overflow
    # of the S-term sum).  Bound = per-query sum of subspace LUT maxima.
    if luts.size:
        max_adist = int(luts.max(axis=2).sum(axis=1).max())
        if max_adist >= (1 << 62):
            raise ValueError(
                f"PQ micro-distances too large for the ADC scan "
                f"(max possible adist {max_adist} ≥ 2^62) — normalize or "
                f"rescale the embeddings")
    lut_ref = _ray.put((qids, luts))
    cb_ref = _ray.put(np.ascontiguousarray(codebooks, dtype=np.float64))
    n_sub = codebooks.shape[0]
    single = n_queries == 1

    def scan(b: pa.Table) -> pa.Table:
        cb = _ray.get(cb_ref)
        qi, lt = _ray.get(lut_ref)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        x = np.asarray(
            b.column(vec_col).combine_chunks().to_numpy(
                zero_copy_only=False).tolist(), dtype=np.float64)
        if x.size == 0:
            x = x.reshape(0, cb.shape[0] * cb.shape[2])
        m = _sub_micro_dists(x, cb)
        codes = m.argmin(axis=2)              # (B, S) — shared by queries
        B, Q = len(ids), len(qi)
        adist = np.zeros((Q, B), dtype=np.int64)
        for s in range(n_sub):
            adist += lt[:, s, :][:, codes[:, s]]   # (Q, B) gather
        if single:
            a0 = adist[0]
            keep = ids != qi[0]               # self-exclude the query row
            out = pa.table({
                id_col: pa.array(ids[keep], pa.int64()),
                "adist": pa.array(a0[keep], pa.int64()),
            })
            return out.sort_by([("adist", "ascending"),
                                (id_col, "ascending")]).slice(0, k)
        # all queries at once: one global lexsort of (q, adist, id) —
        # primary key q makes each query's block contiguous, so the
        # per-query top-k is a reshape slice; adist magnitudes (~2^49)
        # rule out the packed-int trick, the lexsort is the tie-safe path
        sent = np.int64(1) << np.int64(62)
        adist = np.where(ids[None, :] == qi[:, None], sent, adist)
        ids_t = np.broadcast_to(ids, (Q, B))
        order = np.lexsort((ids_t.ravel(),
                            adist.ravel(),
                            np.repeat(np.arange(Q), B)))
        kk = min(k, B)
        picks = order.reshape(Q, B)[:, :kk]
        pa_d = np.take_along_axis(adist, picks - (np.arange(Q) * B)[:, None],
                                  axis=1)
        valid = pa_d < sent
        out_q = np.broadcast_to(qi[:, None], (Q, kk))[valid]
        out_n = ids_t.ravel()[picks][valid]
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_n, pa.int64()),
            "adist": pa.array(pa_d[valid], pa.int64()),
        })

    part = embeddings.map_batches(
        scan, batch_format="pyarrow",
        **({} if single else {"batch_size": 2048}))

    if not single:
        def final_rank_q(group: pa.Table) -> pa.Table:
            g = group.sort_by([("adist", "ascending"),
                               (id_col, "ascending")]).slice(0, k)
            return g.select(["query_id", id_col, "adist"]).add_column(
                1, pa.field("rank", pa.int32()),
                pa.array(range(1, len(g) + 1), pa.int32()))

        return (part.groupby("query_id")
                .map_groups(final_rank_q, batch_format="pyarrow"))

    def add_key(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_g", pa.nulls(len(b), pa.int32()).fill_null(0))

    def final_rank(group: pa.Table) -> pa.Table:
        group = group.sort_by([("adist", "ascending"),
                               (id_col, "ascending")]).slice(0, k)
        out = group.select([id_col, "adist"])
        return out.add_column(
            0, pa.field("rank", pa.int32()),
            pa.array(range(1, len(group) + 1), pa.int32()))

    return (part.map_batches(add_key, batch_format="pyarrow")
            .groupby("_g").map_groups(final_rank, batch_format="pyarrow"))


def ann_topk_ivfpq(
    embeddings: ray.data.Dataset,
    n_queries: int = 4,
    k: int = 5,
    n_centroids: int = 8,
    n_subspaces: int = 4,
    n_pq_centroids: int = 8,
    nprobe: int = 1,
    codebooks: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF coarse cells + ADC over PQ codes — the FAISS IVF-PQ serving
    shape: each query scans only its ``nprobe`` nearest cells, and the
    scan is the INTEGER sum of LUT entries over PQ codes (never raw
    vectors).  Cell assignment is the exact ``ann_topk_ivf`` rule
    (argmax 6-dp cosine, ties → lower centroid id); distances are the
    exact ``pq_ann_topk`` micro-integer algebra — both already
    SQL-oracled, so their composition is too.

    Returns ``(query_id, rank 1..k, vec_id, adist)``; per batch the
    codes/cells compute ONCE (shared by all queries) and the per-query
    tie-safe top-k is one global lexsort keyed (query, adist, id)."""
    import ray as _ray

    from .similarity import ROUND_DP, _as_matrix, _unit

    if codebooks is None:
        codebooks = pq_seed_codebooks(
            embeddings, n_subspaces, n_pq_centroids, id_col, vec_col)
    crows = (embeddings.filter(expr=f"{id_col} < {n_centroids}")
             .select_columns([id_col, vec_col]).take_all())
    crows.sort(key=lambda r: r[id_col])
    cmat = _unit(np.asarray([r[vec_col] for r in crows], dtype=np.float64))

    qrows = (embeddings.filter(expr=f"{id_col} < {n_queries}")
             .select_columns([id_col, vec_col]).take_all())
    qrows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.asarray([r[vec_col] for r in qrows], dtype=np.float64)
    luts = _sub_micro_dists(qmat, codebooks)
    luts = luts * luts
    if luts.size:
        max_adist = int(luts.max(axis=2).sum(axis=1).max())
        if max_adist >= (1 << 62):
            raise ValueError(
                f"PQ micro-distances too large for the ADC scan "
                f"(max possible adist {max_adist} ≥ 2^62)")
    # top-nprobe cells per query by (cosine desc, cell asc) — row 0 is
    # exactly the nprobe=1 cell (the oracle mode)
    p = min(max(1, nprobe), len(cmat))
    qsims = np.round(_unit(qmat) @ cmat.T, ROUND_DP)
    qprobes = np.stack([
        np.lexsort((np.arange(len(cmat)), -qsims[i]))[:p]
        for i in range(len(qmat))]) if len(qmat) else \
        np.empty((0, p), np.int64)
    bref = _ray.put((qids, luts, qprobes, cmat,
                     np.ascontiguousarray(codebooks, dtype=np.float64)))
    n_sub = codebooks.shape[0]

    def scan(b: pa.Table) -> pa.Table:
        qi, lt, probes, cm, cb = _ray.get(bref)
        ids = b.column(id_col).to_numpy()
        B, Q = len(ids), len(qi)
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "adist": pa.array([], pa.int64())})
        if B == 0 or Q == 0:
            return empty
        x = _as_matrix(b.column(vec_col))
        cells = np.argmax(np.round(_unit(x) @ cm.T, ROUND_DP), axis=1)
        codes = _sub_micro_dists(x, cb).argmin(axis=2)       # (B, S)
        adist = np.zeros((Q, B), dtype=np.int64)
        for s in range(n_sub):
            adist += lt[:, s, :][:, codes[:, s]]
        sent = np.int64(1) << np.int64(62)
        in_cell = np.zeros((Q, B), bool)
        for q in range(Q):                  # Q × isin over nprobe cells
            in_cell[q] = np.isin(cells, probes[q])
        excl = (~in_cell) | (ids[None, :] == qi[:, None])
        adist = np.where(excl, sent, adist)
        ids_t = np.broadcast_to(ids, (Q, B))
        order = np.lexsort((ids_t.ravel(), adist.ravel(),
                            np.repeat(np.arange(Q), B)))
        kk = min(k, B)
        picks = order.reshape(Q, B)[:, :kk]
        local = picks - (np.arange(Q) * B)[:, None]
        pa_d = np.take_along_axis(adist, local, axis=1)
        valid = pa_d < sent
        return pa.table({
            "query_id": pa.array(
                np.broadcast_to(qi[:, None], (Q, kk))[valid], pa.int64()),
            id_col: pa.array(ids_t.ravel()[picks][valid], pa.int64()),
            "adist": pa.array(pa_d[valid], pa.int64()),
        })

    part = embeddings.map_batches(scan, batch_format="pyarrow",
                                  batch_size=2048)

    def final_rank_q(group: pa.Table) -> pa.Table:
        g = group.sort_by([("adist", "ascending"),
                           (id_col, "ascending")]).slice(0, k)
        return g.select(["query_id", id_col, "adist"]).add_column(
            1, pa.field("rank", pa.int32()),
            pa.array(range(1, len(g) + 1), pa.int32()))

    return (part.groupby("query_id")
            .map_groups(final_rank_q, batch_format="pyarrow"))
