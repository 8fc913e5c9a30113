"""Similarity search over an embedding column (``list<float>``).

The reference's vector path is a point-lookup ANN against an external store
(SURVEY.md §2.4 J7, reference storage/chromem.go:49-95, milvus.go:65-180);
here search is a dataflow over the ``embeddings`` table itself:

- ``ann_topk``      — brute-force cosine top-k: the (small) query matrix is
  broadcast once via ``ray.put`` and every batch does one float64 matmul
  against it; each batch emits only its local top-k per query (partial
  top-k), and a final tiny ``groupby(query_id)`` merge produces the global
  ranks.  Shuffled volume is O(queries × k × num_blocks), never O(N).
- ``ann_topk_lsh``  — the scale path: candidates restricted to the query's
  sign-bit LSH bucket (deterministic coordinate hyperplanes, same scheme as
  ``dedup.embedding_dup_pairs``), so each query scans ~N/2^bits vectors.

Cosines are computed in float64 and rounded to 6 dp before ranking so the
DuckDB oracle (which recomputes them with a different summation order,
agreeing to ~4e-16) ranks identically; ties break on ascending neighbor id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..pool import auto_pool

ROUND_DP = 6


def _as_matrix(vec_chunked: pa.ChunkedArray) -> np.ndarray:
    """list<float> column → (n, d) float64, zero-copy off the Arrow
    values buffer when the lists are rectangular and null-free (the
    embeddings-table invariant); falls back to the Python path otherwise."""
    arr = (vec_chunked.combine_chunks()
           if isinstance(vec_chunked, pa.ChunkedArray) else vec_chunked)
    n = len(arr)
    # arr.null_count covers top-level nulls only; a null ELEMENT inside a
    # list would to_numpy() as NaN on the fast path where the Python path
    # raises — check the child buffer too (conservative on slices)
    if (n and arr.null_count == 0 and isinstance(arr, pa.ListArray)
            and arr.values.null_count == 0):
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            vals = arr.values.to_numpy(zero_copy_only=False)
            return (vals[offs[0]:offs[-1]]
                    .astype(np.float64).reshape(n, int(widths[0])))
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def load_query_matrix(
    embeddings: ray.data.Dataset, n_queries: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the (small) query side: vectors with id < n_queries.

    Returns (query_ids, unit query matrix).  This is the one place the
    pipeline materializes anything — a deliberately small side that is then
    broadcast via ``ray.put`` and read zero-copy by every task.
    """
    rows = (
        embeddings.filter(expr=f"{id_col} < {n_queries}")
        .select_columns([id_col, vec_col])
        .take_all()
    )
    rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in rows], dtype=np.int64)
    qmat = _unit(np.asarray([r[vec_col] for r in rows], dtype=np.float64))
    return qids, qmat


def ann_topk(
    embeddings: ray.data.Dataset,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float | None = None,
    where: str | None = None,
) -> ray.data.Dataset:
    """Global cosine top-k per query (self-match excluded).

    ``min_sim`` is the reference's vector-search radius (Milvus
    RangeFilter, storage/milvus.go:31,78-80: only neighbors with cosine ≥
    the radius qualify); ``where`` is a Ray Data filter expression applied
    to the corpus side BEFORE the scan — the metadata-scoped search of
    chromem.go:49-95 — pruned at the read, never post-hoc.
    Returns (query_id, rank 1..k, neighbor_id, cos_sim) ordered within each
    query by (cos_sim desc, neighbor_id asc).
    """
    qids, qmat = load_query_matrix(embeddings, n_queries, id_col, vec_col)
    q_ref = ray.put((qids, qmat))
    if where:
        embeddings = embeddings.filter(expr=where)

    class PartialTopK:
        """Per-batch local top-k against the broadcast query matrix."""

        def __init__(self) -> None:
            self.qids, self.qmat = ray.get(q_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy()
            B = len(ids)
            if B == 0:
                return pa.Table.from_pydict(
                    {"query_id": pa.array([], pa.int64()),
                     "neighbor_id": pa.array([], pa.int64()),
                     "cos_sim": pa.array([], pa.float64())})
            unit = _unit(_as_matrix(b.column(vec_col)))
            sims = np.round(unit @ self.qmat.T, ROUND_DP)  # (batch, Q)
            if ids.min() >= 0 and ids.max() < (1 << 33):
                # Vectorized exact top-k across ALL queries at once (no
                # per-query Python — at 1000 broadcast queries the loop
                # was the wall).  The (sim desc, id asc) tie-break packs
                # into one int64 key: the rounded sim is an integer in
                # [-10^DP, 10^DP] (< 2^21), ids fit 33 bits, so
                # argpartition on the key is tie-safe — CRITICAL for
                # replicated corpora where whole tie classes straddle the
                # k boundary.  Emitted candidate SET identical to the
                # per-query loop; _final_topk re-sorts, so order within
                # the partial is free.
                scale = np.int64(10 ** ROUND_DP)
                sim_i = np.rint(sims * scale).astype(np.int64)
                key = ((scale - sim_i) << np.int64(33)) | ids[:, None]
                sent = np.int64(1) << np.int64(62)
                excl = ids[:, None] == self.qids[None, :]
                if min_sim is not None:
                    excl |= sims < min_sim   # radius filter, applied early
                key = np.where(excl, sent, key)
                kk = min(k, B)
                part = np.argpartition(key, kk - 1, axis=0)[:kk]  # (kk, Q)
                valid = np.take_along_axis(key, part, axis=0) < sent
                out_q = np.broadcast_to(self.qids, part.shape)[valid]
                out_n = ids[part[valid]]
                out_s = np.take_along_axis(sims, part, axis=0)[valid]
                return pa.Table.from_pydict(
                    {"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "cos_sim": pa.array(out_s, pa.float64())})
            # ids outside the packable range: per-query loop
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                col = sims[:, qi]
                mask = ids != qid
                if min_sim is not None:
                    mask &= col >= min_sim  # radius filter, applied early
                cand_ids, cand_sims = ids[mask], col[mask]
                if len(cand_ids) > k:
                    # local prune: top-k by (sim desc, id asc)
                    order = np.lexsort((cand_ids, -cand_sims))[:k]
                    cand_ids, cand_sims = cand_ids[order], cand_sims[order]
                out_q.extend([qid] * len(cand_ids))
                out_n.extend(cand_ids.tolist())
                out_s.extend(cand_sims.tolist())
            return pa.Table.from_pydict(
                {"query_id": pa.array(out_q, pa.int64()),
                 "neighbor_id": pa.array(out_n, pa.int64()),
                 "cos_sim": pa.array(out_s, pa.float64())}
            )

    partial = embeddings.map_batches(
        PartialTopK, batch_format="pyarrow", concurrency=auto_pool()
    )
    return _final_topk(partial, k, n_queries=len(qids))


def bucket_of(vec, sign_bits: int) -> int:
    b = 0
    for i in range(sign_bits):
        if vec[i] > 0:
            b |= 1 << i
    return b


def multiprobe_buckets(vec, sign_bits: int, nprobe: int) -> np.ndarray:
    """Multi-probe LSH probe sequence (Lv et al., VLDB'07, the standard
    recall knob): the vector's own bucket first, then buckets reached by
    flipping sign bits in ascending |coordinate| order — the hyperplanes
    the vector sits closest to, i.e. where a near neighbor most likely
    landed on the other side.  Deterministic (distance ties break on the
    lower bit index); ``nprobe=1`` is exactly ``bucket_of``."""
    base = bucket_of(vec, sign_bits)
    if nprobe <= 1:
        return np.array([base], dtype=np.int64)
    conf = np.abs(np.asarray(vec[:sign_bits], dtype=np.float64))
    flip_order = np.lexsort((np.arange(sign_bits), conf))
    probes = [base]
    for bit in flip_order:
        if len(probes) >= nprobe:
            break
        probes.append(base ^ (1 << int(bit)))
    return np.array(probes, dtype=np.int64)


def ann_topk_lsh(
    embeddings: ray.data.Dataset,
    n_queries: int = 8,
    k: int = 5,
    sign_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> ray.data.Dataset:
    """Approximate top-k: candidates limited to the query's sign-LSH bucket.

    Same output schema as ``ann_topk``; each query only ever scores vectors
    whose first ``sign_bits`` coordinate signs match its own — the scan per
    query drops ~2^sign_bits-fold, the trade being recall for neighbors
    across a hyperplane.  ``nprobe>1`` (multi-probe LSH) additionally scans
    the ``nprobe-1`` neighboring buckets across the query's least-confident
    hyperplanes — recall@k is monotone in nprobe (tested); ``nprobe=1``
    stays the SQL-replicable oracle mode.
    """
    qids, qmat = load_query_matrix(embeddings, n_queries, id_col, vec_col)
    qprobes = np.stack([multiprobe_buckets(q, sign_bits, nprobe)
                        for q in qmat])
    q_ref = ray.put((qids, qmat, qprobes))

    class BucketTopK:
        def __init__(self) -> None:
            self.qids, self.qmat, self.qprobes = ray.get(q_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy()
            mat = _as_matrix(b.column(vec_col))
            unit = _unit(mat)
            buckets = np.array(
                [bucket_of(v, sign_bits) for v in mat], dtype=np.int64
            )
            sims = np.round(unit @ self.qmat.T, ROUND_DP)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(buckets, self.qprobes[qi]) & (ids != qid)
                cand_ids, cand_sims = ids[mask], sims[mask, qi]
                if len(cand_ids) > k:
                    order = np.lexsort((cand_ids, -cand_sims))[:k]
                    cand_ids, cand_sims = cand_ids[order], cand_sims[order]
                out_q.extend([qid] * len(cand_ids))
                out_n.extend(cand_ids.tolist())
                out_s.extend(cand_sims.tolist())
            return pa.Table.from_pydict(
                {"query_id": pa.array(out_q, pa.int64()),
                 "neighbor_id": pa.array(out_n, pa.int64()),
                 "cos_sim": pa.array(out_s, pa.float64())}
            )

    partial = embeddings.map_batches(
        BucketTopK, batch_format="pyarrow", concurrency=auto_pool()
    )
    return _final_topk(partial, k, n_queries=len(qids))


def train_kmeans_centroids(
    embeddings: ray.data.Dataset,
    n_centroids: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic distributed spherical k-means (Lloyd's, cosine
    assignment): seeded from the first ``n_centroids`` unit vectors, then
    ``iters`` rounds of one streaming pass each — per-block partial sums
    (k × dim floats per block, never the data) collected and reduced in a
    DETERMINISTIC order (sorted by cell then block min-id, so float
    summation order never depends on task arrival).  Empty cells keep
    their previous centroid.  This is the trained coarse quantizer for
    ``ann_topk_ivf``'s scale path; the first-N seed alone remains the
    SQL-replicable oracle mode."""
    crows = (
        embeddings.filter(expr=f"{id_col} < {n_centroids}")
        .select_columns([id_col, vec_col])
        .take_all()
    )
    crows.sort(key=lambda r: r[id_col])
    cmat = _unit(np.asarray([r[vec_col] for r in crows], dtype=np.float64))

    for _ in range(max(0, iters)):
        c_ref = ray.put(cmat)

        def partial(b: pa.Table) -> pa.Table:
            cm = ray.get(c_ref)
            ids = b.column(id_col).to_numpy()
            unit = _unit(_as_matrix(b.column(vec_col)))
            cells = np.argmax(np.round(unit @ cm.T, ROUND_DP), axis=1)
            rows = {"cell": [], "n": [], "min_id": [], "vec_sum": []}
            for c in range(len(cm)):
                m = cells == c
                if not m.any():
                    continue
                rows["cell"].append(c)
                rows["n"].append(int(m.sum()))
                rows["min_id"].append(int(ids[m].min()))
                rows["vec_sum"].append(unit[m].sum(axis=0).tolist())
            return pa.Table.from_pydict({
                "cell": pa.array(rows["cell"], pa.int32()),
                "n": pa.array(rows["n"], pa.int64()),
                "min_id": pa.array(rows["min_id"], pa.int64()),
                "vec_sum": pa.array(rows["vec_sum"],
                                    pa.list_(pa.float64())),
            })

        parts = embeddings.map_batches(
            partial, batch_format="pyarrow").take_all()
        parts.sort(key=lambda r: (r["cell"], r["min_id"]))
        sums = np.zeros_like(cmat)
        counts = np.zeros(len(cmat), dtype=np.int64)
        for r in parts:
            sums[r["cell"]] += np.asarray(r["vec_sum"])
            counts[r["cell"]] += r["n"]
        filled = counts > 0
        new = cmat.copy()
        new[filled] = _unit(sums[filled] / counts[filled, None])
        cmat = new
    return cmat


def ann_topk_ivf(
    embeddings: ray.data.Dataset,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    nprobe: int = 1,
) -> ray.data.Dataset:
    """IVF-style approximate top-k: a coarse quantizer of ``n_centroids``
    centroids partitions the corpus; each query scans its ``nprobe``
    nearest centroids' inverted lists (default 1).  The scan per query
    drops ~n_centroids/nprobe-fold, trading recall across cell boundaries;
    recall@k is monotone in nprobe (tested), the standard IVF recall knob.

    ``kmeans_iters=0`` (oracle mode): centroids are the first
    ``n_centroids`` vectors, unit-normalized — deterministic and
    SQL-replicable.  ``kmeans_iters>0`` (scale path): the same seed
    refined by distributed spherical k-means (``train_kmeans_centroids``)
    — better-balanced cells, higher recall, still deterministic.
    Same output schema as ``ann_topk``; tie-breaks identical.
    """
    qids, qmat = load_query_matrix(embeddings, n_queries, id_col, vec_col)
    if kmeans_iters > 0:
        cmat = train_kmeans_centroids(embeddings, n_centroids, kmeans_iters,
                                      id_col, vec_col)
    else:
        crows = (
            embeddings.filter(expr=f"{id_col} < {n_centroids}")
            .select_columns([id_col, vec_col])
            .take_all()
        )
        crows.sort(key=lambda r: r[id_col])
        cmat = _unit(np.asarray([r[vec_col] for r in crows], dtype=np.float64))

    def cell_of(unit_rows: np.ndarray) -> np.ndarray:
        """argmax cosine centroid; ties break to the lowest centroid index
        (np.argmax picks the first maximum)."""
        return np.argmax(np.round(unit_rows @ cmat.T, ROUND_DP), axis=1)

    # top-nprobe centroid cells per query, ordered by (cosine desc, cell
    # asc) — deterministic; row 0 is exactly the nprobe=1 cell
    p = min(max(1, nprobe), len(cmat))
    qsims = np.round(qmat @ cmat.T, ROUND_DP)
    qprobes = np.stack([
        np.lexsort((np.arange(len(cmat)), -qsims[i]))[:p]
        for i in range(len(qmat))
    ])
    q_ref = ray.put((qids, qmat, qprobes))

    class CellTopK:
        def __init__(self) -> None:
            self.qids, self.qmat, self.qprobes = ray.get(q_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy()
            unit = _unit(_as_matrix(b.column(vec_col)))
            cells = cell_of(unit)
            sims = np.round(unit @ self.qmat.T, ROUND_DP)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(cells, self.qprobes[qi]) & (ids != qid)
                cand_ids, cand_sims = ids[mask], sims[mask, qi]
                if len(cand_ids) > k:
                    order = np.lexsort((cand_ids, -cand_sims))[:k]
                    cand_ids, cand_sims = cand_ids[order], cand_sims[order]
                out_q.extend([qid] * len(cand_ids))
                out_n.extend(cand_ids.tolist())
                out_s.extend(cand_sims.tolist())
            return pa.Table.from_pydict(
                {"query_id": pa.array(out_q, pa.int64()),
                 "neighbor_id": pa.array(out_n, pa.int64()),
                 "cos_sim": pa.array(out_s, pa.float64())}
            )

    partial = embeddings.map_batches(
        CellTopK, batch_format="pyarrow", concurrency=auto_pool()
    )
    return _final_topk(partial, k, n_queries=len(qids))


def embed_clusters(
    embeddings: ray.data.Dataset,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> ray.data.Dataset:
    """Document clustering by nearest-centroid assignment →
    (``id_col``, cluster_id:int32, cos_sim) for EVERY vector.

    The semantic-clustering step of a curation pipeline (cluster-balanced
    sampling, per-cluster dedup, topic pruning à la SemDeDup): centroids
    broadcast once via ``ray.put``, assignment is one stateless vectorized
    ``map_batches`` (numpy matmul per batch) that fuses with the read — no
    shuffle at any scale.  Ties (equal rounded cosine) break to the lowest
    cluster id on both sides.

    ``kmeans_iters=0`` (oracle mode): centroids = first ``n_centroids``
    vectors by id, unit-normalized — SQL-replicable.  ``kmeans_iters>0``:
    the distributed spherical k-means refinement
    (``train_kmeans_centroids``), still deterministic.
    """
    if kmeans_iters > 0:
        cmat = train_kmeans_centroids(embeddings, n_centroids, kmeans_iters,
                                      id_col, vec_col)
    else:
        crows = (
            embeddings.filter(expr=f"{id_col} < {n_centroids}")
            .select_columns([id_col, vec_col])
            .take_all()
        )
        crows.sort(key=lambda r: r[id_col])
        cmat = _unit(np.asarray([r[vec_col] for r in crows],
                                dtype=np.float64))
    c_ref = ray.put(cmat)

    def assign(b: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        unit = _unit(_as_matrix(b.column(vec_col)))
        sims = np.round(unit @ cm.T, ROUND_DP)
        cell = np.argmax(sims, axis=1)  # first max → lowest cluster id
        best = sims[np.arange(len(cell)), cell]
        return pa.Table.from_pydict({
            id_col: b.column(id_col),
            "cluster_id": pa.array(cell.astype(np.int32), pa.int32()),
            "cos_sim": pa.array(best, pa.float64()),
        })

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    )


def ann_self_topk_lsh(
    vectors: ray.data.Dataset,
    k: int = 3,
    sign_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id_name: str = "query_id",
    max_group: int = 0,
) -> ray.data.Dataset:
    """All-pairs approximate top-k: EVERY row is a query; candidates are the
    row's own sign-LSH bucket (same coordinate-hyperplane scheme as
    ``dedup.embedding_dup_pairs``).

    This is the scale path for self-similarity (entity ANN, near-dup
    ranking): no broadcast query matrix — the corpus buckets itself, ONE
    keyed shuffle, per-bucket O(g²) matmul bounded by ``max_group``, and
    since every row lives in exactly one bucket the within-bucket top-k IS
    the final rank (no merge stage).  Works for any id type (string entity
    ids included).  Returns (out_id_name, rank 1..k, neighbor_id, cos_sim)
    ordered by (cos_sim desc, neighbor_id asc) within each query row.
    """

    def to_buckets(b: pa.Table) -> pa.Table:
        vecs = b.column(vec_col).to_pylist()
        out_b = [bucket_of(v, sign_bits) for v in vecs]
        return pa.Table.from_pydict(
            {"_id": b.column(id_col),
             "bucket": pa.array(out_b, pa.int64()),
             "vec": pa.array(vecs, pa.list_(pa.float64()))}
        )

    buckets = vectors.map_batches(to_buckets, batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        typ = group.schema.field("_id").type
        empty = pa.Table.from_pydict(
            {out_id_name: pa.array([], typ),
             "rank": pa.array([], pa.int32()),
             "neighbor_id": pa.array([], typ),
             "cos_sim": pa.array([], pa.float64())}
        )
        n = len(group)
        if n < 2 or (max_group and n > max_group):
            return empty
        ids = np.array(group.column("_id").to_pylist())
        order = np.argsort(ids)
        ids = ids[order]
        unit = _unit(np.asarray(group.column("vec").to_pylist(),
                                dtype=np.float64)[order])
        sims = np.round(unit @ unit.T, ROUND_DP)
        np.fill_diagonal(sims, -np.inf)  # exclude self-match
        kk = min(k, n - 1)
        out_q, out_r, out_n, out_s = [], [], [], []
        for i in range(n):
            cand = np.lexsort((ids, -sims[i]))[:kk]
            out_q.extend([ids[i]] * len(cand))
            out_r.extend(range(1, len(cand) + 1))
            out_n.extend(ids[cand].tolist())
            out_s.extend(sims[i, cand].tolist())
        return pa.Table.from_pydict(
            {out_id_name: pa.array(out_q, typ),
             "rank": pa.array(out_r, pa.int32()),
             "neighbor_id": pa.array(out_n, typ),
             "cos_sim": pa.array(out_s, pa.float64())}
        )

    return buckets.groupby("bucket").map_groups(topk, batch_format="pyarrow")


SEGMENT_MIN_GROUPS = 100_000


def _final_topk(partial: ray.data.Dataset, k: int,
                n_queries: int | None = None) -> ray.data.Dataset:
    """Merge per-batch partial top-k lists into global ranks 1..k.

    Two equivalent paths, chosen by query-set cardinality (measured, not
    guessed — the round-3 A/B):

    - grouped (default, ``n_queries`` small): ``groupby(query_id)`` +
      vectorized per-group merge.  The partial set is tiny (≤ queries × k
      per scored batch), so the ~10µs-per-group dispatch is noise while a
      sort-based path pays two extra execution rounds (~1-2 s fixed).
    - segment (``n_queries ≥ SEGMENT_MIN_GROUPS``): ``sortagg.sorted_topk``
      sorted-run head — no per-group Python, the right shape when the
      query set itself is web-scale (e.g. all-corpus self-join ANN).
    """
    if n_queries is not None and n_queries >= SEGMENT_MIN_GROUPS:
        from .sortagg import sorted_topk

        ranked = sorted_topk(
            partial, ["query_id"], order_by=["cos_sim", "neighbor_id"], k=k,
            descending=[True, False], rank_name="rank",
        )
        return ranked.select_columns(["query_id", "rank", "neighbor_id",
                                      "cos_sim"])

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        nids = group.column("neighbor_id").to_numpy()
        sims = group.column("cos_sim").to_numpy()
        order = np.lexsort((nids, -sims))[:k]
        n = len(order)
        return pa.Table.from_pydict(
            {"query_id": pa.array([qid] * n, pa.int64()),
             "rank": pa.array(np.arange(1, n + 1), pa.int32()),
             "neighbor_id": pa.array(nids[order], pa.int64()),
             "cos_sim": pa.array(sims[order], pa.float64())}
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")
