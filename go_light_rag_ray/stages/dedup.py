"""Deduplication operators over the ``documents`` table.

The reference has only exact doc dedup via xxhash64 (SURVEY.md §2.7 D1,
reference tests/rag_test.go:585-610); a 100 TB training-data pipeline needs
the full family.  All five are expressed Ray-Data-first:

- exact:        hash → groupby(hash) keep-first     (one keyed shuffle)
- minhash+LSH:  shingle → minhash sig → band bucket → within-bucket pairs
- simhash:      per-token hash bit-vote → 16-bit fingerprint (narrow, no shuffle)
- n-gram Jaccard: shingle inverted index → pair counts → jaccard filter
- embedding:    sign-bit LSH bucket → within-bucket cosine pairs

Hashes are md5 (hex) so DuckDB can replicate every operator exactly for the
correctness oracle (``__ray_entry__.oracle_sql``).  md5 here is a uniform
partitioner, not a security primitive.

Scale notes (100 TB):
- every groupby key is a hash or a (band, signature) bucket — uniformly
  distributed, no salting needed except ``max_group`` which drops
  pathological hot shingles/buckets (stop-shingle capping, standard for
  web-scale MinHash; disabled by default so small-scale oracles are exact).
- pair emission is within-bucket only: O(Σ g²) bounded by ``max_group``,
  never a cross join of the corpus.
- the per-token hash cache in ``SimHasher`` is actor state (built once per
  actor, reused across batches).
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "SimHasher",
    "simhash_fingerprints",
    "ngram_jaccard_pairs",
    "jaccard_pairs_from_index",
    "embedding_dup_pairs",
    "semantic_dedup",
    "keep_best",
]


# production hot-bucket cap: LSH buckets / shingle postings larger than this
# are dropped (stop-shingle capping, standard for web-scale MinHash — a
# shingle shared by >1000 docs carries no near-dup signal but would emit
# O(g²) pairs).  The pair operators default to this cap; oracle-exact runs
# pass ``max_group=0`` explicitly to disable it.
PRODUCTION_MAX_GROUP = 1000

_log = logging.getLogger(__name__)


def _resolve_max_group(max_group: int | None) -> int:
    return PRODUCTION_MAX_GROUP if max_group is None else max_group


def _log_dropped(what: str, size: int, cap: int) -> None:
    """The cap silently changes results (dropped buckets emit no pairs and
    under-count Jaccard) — make every firing visible in the worker log."""
    _log.warning("%s: dropping hot bucket of %d members (> max_group=%d); "
                 "pass max_group=0 for the exhaustive result", what, size, cap)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _tokens(text: str) -> list[str]:
    return text.split()


def _shingles(text: str, k: int) -> list[str]:
    """Distinct k-word shingles in first-occurrence order."""
    toks = _tokens(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    seen: dict[str, None] = {}
    for i in range(len(toks) - k + 1):
        seen.setdefault(" ".join(toks[i : i + k]), None)
    return list(seen)


# ---------------------------------------------------------------------------
# exact dedup (D1)
# ---------------------------------------------------------------------------

def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """hash(text) → keep the smallest doc_id per hash group.

    Returns ``(text_hash, canonical_doc_id, dup_count)``.  The groupby key
    is the hash itself — uniformly distributed, so the shuffle has no skew
    by construction (contrast the reference's driver-side per-file loop,
    tests/rag_test.go:585-610).
    """

    def hash_batch(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "text_hash": pa.array([_md5(t or "") for t in texts], pa.string()),
                "doc_id": b.column("doc_id"),
            }
        )

    from .sortagg import sorted_count

    hashed = docs.map_batches(hash_batch, batch_format="pyarrow")
    counted = sorted_count(hashed, keys=["text_hash"], min_cols=["doc_id"],
                           count_name="dup_count")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["canonical_doc_id" if c == "doc_id" else c for c in b.column_names]
        )

    return counted.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH (near-dup, Broder 1997)
# ---------------------------------------------------------------------------

# universal-hash permutation family over the Mersenne prime 2^31-1:
# perm_i(h) = (A[i]·h + B[i]) mod P with h = 60-bit md5 prefix mod P.
# ONE md5 per shingle, then a vectorized (num_perm × n) affine transform —
# 16× fewer digests than hashing per (permutation, shingle), and exactly
# reproducible in SQL (products stay < 2^61, BIGINT-safe).
MINHASH_P = (1 << 31) - 1
MINHASH_A = [1103515245, 1299709, 15485863, 32452843, 49979687, 67867967,
             86028121, 104395301, 122949823, 141650939, 160481183, 179424673,
             198491317, 217645177, 236887691, 256203161]
MINHASH_B = [12345, 54321, 98765, 13579, 24680, 11111, 22222, 33333,
             44444, 55555, 66666, 77777, 88888, 99999, 10101, 20202]


def _shingle_base_hash(s: str) -> int:
    return int(_md5(s)[:15], 16) % MINHASH_P


class MinHasher:
    """Actor-pool stage: doc → minhash signature (list<int64>).

    Per-actor state: the shingle→base-hash cache (shingles repeat heavily
    across documents; one dict hit replaces the md5)."""

    CACHE_CAP = 1 << 20

    def __init__(self, num_perm: int = 16, shingle_k: int = 3) -> None:
        assert num_perm <= len(MINHASH_A)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self._a = np.array(MINHASH_A[:num_perm], dtype=np.int64)[:, None]
        self._b = np.array(MINHASH_B[:num_perm], dtype=np.int64)[:, None]
        self._cache: dict[str, int] = {}

    def _base(self, s: str) -> int:
        h = self._cache.get(s)
        if h is None:
            h = _shingle_base_hash(s)
            if len(self._cache) >= self.CACHE_CAP:
                self._cache.clear()
            self._cache[s] = h
        return h

    def __call__(self, b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_ids: list[int] = []
        sigs: list[list[int]] = []
        for did, text in zip(doc_ids, texts):
            sh = _shingles(text or "", self.shingle_k)
            if not sh:
                continue
            h = np.array([self._base(s) for s in sh], dtype=np.int64)
            perms = (self._a * h + self._b) % MINHASH_P   # (num_perm, n)
            sigs.append(perms.min(axis=1).tolist())
            out_ids.append(did)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_ids, b.schema.field("doc_id").type),
             "signature": pa.array(sigs, pa.list_(pa.int64()))}
        )


def minhash_signatures(
    docs: ray.data.Dataset, num_perm: int = 16, shingle_k: int = 3,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    from ..pool import auto_pool

    return docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_group: int | None = None,
) -> ray.data.Dataset:
    """Candidate near-dup pairs: docs agreeing on all rows of ≥1 LSH band.

    bucket key = md5(band_index | band signature slice); pairs are emitted
    within buckets only and deduped by a second groupby on (a, b) — at no
    point does the corpus cross-join.  ``max_group`` > 0 drops buckets
    larger than the cap (hot-bucket guard for web scale; defaults to
    ``PRODUCTION_MAX_GROUP``, pass 0 for exact small-scale/oracle runs).
    Returns distinct ``(a, b)`` with ``a < b``.
    """
    max_group = _resolve_max_group(max_group)
    rows = num_perm // bands
    sigs = minhash_signatures(docs, num_perm=num_perm, shingle_k=shingle_k)

    def to_buckets(b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_pylist()
        signatures = b.column("signature").to_pylist()
        out_doc, out_bucket = [], []
        for did, sig in zip(doc_ids, signatures):
            for band in range(bands):
                key = _md5(
                    f"{band}|"
                    + "|".join(str(v) for v in sig[band * rows : (band + 1) * rows])
                )
                out_doc.append(did)
                out_bucket.append(key)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_doc, b.schema.field("doc_id").type),
             "bucket": pa.array(out_bucket, pa.string())}
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        typ = group.schema.field("doc_id").type
        ids = np.sort(group.column("doc_id").to_numpy())
        n = len(ids)
        if n < 2 or (max_group and n > max_group):
            if n >= 2:
                _log_dropped("minhash_lsh_pairs", n, max_group)
            return pa.Table.from_pydict(
                {"a": pa.array([], typ), "b": pa.array([], typ)}
            )
        ai, bi = np.triu_indices(n, k=1)
        keep = ids[ai] != ids[bi]
        return pa.Table.from_pydict(
            {"a": pa.array(ids[ai[keep]], typ), "b": pa.array(ids[bi[keep]], typ)}
        )

    pairs = buckets.groupby("bucket").map_groups(emit_pairs, batch_format="pyarrow")
    # distinct (a, b): same pair can surface from several bands — dedupe via
    # the sorted-run counter (pair keys are ~all-distinct; see sortagg.py).
    # Pair emission itself stays a conventional map_groups: measured A/B,
    # the parallel grouped map beats a sort+union pipeline for this shape.
    from .sortagg import sorted_count

    return sorted_count(pairs, keys=["a", "b"], count_name="n_bands").select_columns(
        ["a", "b"]
    )


# ---------------------------------------------------------------------------
# SimHash (Charikar 2002 / Manku et al. 2007)
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: doc → ``bits``-bit simhash fingerprint.

    Per-token hash = first bits/4 hex chars of md5(token) as an integer
    (SQL: ``('0x' || substr(md5(w), 1, bits/4))::BIGINT``).  Each bit gets a
    +count/-count vote from every token occurrence; fingerprint bit b is set
    iff the vote sum is > 0.  The token→hash cache is actor state — built
    once, shared across all batches this actor sees.
    """

    CACHE_CAP = 1 << 20

    def __init__(self, bits: int = 16) -> None:
        assert bits % 4 == 0 and bits <= 60
        self.bits = bits
        self._cache: dict[str, int] = {}

    def _token_hash(self, w: str) -> int:
        h = self._cache.get(w)
        if h is None:
            h = int(_md5(w)[: self.bits // 4], 16)
            if len(self._cache) >= self.CACHE_CAP:
                self._cache.clear()
            self._cache[w] = h
        return h

    def __call__(self, b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        bit_idx = np.arange(self.bits, dtype=np.int64)
        out_ids, fps = [], []
        for did, text in zip(doc_ids, texts):
            toks = _tokens(text or "")
            if not toks:
                continue
            counts: dict[str, int] = {}
            for w in toks:
                counts[w] = counts.get(w, 0) + 1
            votes = np.zeros(self.bits, dtype=np.int64)
            for w, c in counts.items():
                h = self._token_hash(w)
                bits = (h >> bit_idx) & 1
                votes += np.where(bits == 1, c, -c)
            fp = int(((votes > 0).astype(np.int64) << bit_idx).sum())
            out_ids.append(did)
            fps.append(fp)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_ids, b.schema.field("doc_id").type),
             "simhash": pa.array(fps, pa.int64())}
        )


def simhash_fingerprints(
    docs: ray.data.Dataset, bits: int = 16,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    from ..pool import auto_pool

    return docs.map_batches(
        SimHasher,
        fn_constructor_kwargs={"bits": bits},
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard via shingle inverted index
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_group: int | None = None,
) -> ray.data.Dataset:
    """Exact Jaccard over k-word shingle sets, without a corpus cross join.

    inverted index (shingle → docs) → within-shingle pairs (each carrying
    both set sizes) → groupby(a, b) count common → jaccard = c/(na+nb-c).
    Shuffle keys are shingle hashes then (a, b) pairs — both uniform.
    ``max_group`` drops stop-shingles (groups larger than the cap; defaults
    to ``PRODUCTION_MAX_GROUP``, pass 0 for exact small-scale/oracle runs —
    note a capped run under-counts Jaccard for docs sharing a stop-shingle).
    Returns ``(a, b, jaccard)`` with a < b and jaccard ≥ threshold.
    """
    max_group = _resolve_max_group(max_group)

    def explode(b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_doc, out_sh, out_n = [], [], []
        for did, text in zip(doc_ids, texts):
            sh = _shingles(text or "", shingle_k)
            for s in sh:
                out_doc.append(did)
                out_sh.append(_md5(s))
                out_n.append(len(sh))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(out_doc, b.schema.field("doc_id").type),
             "shingle": pa.array(out_sh, pa.string()),
             "n_shingles": pa.array(out_n, pa.int64())}
        )

    index = docs.map_batches(explode, batch_format="pyarrow")
    return jaccard_pairs_from_index(index, threshold, max_group,
                                    op_label="ngram_jaccard_pairs")


def jaccard_pairs_from_index(
    index: ray.data.Dataset,
    threshold: float,
    max_group: int,
    op_label: str = "jaccard_pairs",
) -> ray.data.Dataset:
    """Pair-counting core shared by the set-overlap similarity family:
    ``(doc_id, shingle, n_shingles)`` inverted-index rows → ``(a, b,
    jaccard)`` with a < b.  ``n_shingles`` must be the row's DISTINCT set
    size (constant per doc_id); jaccard = common/(na+nb−common) in the
    oracle's exact double op sequence."""

    def emit_pairs(group: pa.Table) -> pa.Table:
        """Vectorized pair emission; both set sizes pack into ONE int64
        (sizes = na<<32 | nb — counts are <2^32 at any doc size) so the
        pair-key count below carries a single value column."""
        typ = group.schema.field("doc_id").type
        ids = group.column("doc_id").to_numpy()
        ns = group.column("n_shingles").to_numpy()
        order = np.argsort(ids)
        ids, ns = ids[order], ns[order]
        n = len(ids)
        if n < 2 or (max_group and n > max_group):
            if n >= 2:
                _log_dropped(op_label, n, max_group)
            return pa.Table.from_pydict(
                {"a": pa.array([], typ), "b": pa.array([], typ),
                 "sizes": pa.array([], pa.int64())}
            )
        ai, bi = np.triu_indices(n, k=1)
        return pa.Table.from_pydict(
            {"a": pa.array(ids[ai], typ), "b": pa.array(ids[bi], typ),
             "sizes": pa.array((ns[ai] << 32) | ns[bi], pa.int64())}
        )

    pairs = index.groupby("shingle").map_groups(emit_pairs, batch_format="pyarrow")
    # pair keys are ~all-distinct (millions of size-1..50 groups): Ray's
    # per-group aggregate overhead dominates there, so count via the
    # sorted-run operator (15 s → 1.6 s at 1.27M pairs, exact).  The pair
    # EMISSION stays a conventional map_groups — measured A/B, the parallel
    # grouped map beats a sort+union pipeline for that shape.
    from .sortagg import sorted_count

    agg = sorted_count(pairs, keys=["a", "b"], carry=["sizes"],
                       count_name="common")

    def score(b: pa.Table) -> pa.Table:
        common = b.column("common").to_numpy().astype(np.float64)
        sizes = b.column("sizes").to_numpy()
        na = (sizes >> 32).astype(np.float64)
        nb = (sizes & 0xFFFFFFFF).astype(np.float64)
        jac = common / (na + nb - common)
        out = b.select(["a", "b"]).append_column(
            "jaccard", pa.array(jac, pa.float64())
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return agg.map_batches(score, batch_format="pyarrow")


def cluster_duplicates(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    max_driver_pairs: int = 2_000_000,
    cc_local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """Duplicate clustering: connected components over candidate pairs →
    ``(doc_id, cluster_id)`` with cluster_id = the smallest doc id in the
    component (docs in no pair are their own cluster).

    Two paths, switched on the measured pair count:

    - pairs ≤ ``max_driver_pairs`` (the common case — near-dup candidates
      ≪ corpus): union-find on the collected pairs, component map broadcast
      via ``ray.put``, corpus assignment as a vectorized ``map_batches``.
    - larger pair sets never touch the driver: iterative min-label
      propagation over hash-partitioned adjacency (``_cc_min_label``),
      then corpus assignment — a broadcast hash map via object-store refs
      when the paired-node side is ≤ ``cc_local_threshold`` rows, else ONE
      keyed min-merge — same output, O(component diameter) rounds.
      ``cc_local_threshold=0`` forces every stage fully distributed.
    """
    import ray

    pairs = pairs.select_columns(["a", "b"]).materialize()
    # candidate pairs usually arrive in as many blocks as the upstream
    # shuffle had partitions (128 blocks for a few hundred pairs at small
    # scale) — coalesce to ~64k rows/block so every CC round schedules
    # O(data) tasks, not O(upstream partitions)
    target_blocks = max(1, pairs.count() // 65536 + 1)
    if pairs.num_blocks() > 4 * target_blocks:
        pairs = pairs.repartition(target_blocks).materialize()
    if pairs.count() <= max_driver_pairs or pairs.count() == 0:
        edge_rows = pairs.take_all()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for r in edge_rows:
            ra, rb = find(r["a"]), find(r["b"])
            if ra != rb:
                # union by min id so the representative is deterministic
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        comp = {x: find(x) for x in list(parent)}
        comp_ref = ray.put(comp)

        def assign(b: pa.Table) -> pa.Table:
            mapping = ray.get(comp_ref)
            ids = b.column(id_col).to_pylist()
            clusters = [mapping.get(i, i) for i in ids]
            return pa.Table.from_pydict(
                {"doc_id": pa.array(ids, b.schema.field(id_col).type),
                 "cluster_id": pa.array(clusters, b.schema.field(id_col).type)}
            )

        return docs.select_columns([id_col]).map_batches(
            assign, batch_format="pyarrow"
        )

    labels = _cc_min_label(pairs, local_threshold=cc_local_threshold)

    # paired nodes ≤ 2 × pairs: when that side is broadcast-sized, assign
    # via object-store refs (labels never touch the driver — map tasks pull
    # the small table from the store and build the hash map locally), the
    # same broadcast-small-side idiom as decontam/ANN.  Only a huge label
    # set pays the sort merge below.
    if pairs.count() * 2 <= cc_local_threshold:
        import ray

        label_refs = labels.materialize().to_arrow_refs()

        def assign_bcast(b: pa.Table) -> pa.Table:
            mapping: dict = {}
            for t in ray.get(list(label_refs)):
                for n, l in zip(t.column("node").to_pylist(),
                                t.column("label").to_pylist()):
                    mapping[n] = l
            ids = b.column(id_col).to_pylist()
            return pa.Table.from_pydict(
                {"doc_id": pa.array(ids, b.schema.field(id_col).type),
                 "cluster_id": pa.array([mapping.get(i, i) for i in ids],
                                        b.schema.field(id_col).type)})

        return docs.select_columns([id_col]).map_batches(
            assign_bcast, batch_format="pyarrow")

    # corpus-wide assignment without a broadcast OR a join: every doc
    # re-enters as its own (node, label=node) row; min-label per node is the
    # cluster id (for paired nodes label ≤ node, for singletons label = node).
    def self_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": b.column(id_col), "label": b.column(id_col)}
        )

    from .sortagg import sorted_count

    merged = sorted_count(
        docs.select_columns([id_col]).map_batches(
            self_rows, batch_format="pyarrow"
        ).union(labels),
        keys=["node"], min_cols=["label"], count_name="_n",
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.select(["node", "label"]).rename_columns(
            ["doc_id", "cluster_id"]
        )

    return merged.map_batches(rename, batch_format="pyarrow")


def _cc_min_label(
    pairs: ray.data.Dataset, local_threshold: int = 1 << 20
) -> ray.data.Dataset:
    """Distributed connected components: iterative min-label propagation.

    State = one row per node ``(node, label, nbrs)``, hash-partitioned by
    node.  Each round every node scatters its current label to its
    neighbours (vectorized ``list_flatten`` + ``np.repeat``, no Python
    loop over edges) and gathers the min of incoming labels; a ``changed``
    column summed per round (a tiny aggregate) is the convergence
    certificate — labels only ever decrease, so sum(changed)==0 is exact
    termination, after O(component diameter) rounds.  Nothing is ever
    collected to the driver; state is re-materialized per round so lineage
    stays one round deep.  Returns ``(node, label)`` for paired nodes only.

    Adaptive execution: when the edge set fits one block
    (≤ ``local_threshold`` pairs, default 1M) the whole component search
    runs as ONE Ray task — ``repartition(1)`` + a single-block union-find
    ``map_batches`` — because at that size the round loop's cost is pure
    per-round scheduling overhead, not data (measured 6.1 s vs 0.5 s on
    257 pairs at 32 cpus).  Still nothing driver-side; the output is
    bit-identical (min-id representative either way).  Pass
    ``local_threshold=0`` to force the round loop (tests do).

    Both the adjacency build and the per-round gather run through the
    segment-reduce layer (``sortagg.sorted_collect`` /
    ``sorted_reduce``) — sorted runs + boundary fix, ZERO per-node Python
    dispatch (the round-2 version's ``map_groups`` per node per round was
    the slowest pipeline in BENCH_r02).  The gather sorts by
    ``(node, is_self desc)`` so each node's self row — the unique carrier
    of its adjacency list and previous label — is the run's first row.
    """
    from .sortagg import sorted_collect, sorted_reduce

    if pairs.count() <= local_threshold:
        def block_cc(b: pa.Table) -> pa.Table:
            typ = b.schema.field("a").type
            if len(b) == 0:
                return pa.Table.from_pydict(
                    {"node": pa.array([], typ), "label": pa.array([], typ)})
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            a_vals = b.column("a").to_pylist()
            b_vals = b.column("b").to_pylist()
            for x, y in zip(a_vals, b_vals):
                rx, ry = find(x), find(y)
                if rx != ry:
                    lo, hi = (rx, ry) if rx < ry else (ry, rx)
                    parent[hi] = lo
            nodes = sorted(set(a_vals) | set(b_vals))
            return pa.Table.from_pydict(
                {"node": pa.array(nodes, typ),
                 "label": pa.array([find(n) for n in nodes], typ)})

        return pairs.repartition(1).map_batches(
            block_cc, batch_format="pyarrow", batch_size=None)

    def sym(b: pa.Table) -> pa.Table:
        def arr(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        a, bb = arr(b.column("a")), arr(b.column("b"))
        return pa.Table.from_pydict(
            {"node": pa.concat_arrays([a, bb]),
             "nbr": pa.concat_arrays([bb, a])}
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow")
    adj = sorted_collect(edges, ["node"], "nbr", "nbrs", distinct=True)

    def init_label(b: pa.Table) -> pa.Table:
        node = b.column("node").combine_chunks()
        nbrs = b.column("nbrs").combine_chunks()
        if len(b) == 0:
            typ = b.schema.field("node").type
            return pa.Table.from_pydict(
                {"node": pa.array([], typ), "label": pa.array([], typ),
                 "nbrs": pa.array([], pa.list_(typ)),
                 "changed": pa.array([], pa.int64())})
        # nbrs is ascending and non-empty (every node came from an edge):
        # initial label = min(node, nbrs[0])
        first = pc.list_element(nbrs, 0)
        label = pc.if_else(pc.less(node, first), node, first)
        return pa.Table.from_pydict(
            {"node": node, "label": label, "nbrs": nbrs,
             "changed": pa.array(np.zeros(len(b), dtype=np.int64))})

    state = adj.map_batches(init_label, batch_format="pyarrow").materialize()
    # the per-round sort schedules O(state blocks) tasks; coalesce once to
    # ~64k rows/block so every round's cost tracks data, not the upstream
    # shuffle's partition count
    target_blocks = max(1, state.count() // 65536 + 1)
    if state.num_blocks() > 4 * target_blocks:
        state = state.repartition(target_blocks).materialize()

    while True:
        def scatter(b: pa.Table) -> pa.Table:
            typ = b.schema.field("node").type
            nbrs = b.column("nbrs").combine_chunks()
            flat = pc.list_flatten(nbrs)
            lens = pc.list_value_length(nbrs).to_numpy(zero_copy_only=False)
            rep = b.column("label").take(
                pa.array(np.repeat(np.arange(len(b)), lens), pa.int64())
            )
            self_rows = pa.Table.from_pydict(
                {"node": b.column("node"), "label": b.column("label"),
                 "nbrs": nbrs, "is_self": pa.array([1] * len(b), pa.int8())}
            )
            empty_lists = pa.ListArray.from_arrays(
                pa.array(np.zeros(len(flat) + 1, dtype=np.int32)),
                pa.array([], typ),
            )
            msg_rows = pa.Table.from_pydict(
                {"node": flat, "label": rep.combine_chunks(),
                 "nbrs": empty_lists,
                 "is_self": pa.array(np.zeros(len(flat), dtype=np.int8))}
            )
            return pa.concat_tables([self_rows, msg_rows])

        reduced = sorted_reduce(
            state.map_batches(scatter, batch_format="pyarrow"),
            ["node"],
            ops=[("min", "label", "label"), ("first", "label", "_own"),
                 ("first", "nbrs", "nbrs")],
            order_col="is_self", order_descending=True,
        )

        def finish(b: pa.Table) -> pa.Table:
            changed = pc.cast(pc.less(b.column("label"), b.column("_own")),
                              pa.int64())
            return pa.Table.from_pydict(
                {"node": b.column("node"), "label": b.column("label"),
                 "nbrs": b.column("nbrs"), "changed": changed})

        state = reduced.map_batches(
            finish, batch_format="pyarrow").materialize()
        if not state.sum("changed"):
            break

    return state.select_columns(["node", "label"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup via sign-bit LSH
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.9,
    sign_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_group: int | None = None,
) -> ray.data.Dataset:
    """Near-dup vector pairs: bucket by the sign pattern of the first
    ``sign_bits`` dimensions (a deterministic hyperplane-LSH whose planes
    are the coordinate axes — SQL-replicable), then exact float64 cosine
    within each bucket.  Two near-identical vectors agree on every sign, so
    recall at thresholds near 1.0 is high; lower-threshold recall comes from
    raising ``sign_bits`` granularity or unioning rotated sign maps.
    ``max_group`` defaults to ``PRODUCTION_MAX_GROUP`` (hot-bucket guard);
    pass 0 for exact small-scale/oracle runs.
    Returns ``(a, b, cos_sim)`` with a < b, cos_sim ≥ threshold.
    """
    max_group = _resolve_max_group(max_group)

    def to_buckets(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        vecs = b.column(vec_col).to_pylist()
        out_b = []
        for v in vecs:
            bucket = 0
            for i in range(sign_bits):
                if v[i] > 0:
                    bucket |= 1 << i
            out_b.append(bucket)
        return pa.Table.from_pydict(
            {"vec_id": pa.array(ids, b.schema.field(id_col).type),
             "bucket": pa.array(out_b, pa.int64()),
             "vec": pa.array(vecs, pa.list_(pa.float64()))}
        )

    buckets = embeddings.map_batches(to_buckets, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        typ = group.schema.field("vec_id").type
        empty = pa.Table.from_pydict(
            {"a": pa.array([], typ), "b": pa.array([], typ),
             "cos_sim": pa.array([], pa.float64())}
        )
        n = len(group)
        if n < 2 or (max_group and n > max_group):
            if n >= 2:
                _log_dropped("embedding_dup_pairs", n, max_group)
            return empty
        order = np.argsort(group.column("vec_id").to_numpy())
        ids = group.column("vec_id").to_numpy()[order]
        mat = np.asarray(group.column("vec").to_pylist(), dtype=np.float64)[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        # round to 6 dp before thresholding/emitting: the oracle recomputes
        # cosine with a different summation order (last-ulp differences);
        # both sides compare and emit the rounded value.
        sims = np.round(unit @ unit.T, 6)
        ai, bi = np.triu_indices(n, k=1)
        keep = sims[ai, bi] >= threshold
        return pa.Table.from_pydict(
            {"a": pa.array(ids[ai[keep]], typ),
             "b": pa.array(ids[bi[keep]], typ),
             "cos_sim": pa.array(sims[ai[keep], bi[keep]], pa.float64())}
        )

    return buckets.groupby("bucket").map_groups(emit_pairs, batch_format="pyarrow")


def semantic_dedup(
    embeddings: ray.data.Dataset,
    n_centroids: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    max_group: int | None = 0,
) -> ray.data.Dataset:
    """SemDeDup-style cluster-scoped embedding dedup (Abbas et al. 2023):
    partition vectors by nearest centroid (``similarity.embed_clusters``
    assignment), then within each cluster mark a vector as a duplicate iff
    a LOWER-id vector in the same cluster has rounded cosine ≥
    ``threshold``.  ``dup_of`` is the smallest such id — fully
    deterministic, and (unlike a greedy keep-set sweep) expressible in SQL
    for the value oracle.

    Returns ``(vec_id, dup_of, cos_sim)`` for duplicates only; dropping
    those rows from the corpus is the SemDeDup prune.

    Scale shape: the centroid matrix broadcasts once; pairwise work is
    confined within clusters (the whole point of SemDeDup — k scales with
    corpus size so cluster width stays bounded).  ``max_group`` guards
    degenerate hot clusters like the other pair emitters; it defaults to 0
    (exact) here because cluster count is CHOSEN by the caller, unlike LSH
    bucket sizes which the data controls.
    """
    from .similarity import _as_matrix, _unit, train_kmeans_centroids

    max_group = 0 if max_group is None else max_group
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
        cell = np.argmax(np.round(unit @ cm.T, 6), axis=1)
        return pa.Table.from_pydict({
            "vec_id": b.column(id_col),
            "cluster_id": pa.array(cell.astype(np.int32), pa.int32()),
            "vec": pa.array([list(map(float, v)) for v in unit],
                            pa.list_(pa.float64())),
        })

    assigned = embeddings.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    )

    def emit_dups(group: pa.Table) -> pa.Table:
        typ = group.schema.field("vec_id").type
        empty = pa.Table.from_pydict(
            {"vec_id": pa.array([], typ), "dup_of": pa.array([], typ),
             "cos_sim": pa.array([], pa.float64())})
        n = len(group)
        if n < 2 or (max_group and n > max_group):
            if n >= 2:
                _log_dropped("semantic_dedup", n, max_group)
            return empty
        order = np.argsort(group.column("vec_id").to_numpy())
        ids = group.column("vec_id").to_numpy()[order]
        unit = np.asarray(group.column("vec").to_pylist(),
                          dtype=np.float64)[order]
        sims = np.round(unit @ unit.T, 6)
        # for row i: smallest j < i (id order) with sims >= threshold
        hit = sims >= threshold
        hit[np.triu_indices(n)] = False  # keep strictly-lower-id side
        first = np.argmax(hit, axis=1)   # first True per row (j ascending)
        has = hit[np.arange(n), first]
        rows = np.flatnonzero(has)
        return pa.Table.from_pydict({
            "vec_id": pa.array(ids[rows], typ),
            "dup_of": pa.array(ids[first[rows]], typ),
            "cos_sim": pa.array(sims[rows, first[rows]], pa.float64()),
        })

    return assigned.groupby("cluster_id").map_groups(
        emit_dups, batch_format="pyarrow"
    )


def _best_rows(tbl: pa.Table, score_col: str, member_col: str | None,
               ) -> pa.Table:
    """One (cluster_id, keep_doc_id, score, n_members) row per cluster in
    ``tbl`` — vectorized: one lexsort, run boundaries, no per-group call.
    ``member_col=None`` counts input rows; otherwise sums partial counts
    (the merge stage over combiner outputs)."""
    if tbl.num_rows == 0:
        return pa.Table.from_pydict({
            "cluster_id": pa.array([], pa.int64()),
            "keep_doc_id": pa.array([], pa.int64()),
            "quality": pa.array([], pa.float64()),
            "n_members": pa.array([], pa.int64())})
    cl = tbl.column("cluster_id").to_numpy(zero_copy_only=False)
    ids = tbl.column("keep_doc_id").to_numpy(zero_copy_only=False)
    q = tbl.column(score_col).to_numpy(zero_copy_only=False)
    mem = (tbl.column(member_col).to_numpy(zero_copy_only=False)
           if member_col else np.ones(len(cl), dtype=np.int64))
    # primary cluster asc, then score desc, then doc id asc — last key of
    # lexsort is primary
    order = np.lexsort((ids, -q, cl))
    cl_s, ids_s, q_s, mem_s = cl[order], ids[order], q[order], mem[order]
    start = np.concatenate(([True], cl_s[1:] != cl_s[:-1]))
    seg = np.cumsum(start) - 1
    counts = np.bincount(seg, weights=mem_s).astype(np.int64)
    first = np.flatnonzero(start)
    return pa.Table.from_pydict({
        "cluster_id": pa.array(cl_s[first], pa.int64()),
        "keep_doc_id": pa.array(ids_s[first], pa.int64()),
        "quality": pa.array(q_s[first], pa.float64()),
        "n_members": pa.array(counts, pa.int64())})


def keep_best(
    clusters: ray.data.Dataset,
    scored: ray.data.Dataset,
    score_col: str = "quality",
    id_col: str = "doc_id",
    strategy: str = "grouped",
) -> ray.data.Dataset:
    """The production keep-rule after duplicate clustering: per cluster,
    keep the highest-``score_col`` member (ties → smallest doc id) and
    report the cluster size → (cluster_id, keep_doc_id, quality,
    n_members).  Everything NOT in the output's keep_doc_id column is the
    drop set.

    Shape: ONE doc-keyed co-shuffle attaches scores to cluster labels
    (``relational.shuffle_join`` — both sides are corpus-sized, neither
    broadcasts), a per-batch combiner reduces to ≤1 row per cluster per
    batch (argmax is associative), then one keyed merge finishes — the
    cluster exchange carries #batches × #clusters-per-batch partials,
    never the corpus.  Selection is vectorized end-to-end (lexsort + run
    boundaries); the score must be bit-reproducible (every engine score
    is — integer-derived ratios).

    ``strategy``: the final merge defaults to ``groupby().map_groups``
    (one lazy round; segment-reduce does not win until ~10⁷ groups —
    the measured TF-IDF/ANN switch point).  At web scale clusters ≈ docs
    (mostly singletons), so ``"segment"`` routes through
    ``sortagg.sorted_reduce`` instead: the (score DESC, id ASC) order is
    encoded as ONE exact composite string key — the uint64 bit pattern
    of a non-negative IEEE754 double is monotonic with its value, so
    ``(2⁶⁴−1 − bits(score))`` zero-padded, then the zero-padded id —
    and the winner is ``first`` under that key, with no per-group
    dispatch anywhere."""
    from .relational import shuffle_join

    joined = shuffle_join(
        clusters, scored.select_columns([id_col, score_col]),
        "doc_id", id_col, ["cluster_id"], [score_col])

    def combine(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            ["keep_doc_id" if c == "doc_id" else c for c in b.column_names])
        return _best_rows(b, score_col, None)

    combined = joined.map_batches(combine, batch_format="pyarrow")

    if strategy == "segment":
        from .sortagg import sorted_reduce

        def add_key(b: pa.Table) -> pa.Table:
            # + 0.0 canonicalizes -0.0 → +0.0 (same bits as grouped's
            # lexsort tie); NaN has no valid bit order at all — refuse
            q = b.column("quality").to_numpy(zero_copy_only=False) + 0.0
            if len(q) and (np.isnan(q).any() or np.nanmin(q) < 0):
                raise ValueError("segment strategy needs finite scores "
                                 ">= 0 (bit-order trick)")
            inv = np.uint64(0xFFFFFFFFFFFFFFFF) - q.view(np.uint64)
            key = pc.binary_join_element_wise(
                pc.ascii_lpad(pc.cast(pa.array(inv), pa.string()), 20, "0"),
                pc.ascii_lpad(pc.cast(b.column("keep_doc_id"),
                                      pa.string()), 19, "0"),
                "|")
            return b.append_column("_ord_key", key)

        return sorted_reduce(
            combined.map_batches(add_key, batch_format="pyarrow"),
            keys=["cluster_id"],
            ops=[("first", "keep_doc_id", "keep_doc_id"),
                 ("first", "quality", "quality"),
                 ("sum", "n_members", "n_members")],
            order_col="_ord_key",
        )

    def merge(g: pa.Table) -> pa.Table:
        return _best_rows(g, "quality", "n_members")

    return (combined.groupby("cluster_id")
            .map_groups(merge, batch_format="pyarrow"))
