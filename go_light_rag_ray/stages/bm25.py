"""BM25 lexical ranked retrieval over the documents table.

The lexical leg of hybrid retrieval: the reference pairs graph context
with vector ANN (query.go:202-517, chromem.go:99-147); production
LightRAG-style stacks add a keyword/BM25 leg and fuse the rankings with
RRF (``pipelines/query.fused_entities``).  Okapi BM25 (Robertson &
Zaragoza 2009) with Lucene's bounded idf.

Scale shape (the 100 TB plan):

- ONE corpus scan reduces each doc to a compact stats row
  ``(doc_id, dl, tf_i, m_i per query term)`` — the query side is tiny
  (a handful of terms), so tf lives in WIDE int64 columns and no
  (doc, term) explode or shuffle ever happens.
- Corpus constants (N, Σdl, df per term) are one small aggregate over
  the reduced table; they broadcast as plain closure constants into the
  scoring map.
- Scoring is a stateless vectorized map over the reduced table; the
  global top-k is a local per-block top-k followed by one tiny
  single-group merge (≤ k rows per block reach it).
- The reduced table is materialized once (docs × ~10 int64 — at 10⁹
  docs that is tens of GB across a cluster's object store, vs re-running
  the corpus scan for each of the two consumers).

Determinism / oracle parity: per-(doc, term) contributions are quantized
to integer micro-units ``floor(score · 1e6 + 0.5)`` BEFORE the per-doc
sum, so summation order never matters.  ``idf`` modes:

- ``"lucene"`` (library default): ``ln(1 + (N - df + .5)/(df + .5))`` —
  true BM25.  ``np.log`` is NOT bit-identical to DuckDB ``ln`` (~25 % of
  values differ by 1 ulp on this box, measured), so this mode carries no
  value oracle.
- ``"rational"``: the RSJ odds form ``(N - df + .5)/(df + .5)`` WITHOUT
  the log — every op is a rational of exact integers evaluated in one
  fixed order, bit-exact against the SQL oracle.  Per-term rankings are
  identical to lucene (x → ln(1+x) is monotone); multi-term sums can
  order differently, which is the price of a hash-checkable oracle.

k1 = 1.5 and b = 0.75 are dyadic, so every constant in the formula is
exactly representable and the Ray and DuckDB doubles agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
import ray.data.aggregate as agg

K1 = 1.5
B = 0.75


def doc_term_stats(docs: ray.data.Dataset, terms: list[str]) -> ray.data.Dataset:
    """One-scan reduction: (doc_id, dl, tf_i, m_i) with wide per-term
    columns.  dl counts non-empty whitespace tokens (== the oracle's
    ``regexp_extract_all(text, '\\S+')``); docs with dl = 0 still emit a
    row (they are part of N)."""
    terms = list(terms)

    def stats(b: pa.Table) -> pa.Table:
        words = pc.ascii_split_whitespace(
            pc.cast(b.column("text"), pa.string())).combine_chunks()
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        par = np.repeat(np.arange(b.num_rows), lens)
        nonempty = np.asarray(
            pc.not_equal(flat, "").to_numpy(zero_copy_only=False), bool)
        dl = np.bincount(
            par[nonempty], minlength=b.num_rows).astype(np.int64)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "doc_id": b.column("doc_id"),
            "dl": pa.array(dl, pa.int64()),
        }
        for i, t in enumerate(terms):
            hit = np.asarray(pc.fill_null(pc.equal(flat, t), False)
                             .to_numpy(zero_copy_only=False), bool)
            tf = np.bincount(par[hit], minlength=b.num_rows).astype(np.int64)
            cols[f"tf_{i}"] = pa.array(tf, pa.int64())
            cols[f"m_{i}"] = pa.array((tf > 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    return docs.map_batches(stats, batch_format="pyarrow")


def bm25_topk(
    docs: ray.data.Dataset,
    terms: list[str],
    k: int = 20,
    idf: str = "lucene",
) -> ray.data.Dataset:
    """Top-k docs for a bag-of-terms query by BM25.  Returns
    (rank, doc_id, score_micro) — score in integer micro-units so the
    per-doc sum is order-independent."""
    terms = list(terms)
    red = doc_term_stats(docs, terms).materialize()

    aggs = [agg.Count(alias_name="n"), agg.Sum("dl", alias_name="sum_dl")]
    for i in range(len(terms)):
        aggs.append(agg.Sum(f"m_{i}", alias_name=f"df_{i}"))
    st = red.aggregate(*aggs)
    n_docs = int(st["n"])
    sum_dl = int(st["sum_dl"] or 0)
    dfs = [int(st[f"df_{i}"] or 0) for i in range(len(terms))]

    def score(b: pa.Table) -> pa.Table:
        dl = b.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        total = np.zeros(len(b), np.int64)
        for i in range(len(terms)):
            df = dfs[i]
            if df == 0:
                continue
            tf = b.column(f"tf_{i}").to_numpy(
                zero_copy_only=False).astype(np.float64)
            idf_v = (float(n_docs) - float(df) + 0.5) / (float(df) + 0.5)
            if idf == "lucene":
                idf_v = float(np.log1p(idf_v))
            # one fixed op order, mirrored literally in the SQL oracle:
            # idf * ((tf*2.5) / (tf + 1.5*(0.25 + (0.75*(dl*N))/SDL)))
            contrib = idf_v * (
                (tf * 2.5)
                / (tf + 1.5 * (0.25 + (0.75 * (dl * float(n_docs)))
                               / float(sum_dl)))
            )
            total = total + np.floor(contrib * 1e6 + 0.5).astype(np.int64)
        keep = total > 0
        return pa.table({
            "doc_id": b.column("doc_id").filter(pa.array(keep)),
            "score_micro": pa.array(total[keep], pa.int64()),
        })

    scored = red.map_batches(score, batch_format="pyarrow")
    order = [("score_micro", "descending"), ("doc_id", "ascending")]

    def local_topk(b: pa.Table) -> pa.Table:
        return b.sort_by(order).slice(0, k)

    def add_key(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_g", pa.nulls(len(b), pa.int32()).fill_null(0))

    def final_rank(group: pa.Table) -> pa.Table:
        group = group.sort_by(order).slice(0, k)
        out = group.select(["doc_id", "score_micro"])
        return out.add_column(
            0, pa.field("rank", pa.int32()),
            pa.array(range(1, len(group) + 1), pa.int32()))

    return (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(final_rank, batch_format="pyarrow")
    )


def hybrid_doc_topk(
    docs: ray.data.Dataset,
    embeddings: ray.data.Dataset,
    terms: list[str],
    k_leg: int = 20,
    k: int = 10,
    rrf_k: int = 60,
    scale: int = 1_000_000,
    idf: str = "lucene",
) -> ray.data.Dataset:
    """Hybrid document retrieval: BM25 lexical top-``k_leg`` ⊕ cosine-ANN
    vector top-``k_leg`` (query = the first embedding row), fused by
    reciprocal-rank fusion — the doc-level twin of
    ``pipelines/query.fused_entities`` and the standard
    keyword-plus-vector hybrid of production RAG stacks (the reference
    pairs keyword-derived graph context with vector search,
    query.go:92-190 + chromem.go:99-147; this operator is the same merge
    at document granularity).

    Fusion is rank-only: contribution = scale // (rrf_k + rank) in int64,
    so the fused score is order-independent and bit-exact against the SQL
    oracle regardless of each leg's internal float story.  Both legs are
    already top-k-pruned (≤ 2·k_leg rows reach the fusion), so the merge
    is one tiny union + groupby-sum + single-group rank.
    Returns (rank, doc_id, rrf_score)."""
    from .similarity import ann_topk

    def contrib(b: pa.Table, id_name: str) -> pa.Table:
        r = b.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.int64(scale) // (r + np.int64(rrf_k))
        return pa.table({
            "doc_id": pc.cast(b.column(id_name).combine_chunks(),
                              pa.int64()),
            "c": pa.array(c, pa.int64()),
        })

    lex = bm25_topk(docs, terms, k=k_leg, idf=idf).map_batches(
        lambda b: contrib(b, "doc_id"), batch_format="pyarrow")
    vec = ann_topk(embeddings, n_queries=1, k=k_leg).map_batches(
        lambda b: contrib(b, "neighbor_id"), batch_format="pyarrow")
    # ONE streaming execution runs both legs concurrently (lazy union);
    # ≤ 2·k_leg contribution rows reach the driver, so the RRF sum + final
    # rank is a bounded driver-side merge (the Q3-top-k pattern) — the
    # groupby exchange + single-group rank round the first version paid
    # were pure fixed overhead on ≤40 rows
    both = pa.Table.from_pylist(
        lex.union(vec).take_all(),
        schema=pa.schema([("doc_id", pa.int64()), ("c", pa.int64())]))
    ids = both.column("doc_id").to_numpy(zero_copy_only=False)
    c = both.column("c").to_numpy(zero_copy_only=False)
    uid, inv = np.unique(ids, return_inverse=True)
    score = np.bincount(inv, weights=c).astype(np.int64)
    top = np.lexsort((uid, -score))[:k]
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int32),
                         pa.int32()),
        "doc_id": pa.array(uid[top], pa.int64()),
        "rrf_score": pa.array(score[top], pa.int64()),
    }))
