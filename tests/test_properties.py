"""Property-based invariants (hypothesis): the determinism claims the
engine's design rests on, tested over random inputs rather than goldens.

* canonicalization is a pure function of the mention SET — physical block
  order, batch size, salt count and row permutation never change the graph
  (SURVEY.md §7.0: determinism via carried occurrence keys, never block
  order);
* merge_cap is associative (first-K capping at every stage == capping once
  at the end);
* the sliding-window chunker covers the input: concatenating windows with
  the overlap removed reproduces the token stream.

These run the shuffle kernels directly (combine → merge → finalize as
plain functions) so hypothesis can iterate fast without Ray jobs.
"""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from go_light_rag_ray.stages.canonicalize import (
    _merge_rows,
    _states_to_table,
    combine_mentions,
    finalize_group,
)
from go_light_rag_ray.stages.chunker import chunk_text
from go_light_rag_ray.stages.extractor import MENTIONS_SCHEMA
from go_light_rag_ray.tokenizer import get_tokenizer

ENTS = ["A", "B", "C"]
TYPES = ["SYSTEM", "DATA", "OP"]


@st.composite
def mention_rows(draw):
    n = draw(st.integers(1, 40))
    rows = []
    for i in range(n):
        doc = draw(st.integers(0, 5))
        kind = draw(st.sampled_from(["entity", "relationship"]))
        row = {
            "doc_id": f"doc-{doc:04d}",
            "chunk_id": f"doc-{doc:04d}-chunk-0",
            "order_index": 0,
            "mention_index": i,
            "kind": kind,
            "name": draw(st.sampled_from(ENTS)) if kind == "entity" else "",
            "type": draw(st.sampled_from(TYPES)) if kind == "entity" else "",
            "src": draw(st.sampled_from(ENTS)) if kind == "relationship" else "",
            "tgt": draw(st.sampled_from(ENTS + ["D"])) if kind == "relationship" else "",
            "description": f"desc-{draw(st.integers(0, 6))}",
            "keywords": draw(st.lists(st.sampled_from(["K1", "K2", "K3"]),
                                      max_size=3)) if kind == "relationship" else [],
            "weight": float(draw(st.integers(1, 5))) if kind == "relationship" else 0.0,
        }
        if row["kind"] == "relationship" and row["src"] == row["tgt"]:
            row["tgt"] = "D"
        rows.append(row)
    return rows


def _graph_of(rows, batch_size, salt_buckets, merge_cap=0):
    """Run the canonicalize kernels directly over explicit batch splits."""
    partial_tables = []
    for i in range(0, len(rows), batch_size):
        batch = pa.Table.from_pylist(rows[i:i + batch_size], schema=MENTIONS_SCHEMA)
        partial_tables.append(combine_mentions(batch, salt_buckets, merge_cap))
    partials = pa.concat_tables(partial_tables)
    # group by (kind, k1, k2) exactly as the shuffle would
    out = {}
    keys = set(zip(partials.column("kind").to_pylist(),
                   partials.column("k1").to_pylist(),
                   partials.column("k2").to_pylist()))
    import pyarrow.compute as pc

    for kind, k1, k2 in sorted(keys):
        mask = pc.and_(
            pc.and_(pc.equal(partials.column("kind"), kind),
                    pc.equal(partials.column("k1"), k1)),
            pc.equal(partials.column("k2"), k2),
        )
        group = partials.filter(mask)
        row = finalize_group(group, merge_cap).to_pylist()[0]
        out[(kind, k1, k2)] = row
    return out


@settings(max_examples=30, deadline=None)
@given(rows=mention_rows(), batch_a=st.integers(1, 40), batch_b=st.integers(1, 40),
       salt_a=st.integers(1, 16), salt_b=st.integers(1, 16),
       seed=st.randoms(use_true_random=False))
def test_canonicalize_invariant_to_physical_order(rows, batch_a, batch_b,
                                                  salt_a, salt_b, seed):
    shuffled = list(rows)
    seed.shuffle(shuffled)
    a = _graph_of(rows, batch_a, salt_a)
    b = _graph_of(shuffled, batch_b, salt_b)
    assert a == b


@settings(max_examples=30, deadline=None)
@given(rows=mention_rows(), batch=st.integers(1, 40), cap=st.integers(1, 8))
def test_merge_cap_is_associative(rows, batch, cap):
    """Capping at every stage == capping the exact result once."""
    capped = _graph_of(rows, batch, salt_buckets=4, merge_cap=cap)
    exact = _graph_of(rows, batch, salt_buckets=4, merge_cap=0)
    for key, row in capped.items():
        for field in ("descriptions", "keywords", "source_ids"):
            assert row[field] == exact[key][field][:cap] or \
                row[field] == exact[key][field]  # short lists unaffected
        assert row["weight"] == exact[key]["weight"]
        assert row["mention_count"] == exact[key]["mention_count"]


@settings(max_examples=50, deadline=None)
@given(words=st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                      min_size=0, max_size=120),
       max_tokens=st.integers(2, 30), overlap=st.integers(0, 10))
def test_chunker_windows_cover_input(words, max_tokens, overlap):
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    text = " ".join(words)
    tok = get_tokenizer("whitespace")
    chunks = chunk_text(text, tok, max_tokens, overlap)
    if not text:
        assert chunks == []
        return
    # reconstruct: first window whole, then each window minus its overlap
    stride = max_tokens - overlap
    rebuilt: list[str] = []
    for content, token_size, idx in chunks:
        toks = content.split()
        assert token_size == len(toks) <= max_tokens
        rebuilt.extend(toks if idx == 0 else toks[overlap:] if len(toks) > overlap else [])
        assert idx == chunks.index((content, token_size, idx))
    # every input token appears, in order, exactly once
    expected = text.split()
    # windows past the end can duplicate the tail; dedupe by position count
    assert rebuilt[: len(expected)] == expected


FIXED_TYPE = {"A": "SYSTEM", "B": "DATA", "C": "OP"}


@settings(max_examples=25, deadline=None)
@given(rows=mention_rows(), cut=st.floats(0.1, 0.9), batch=st.integers(1, 40))
def test_incremental_merge_is_associative(rows, cut, batch):
    """graph(part1 ∪ part2) == incremental(graph(part1), part2) for splits
    ordered by occurrence (doc_id carries the order).

    Scope: entity mentions carry a consistent type per name (what real
    extractors emit — type is a function of the gazetteer).  When mentions
    DISAGREE on type, exact associativity of the mode vote is impossible:
    the snapshot stores only the winning type (the reference has the same
    information loss, insert.go:522-527) — documented in
    graph_to_partials's docstring."""
    from go_light_rag_ray.stages.canonicalize import graph_to_partials

    for r in rows:
        if r["kind"] == "entity":
            r["type"] = FIXED_TYPE[r["name"]]
    rows = sorted(rows, key=lambda r: (r["doc_id"], r["mention_index"]))
    k = max(1, min(len(rows) - 1, int(len(rows) * cut)))
    part1, part2 = rows[:k], rows[k:]
    if not part2:
        return

    one_shot = _graph_of(rows, batch, salt_buckets=4)

    # snapshot part1's graph, convert to partials, merge with part2 partials
    g1 = _graph_of(part1, batch, salt_buckets=4)
    import pyarrow as pa

    from go_light_rag_ray.stages.canonicalize import (
        GRAPH_SCHEMA,
        combine_mentions,
        finalize_group,
    )

    snapshot = pa.Table.from_pylist(list(g1.values()), schema=GRAPH_SCHEMA)
    prior_partials = graph_to_partials(snapshot, salt_buckets=4)
    new_tables = [prior_partials]
    for i in range(0, len(part2), batch):
        b = pa.Table.from_pylist(part2[i:i + batch], schema=MENTIONS_SCHEMA)
        new_tables.append(combine_mentions(b, 4))
    partials = pa.concat_tables(new_tables)

    import pyarrow.compute as pc

    merged = {}
    keys = set(zip(partials.column("kind").to_pylist(),
                   partials.column("k1").to_pylist(),
                   partials.column("k2").to_pylist()))
    for kind, k1, k2 in sorted(keys):
        mask = pc.and_(
            pc.and_(pc.equal(partials.column("kind"), kind),
                    pc.equal(partials.column("k1"), k1)),
            pc.equal(partials.column("k2"), k2),
        )
        merged[(kind, k1, k2)] = finalize_group(
            partials.filter(mask)).to_pylist()[0]
    assert merged == one_shot


# ---------------------------------------------------------------------------
# vectorized extraction ≡ per-row rule engine
# ---------------------------------------------------------------------------

_VOCAB_WORDS = ["spark", "customer", "vector", "table", "stream", "batch",
                "query", "join", "window", "hash", "merge", "scan",
                "noise", "filler", "x", ""]


@st.composite
def word_docs(draw):
    n_docs = draw(st.integers(1, 6))
    docs = []
    for i in range(n_docs):
        words = draw(st.lists(st.sampled_from(_VOCAB_WORDS), max_size=25))
        sep = draw(st.sampled_from([" ", "  ", " \t ", "\n"]))
        docs.append(sep.join(words) + draw(st.sampled_from(["", " ", "\n "])))
    return docs


@settings(max_examples=40, deadline=None)
@given(docs=word_docs())
def test_vectorized_extraction_equals_per_row(docs):
    """For ANY whitespace-noisy word stream, the Arrow/numpy kernel and the
    per-row rule engine emit identical mention tables (incl. mention_index
    sequencing)."""
    import pyarrow as pa

    from go_light_rag_ray.stages.extractor import (
        Extractor,
        WordCooccurrenceRules,
    )

    batch = pa.table({
        "doc_id": [f"doc-{i:09d}" for i in range(len(docs))],
        "chunk_id": [f"doc-{i:09d}-chunk-0" for i in range(len(docs))],
        "order_index": pa.array([0] * len(docs), pa.int32()),
        "content": docs,
    })
    fast = Extractor(rules="word_cooccurrence")(batch)
    orig = WordCooccurrenceRules.extract_batch
    try:
        del WordCooccurrenceRules.extract_batch
        slow = Extractor(rules="word_cooccurrence")(batch)
    finally:
        WordCooccurrenceRules.extract_batch = orig
    key = lambda r: (r["chunk_id"], r["mention_index"])
    assert sorted(fast.to_pylist(), key=key) == sorted(
        slow.to_pylist(), key=key)


@given(
    lk=st.lists(st.integers(0, 30), min_size=0, max_size=60),
    rk=st.lists(st.integers(0, 35), min_size=0, max_size=40),
    buckets=st.integers(1, 16),
    salt=st.integers(1, 4),
)
@settings(max_examples=60, deadline=None)
def test_bucketed_join_partition_is_lossless(lk, rk, buckets, salt):
    """The theorem shuffle_join rests on: hash-partitioning both sides by
    fib_hash(key) % B and joining per bucket yields EXACTLY the global
    join — no row lost, none duplicated — including the salted variant
    (left rows spread over S sub-buckets, right rows replicated into all
    S).  Pure-Arrow emulation of relational.shuffle_join's pad/join
    closures, so hypothesis can sweep inputs without Ray jobs."""
    import numpy as np

    from go_light_rag_ray.stages.relational import _bucket_of

    left = pa.table({
        "__k": pa.array(lk, pa.int64()),
        "lv": pa.array(range(len(lk)), pa.int64()),
    })
    right = pa.table({
        "__k": pa.array(rk, pa.int64()),
        "rv": pa.array(range(len(rk)), pa.int64()),
    })
    want = sorted(
        tuple(r.values())
        for r in left.join(right, keys="__k", join_type="inner").to_pylist())

    lb = _bucket_of(np.asarray(lk, np.int64), buckets)
    rep = np.repeat(np.arange(len(rk)), salt)
    rb = _bucket_of(np.asarray(rk, np.int64)[rep], buckets)
    if salt > 1:
        lb = lb * salt + np.arange(len(lk), dtype=np.int64) % salt
        rb = rb * salt + np.arange(len(rep), dtype=np.int64) % salt
    right_rep = right.take(rep)
    got = []
    for b in range(buckets * salt):
        lt = left.filter(pa.array(lb == b))
        rt = right_rep.filter(pa.array(rb == b))
        got.extend(tuple(r.values()) for r in
                   lt.join(rt, keys="__k", join_type="inner").to_pylist())
    assert sorted(got) == want


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.text(
        alphabet=st.sampled_from(list("abcz 0123XY.,'\t\n\x00é ")),
        max_size=60),
    min_size=1, max_size=8))
def test_chunker_fast_path_fuzz(texts):
    """Property: the vectorized batched Chunker emits rows identical to
    the per-doc chunk_text kernel for ARBITRARY content (the fast-path
    guard must never change output, only speed)."""
    import pyarrow as pa

    from go_light_rag_ray.stages.chunker import (
        Chunker,
        ChunkerConfig,
        chunk_text,
        clean_content,
    )
    from go_light_rag_ray.tokenizer import get_tokenizer

    cfg = ChunkerConfig(tokenizer="regex", content_mode="text",
                        max_tokens=8, overlap_tokens=2)
    tok = get_tokenizer("regex")
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    want = []
    for i, t in enumerate(texts):
        doc_id = cfg.doc_id_format.format(i)
        for piece, ts, oi in chunk_text(clean_content(t), tok,
                                        cfg.max_tokens, cfg.overlap_tokens):
            want.append((f"{doc_id}-chunk-{oi}", doc_id, oi, piece, ts))
    got = Chunker(cfg)(batch)
    got_rows = list(zip(
        got.column("chunk_id").to_pylist(), got.column("doc_id").to_pylist(),
        got.column("order_index").to_pylist(),
        got.column("content").to_pylist(),
        got.column("token_size").to_pylist()))
    assert got_rows == want


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                max_size=40),
       st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                max_size=40))
def test_lp_digits_order_preserving(xs, ys):
    """Property: the length-prefixed decimal encoding is order-preserving
    and prefix-free — byte order of lp(a)+lp(b) == tuple order (a, b)."""
    from go_light_rag_ray.stages.canonicalize import _lp_digits

    import numpy as np

    enc_x = _lp_digits(np.array(xs, np.int64)).to_pylist()
    assert sorted(enc_x) == [e for _, e in sorted(zip(xs, enc_x))]
    # pairwise concatenation preserves tuple order
    n = min(len(xs), len(ys))
    pairs = list(zip(xs[:n], ys[:n]))
    enc_y = _lp_digits(np.array(ys, np.int64)).to_pylist()
    joined = [ex + ey for ex, ey in zip(enc_x[:n], enc_y[:n])]
    order_t = sorted(range(n), key=lambda i: pairs[i])
    order_s = sorted(range(n), key=lambda i: (joined[i], i))
    # stable tie handling: compare full sort of (pair) vs (joined)
    assert [pairs[i] for i in order_t] == sorted(pairs)
    assert sorted(joined) == [joined[i] for i in
                              sorted(range(n), key=lambda i: (pairs[i], joined[i]))]


# ---- r5 hash / key kernels (pure numpy+arrow, no Ray session) ----------


@given(st.lists(st.one_of(st.integers(0, 2**62),
                          st.text(alphabet=st.characters(
                              codec="ascii", exclude_categories=("Cc",)),
                              max_size=24)),
                max_size=60),
       st.text(alphabet="abcxyz", max_size=6))
@settings(max_examples=60, deadline=None)
def test_bucket_batch_property(keys, salt):
    """Batched md5 bucket == per-row int(hexdigest()[:8], 16) for mixed
    int/string keys (cast per column type, so split by type)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from go_light_rag_ray.stages.sampling import _bucket_batch, _md5_hex8_batch

    for vals, typ in ((
        [k for k in keys if isinstance(k, int)], pa.int64()), (
        [k for k in keys if isinstance(k, str)], pa.string())):
        arr = pa.array(vals, typ)
        ref = np.array(
            [int(hashlib.md5(f"{salt}{v}".encode()).hexdigest()[:8], 16)
             for v in vals], np.uint32)
        got = _bucket_batch(arr, salt)
        assert (got == ref).all()
        hx = [hashlib.md5(f"{salt}{v}".encode()).hexdigest()[:8]
              for v in vals]
        assert _md5_hex8_batch(arr, salt).to_pylist() == hx


@given(st.lists(st.tuples(st.floats(0, 999, allow_nan=False,
                                    allow_infinity=False),
                          st.integers(0, 10**9)),
                min_size=1, max_size=50, unique_by=lambda t: t[1]))
@settings(max_examples=60, deadline=None)
def test_score_id_key_orders_like_tuple(pairs):
    """_score_id_key string order must equal (micro-score, id) tuple order
    in both directions."""
    import numpy as np
    import pyarrow as pa

    from go_light_rag_ray.stages.packing import _score_id_key

    scores = [round(s, 6) for s, _ in pairs]
    ids = [i for _, i in pairs]
    b = pa.table({"score": pa.array(scores, pa.float64()),
                  "doc_id": pa.array(ids, pa.int64())})
    for desc in (False, True):
        keys = _score_id_key(b, "score", "doc_id", desc, 1_000_000
                             ).to_pylist()
        micro = [int(np.rint(s * 1e6)) for s in scores]
        want = sorted(range(len(ids)),
                      key=lambda j: (-micro[j] if desc else micro[j],
                                     ids[j]))
        got = sorted(range(len(ids)), key=lambda j: keys[j])
        assert got == want
