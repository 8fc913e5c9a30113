"""Dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.dedup import (
    SimHasher,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",        # 0
    "the quick brown fox jumps over the lazy dog",        # 1: exact dup of 0
    "the quick brown fox jumps over the sleepy dog",      # 2: near dup of 0
    "completely different words entirely here now folks", # 3
    "pack my box with five dozen liquor jugs today",      # 4
]


def _docs():
    return ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    )


def test_exact_dedup_groups():
    rows = exact_dedup(_docs()).take_all()
    by_hash = {r["text_hash"]: r for r in rows}
    assert len(rows) == 4  # 0 and 1 collapse
    dup = by_hash[hashlib.md5(TEXTS[0].encode()).hexdigest()]
    assert dup["canonical_doc_id"] == 0
    assert dup["dup_count"] == 2
    assert all(r["dup_count"] == 1 for r in rows if r is not dup)


def test_minhash_signature_deterministic():
    rows = minhash_signatures(_docs(), num_perm=8, concurrency=1).take_all()
    by_id = {r["doc_id"]: list(r["signature"]) for r in rows}
    assert by_id[0] == by_id[1]            # exact dups → identical sigs
    assert by_id[0] != by_id[3]
    assert all(len(s) == 8 for s in by_id.values())
    # a permutation value is min over shingles of the affine universal hash
    from go_light_rag_ray.stages.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        _shingle_base_hash,
    )

    toks = TEXTS[3].split()
    shingles = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    expect = min(
        (MINHASH_A[0] * _shingle_base_hash(s) + MINHASH_B[0]) % MINHASH_P
        for s in shingles
    )
    assert by_id[3][0] == expect


def test_minhash_lsh_finds_near_dups():
    pairs = {(r["a"], r["b"]) for r in
             minhash_lsh_pairs(_docs(), num_perm=16, bands=8).take_all()}
    assert (0, 1) in pairs           # exact dup always collides
    assert (0, 2) in pairs           # near dup shares most shingles
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_simhash_properties():
    rows = simhash_fingerprints(_docs(), bits=16, concurrency=1).take_all()
    by_id = {r["doc_id"]: r["simhash"] for r in rows}
    assert by_id[0] == by_id[1]
    assert 0 <= by_id[0] < 2 ** 16
    ham_near = bin(by_id[0] ^ by_id[2]).count("1")
    ham_far = bin(by_id[0] ^ by_id[3]).count("1")
    assert ham_near < ham_far


def test_simhash_cache_is_actor_state():
    sh = SimHasher(bits=16)
    sh(pa.table({"doc_id": [0], "text": ["alpha beta"]}))
    assert set(sh._cache) == {"alpha", "beta"}
    sh(pa.table({"doc_id": [1], "text": ["beta gamma"]}))
    assert set(sh._cache) == {"alpha", "beta", "gamma"}


def test_ngram_jaccard_exact_values():
    rows = ngram_jaccard_pairs(_docs(), shingle_k=3, threshold=0.3).take_all()
    by_pair = {(r["a"], r["b"]): r["jaccard"] for r in rows}
    assert by_pair[(0, 1)] == 1.0
    # doc0 vs doc2: 9 words → 7 shingles each; word 8 differs ("lazy" vs
    # "sleepy"), touching the last 2 shingles → 5 common of 9 union
    assert by_pair[(0, 2)] == pytest.approx(5 / 9)
    assert (0, 3) not in by_pair


def test_embedding_dup_pairs():
    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    # keep the bucketed dims comfortably away from 0 so the tiny noise on
    # the near-dup cannot flip a sign bit (the documented recall caveat)
    base[:8] += np.sign(base[:8]) * 0.5
    vecs = [
        base,                                  # 0
        base + rng.normal(scale=1e-3, size=16),  # 1: near-dup of 0
        rng.normal(size=16),                   # 2
        -base,                                 # 3: opposite bucket & sim
    ]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": [0, 1, 2, 3],
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    rows = embedding_dup_pairs(ds, threshold=0.99, sign_bits=8).take_all()
    pairs = {(r["a"], r["b"]): r["cos_sim"] for r in rows}
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] >= 0.99


def test_cluster_duplicates_transitive_components():
    from go_light_rag_ray.stages.dedup import cluster_duplicates

    docs = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2, 3, 4, 5]}))
    # chain 0-1, 1-2 (transitive) and pair 4-5; 3 is a singleton
    pairs = ray.data.from_arrow(pa.table({"a": [0, 1, 4], "b": [1, 2, 5]}))
    rows = {r["doc_id"]: r["cluster_id"]
            for r in cluster_duplicates(docs, pairs).take_all()}
    assert rows == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_cluster_duplicates_no_pairs_identity():
    from go_light_rag_ray.stages.dedup import cluster_duplicates

    docs = ray.data.from_arrow(pa.table({"doc_id": [7, 8]}))
    pairs = ray.data.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                          "b": pa.array([], pa.int64())}))
    rows = {r["doc_id"]: r["cluster_id"]
            for r in cluster_duplicates(docs, pairs).take_all()}
    assert rows == {7: 7, 8: 8}


def test_cluster_duplicates_distributed_label_propagation():
    """max_driver_pairs=0 + cc_local_threshold=0 forces the round-loop
    min-label-propagation path: a chain component spread over several blocks
    (multi-round convergence) plus an isolated pair and singletons, string
    ids, no driver union-find, no single-block collapse."""
    from go_light_rag_ray.stages.dedup import cluster_duplicates

    ids = [f"d{i:02d}" for i in range(12)]
    docs = ray.data.from_arrow(pa.table({"doc_id": ids}))
    # chain d00-d01-...-d07 (diameter 7 → several propagation rounds),
    # pair d09-d10; d08 and d11 singletons
    chain = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(7)]
    pairs_tbl = pa.table({
        "a": [a for a, _ in chain] + ["d09"],
        "b": [b for _, b in chain] + ["d10"],
    })
    pairs = ray.data.from_arrow(pa.table(pairs_tbl.to_pydict())).repartition(4)
    rows = {r["doc_id"]: r["cluster_id"]
            for r in cluster_duplicates(docs, pairs, max_driver_pairs=0,
                                        cc_local_threshold=0).take_all()}
    want = {f"d{i:02d}": "d00" for i in range(8)}
    want.update({"d08": "d08", "d09": "d09", "d10": "d09", "d11": "d11"})
    assert rows == want


def test_cluster_duplicates_single_task_cc_path():
    """The adaptive single-block union-find path (pairs ≤ local threshold,
    driver path disabled) matches the round loop's output exactly."""
    from go_light_rag_ray.stages.dedup import cluster_duplicates

    ids = [f"d{i:02d}" for i in range(12)]
    docs = ray.data.from_arrow(pa.table({"doc_id": ids}))
    chain = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(7)]
    pairs = ray.data.from_arrow(pa.table({
        "a": [a for a, _ in chain] + ["d09"],
        "b": [b for _, b in chain] + ["d10"],
    })).repartition(4)
    rows = {r["doc_id"]: r["cluster_id"]
            for r in cluster_duplicates(docs, pairs,
                                        max_driver_pairs=0).take_all()}
    want = {f"d{i:02d}": "d00" for i in range(8)}
    want.update({"d08": "d08", "d09": "d09", "d10": "d09", "d11": "d11"})
    assert rows == want


def test_cluster_duplicates_paths_agree():
    """Driver union-find and distributed propagation produce identical
    assignments on the same random-ish pair graph."""
    from go_light_rag_ray.stages.dedup import cluster_duplicates

    n = 40
    ids = list(range(n))
    docs = ray.data.from_arrow(pa.table({"doc_id": ids}))
    a = [i for i in range(0, n - 3, 3)]
    b = [(i * 7 + 2) % n for i in range(0, n - 3, 3)]
    keep = [(x, y) for x, y in zip(a, b) if x != y]
    pairs = ray.data.from_arrow(pa.table(
        {"a": [x for x, _ in keep], "b": [y for _, y in keep]})).repartition(3)
    via_driver = {r["doc_id"]: r["cluster_id"]
                  for r in cluster_duplicates(docs, pairs).take_all()}
    via_local = {r["doc_id"]: r["cluster_id"]
                 for r in cluster_duplicates(docs, pairs,
                                             max_driver_pairs=0).take_all()}
    via_loop = {r["doc_id"]: r["cluster_id"]
                for r in cluster_duplicates(docs, pairs, max_driver_pairs=0,
                                            cc_local_threshold=0).take_all()}
    assert via_driver == via_local == via_loop


def test_hot_bucket_guard_caps_pathological_shingle():
    """Skew stress: one stop-shingle shared by EVERY doc would emit O(n²)
    pairs; the production max_group default drops that bucket while real
    near-dup pairs (sharing many rare shingles) survive."""
    from go_light_rag_ray.stages.dedup import (
        PRODUCTION_MAX_GROUP,
        ngram_jaccard_pairs,
    )

    n = 60
    stop = "the quick brown"  # 3-shingle present in every doc
    texts = []
    for i in range(n):
        texts.append(f"{stop} unique{i} a{i} b{i} c{i} d{i} e{i}")
    # docs 0 and 1 are near-identical (doc 1 = doc 0 + one trailing word)
    texts[1] = texts[0] + " f0"
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(n)), "text": texts}))

    assert PRODUCTION_MAX_GROUP > 0  # guard on by default
    capped = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.3,
                                 max_group=10).take_all()
    capped_pairs = {(r["a"], r["b"]) for r in capped}
    assert (0, 1) in capped_pairs          # real near-dup survives
    # the stop-shingle alone can no longer connect unrelated docs: without
    # the cap every doc pair shares ≥1 shingle; with it, only genuinely
    # similar pairs reach the threshold
    assert all(a == 0 and b == 1 for a, b in capped_pairs)

    exact = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.3,
                                max_group=0).take_all()
    assert {(r["a"], r["b"]) for r in exact} >= capped_pairs


def test_decontamination_flags_overlap():
    """Corpus docs quoting the eval set get flagged; clean docs don't; the
    contamination ratio is matched/total shingles."""
    from go_light_rag_ray.stages.decontam import decontaminate

    eval_docs = ray.data.from_arrow(pa.table({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            "intro words then the quick brown fox appears verbatim",  # quote
            "completely unrelated clean text with other words",        # clean
            "the quick brown fox jumps over the lazy dog",             # full copy
        ],
    }))
    rows = {r["doc_id"]: r
            for r in decontaminate(corpus, eval_docs, shingle_k=3).take_all()}
    assert set(rows) == {0, 2}
    assert rows[2]["matched_shingles"] == rows[2]["n_shingles"]  # full copy
    assert rows[2]["contamination"] == 1.0
    assert 0 < rows[0]["contamination"] < 1.0

    # higher threshold drops the partial quote, keeps the copy
    strict = {r["doc_id"] for r in decontaminate(
        corpus, eval_docs, shingle_k=3, min_matches=5).take_all()}
    assert strict == {2}


def test_decontamination_bloom_matches_exact():
    """At the default 2^20-bit filter the false-positive probability on a
    fixture-sized shingle set is ~1e-14 AND deterministic, so the Bloom
    twin reproduces the exact path row-for-row; a degenerate 64-bit
    filter must over-flag (superset), never under-flag."""
    from go_light_rag_ray.stages.decontam import (
        decontaminate,
        decontaminate_bloom,
    )

    eval_docs = ray.data.from_arrow(pa.table({
        "doc_id": [100],
        "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            "intro words then the quick brown fox appears verbatim",
            "completely unrelated clean text with other words",
            "the quick brown fox jumps over the lazy dog",
        ],
    }))
    exact = {r["doc_id"]: (r["n_shingles"], r["matched_shingles"],
                           r["contamination"])
             for r in decontaminate(corpus, eval_docs,
                                    shingle_k=3).take_all()}
    bloom = {r["doc_id"]: (r["n_shingles"], r["matched_shingles"],
                           r["contamination"])
             for r in decontaminate_bloom(corpus, eval_docs,
                                          shingle_k=3).take_all()}
    assert bloom == exact

    # degenerate filter: everything collides → flags are a superset and
    # per-doc matched counts never drop below the exact counts
    tiny = {r["doc_id"]: r["matched_shingles"]
            for r in decontaminate_bloom(corpus, eval_docs, shingle_k=3,
                                         m_bits=64).take_all()}
    assert set(tiny) >= set(exact)
    for d, (_, m, _) in exact.items():
        assert tiny[d] >= m


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup)
# ---------------------------------------------------------------------------

def _sem_embeddings():
    rng = np.random.RandomState(9)
    mat = rng.normal(size=(24, 12))
    mat[10] = mat[3] * 2.0 + 1e-4          # exact-direction dup of 3
    mat[17] = mat[3] + rng.normal(scale=1e-3, size=12)  # near dup of 3
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(24)),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    }))
    return ds, mat


def test_semantic_dedup_finds_planted_dups():
    from go_light_rag_ray.stages.dedup import semantic_dedup

    ds, mat = _sem_embeddings()
    rows = semantic_dedup(ds, n_centroids=4, threshold=0.99).take_all()
    got = {r["vec_id"]: r["dup_of"] for r in rows}
    # both planted copies mark vec 3 (their smallest qualifying lower id)
    assert got[10] == 3
    assert got[17] == 3
    for r in rows:
        assert r["cos_sim"] >= 0.99
        assert r["dup_of"] < r["vec_id"]


def test_semantic_dedup_matches_numpy_reference():
    from go_light_rag_ray.stages.dedup import semantic_dedup

    ds, mat = _sem_embeddings()
    t = 0.5
    rows = semantic_dedup(ds, n_centroids=4, threshold=t).take_all()
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    cmat = unit[:4]
    cell = np.argmax(np.round(unit @ cmat.T, 6), axis=1)
    sims = np.round(unit @ unit.T, 6)
    want = {}
    for i in range(24):
        js = [j for j in range(i)
              if cell[j] == cell[i] and sims[i, j] >= t]
        if js:
            want[i] = (min(js), sims[i, min(js)])
    got = {r["vec_id"]: (r["dup_of"], r["cos_sim"]) for r in rows}
    assert got == want


def test_semantic_dedup_max_group_drops_hot_cluster():
    from go_light_rag_ray.stages.dedup import semantic_dedup

    ds, _ = _sem_embeddings()
    rows = semantic_dedup(ds, n_centroids=1, threshold=0.0,
                          max_group=5).take_all()
    assert rows == []  # the single 24-wide cluster exceeds the cap


def test_decontamination_multi_matches_per_suite_runs():
    """The one-scan matrix must equal D independent decontaminate runs:
    per-suite matched counts identical, flag = union of the suites."""
    from go_light_rag_ray.stages.decontam import (
        decontaminate,
        decontaminate_multi,
    )

    suites = {
        "fox": ray.data.from_arrow(pa.table({
            "doc_id": [100],
            "text": ["the quick brown fox jumps over the lazy dog"]})),
        "rag": ray.data.from_arrow(pa.table({
            "doc_id": [101],
            "text": ["retrieval augmented generation improves grounding"]})),
    }
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "intro words then the quick brown fox appears verbatim",
            "completely unrelated clean text with other words",
            "they say retrieval augmented generation improves recall",
            # overlaps BOTH suites
            "the quick brown fox likes retrieval augmented generation",
        ],
    }))
    multi = {r["doc_id"]: r for r in decontaminate_multi(
        corpus, suites, shingle_k=3).take_all()}
    assert set(multi) == {0, 2, 3}
    for name, eval_ds in suites.items():
        single = {r["doc_id"]: r["matched_shingles"] for r in decontaminate(
            corpus, eval_ds, shingle_k=3, flag_only=False).take_all()}
        for doc_id, row in multi.items():
            assert row[f"matched_{name}"] == single[doc_id], (name, doc_id)
    assert multi[3]["matched_fox"] > 0 and multi[3]["matched_rag"] > 0


def test_keep_best_selects_argmax_with_tiebreak():
    """Per cluster: highest quality wins, exact ties go to the smallest
    doc id, and n_members counts the whole cluster across batches."""
    from go_light_rag_ray.stages.dedup import keep_best

    clusters = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "cluster_id": pa.array([0, 0, 0, 3, 3, 5], pa.int64()),
    })).repartition(3)
    scored = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "quality": pa.array([0.5, 0.9, 0.9, 0.2, 0.2, 0.7], pa.float64()),
    })).repartition(2)
    rows = {r["cluster_id"]: r
            for r in keep_best(clusters, scored).take_all()}
    assert rows[0]["keep_doc_id"] == 1 and rows[0]["n_members"] == 3  # tie->min id
    assert rows[3]["keep_doc_id"] == 3 and rows[3]["n_members"] == 2
    assert rows[5]["keep_doc_id"] == 5 and rows[5]["n_members"] == 1
    assert rows[0]["quality"] == 0.9


def test_keep_best_segment_strategy_identical():
    """The segment path (composite bit-order key through sorted_reduce)
    must emit exactly the grouped path's rows, ties included."""
    import numpy as np

    from go_light_rag_ray.stages.dedup import keep_best

    rng = np.random.default_rng(9)
    n = 300
    clusters = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "cluster_id": pa.array(rng.integers(0, 80, n), pa.int64()),
    })).repartition(5)
    # coarse scores force plenty of exact ties
    scored = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "quality": pa.array(rng.integers(0, 5, n) / 4.0, pa.float64()),
    })).repartition(4)
    grouped = sorted(tuple(sorted(r.items())) for r in
                     keep_best(clusters, scored).take_all())
    segment = sorted(tuple(sorted(r.items())) for r in
                     keep_best(clusters, scored,
                               strategy="segment").take_all())
    assert grouped == segment
    assert len(grouped) == len({r[0][1] for r in grouped})  # one per cluster


def test_keep_best_segment_handles_negative_zero():
    """-0.0 scores must canonicalize to +0.0 in the segment path's
    bit-order key (identical tie-break to grouped); NaN is refused."""
    import numpy as np
    import pytest

    from go_light_rag_ray.stages.dedup import keep_best

    clusters = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "cluster_id": pa.array([0, 0, 0], pa.int64()),
    }))
    scored = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "quality": pa.array([-0.0, 1.0, 0.0], pa.float64()),
    }))
    for strat in ("grouped", "segment"):
        rows = keep_best(clusters, scored, strategy=strat).take_all()
        assert rows[0]["keep_doc_id"] == 1, strat
    bad = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "quality": pa.array([np.nan], pa.float64()),
    }))
    with pytest.raises(Exception):
        keep_best(clusters, bad, strategy="segment").take_all()
