"""Repetition signals, stratified sampling, per-key quantiles."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.quantiles import group_quantiles
from go_light_rag_ray.stages.repetition import repetition_signals
from go_light_rag_ray.stages.sampling import stratified_sample


def _by_id(rows, key="doc_id"):
    return {r[key]: r for r in rows}


def test_repetition_signals_hand_computed(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a a a a",          # one word repeated 4x
            "a b a b",          # bigrams: ab, ba, ab → top bigram 2/3
            "w x y z",          # all distinct
            "   ",              # whitespace-only → no row
        ],
    }))
    rows = repetition_signals(docs).take_all()
    out = _by_id(rows)
    # flaky under the full suite (2026-08-18, twice): a row for the
    # whitespace-only doc appeared — dump everything when it recurs
    assert set(out) == {0, 1, 2}, f"unexpected rows: {sorted(rows, key=lambda r: r['doc_id'])}"

    r0 = out[0]
    assert r0["n_words"] == 4 and r0["n_distinct_words"] == 1
    assert r0["top_word_count"] == 4
    assert r0["dup_word_frac"] == 0.75 and r0["top_word_frac"] == 1.0
    assert r0["n_bigrams"] == 3 and r0["n_distinct_bigrams"] == 1
    assert r0["dup_bigram_frac"] == round(2 / 3, 6) + 1e-6 * 0  # 0.666667
    assert abs(r0["dup_bigram_frac"] - 0.666667) < 1e-12

    r1 = out[1]
    assert r1["n_words"] == 4 and r1["n_distinct_words"] == 2
    assert r1["n_bigrams"] == 3 and r1["n_distinct_bigrams"] == 2
    assert r1["top_bigram_count"] == 2

    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0 and r2["dup_bigram_frac"] == 0.0
    assert r2["top_word_frac"] == 0.25


def test_repetition_no_cross_doc_bigrams(ray_session):
    # the last word of doc i and first of doc i+1 must NOT form a bigram
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1], "text": ["p q", "q p"]}))
    out = _by_id(repetition_signals(docs).take_all())
    assert out[0]["n_bigrams"] == 1 and out[0]["n_distinct_bigrams"] == 1
    assert out[1]["n_bigrams"] == 1


def test_stratified_sample_deterministic_and_capped(ray_session):
    t = pa.table({
        "doc_id": list(range(100)),
        "grp": [("g%d" % (i % 3)) for i in range(100)],
    })
    ds = ray.data.from_arrow(t)
    rows = stratified_sample(ds, "grp", 5, id_col="doc_id").take_all()
    per = {}
    for r in rows:
        per.setdefault(r["grp"], []).append((r["sample_rank"], r["doc_id"]))
    assert set(per) == {"g0", "g1", "g2"}
    for g, picks in per.items():
        assert len(picks) == 5
        assert sorted(p[0] for p in picks) == [1, 2, 3, 4, 5]
    # stable under a different physical layout
    again = stratified_sample(ds.repartition(11), "grp", 5).take_all()
    assert sorted((r["grp"], r["sample_rank"], r["doc_id"]) for r in rows) == \
        sorted((r["grp"], r["sample_rank"], r["doc_id"]) for r in again)


def test_stratified_sample_small_group_returns_all(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3], "grp": ["a", "a", "b"]}))
    rows = stratified_sample(ds, "grp", 10).take_all()
    assert len(rows) == 3


def test_group_quantiles_matches_numpy_rank_pick(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=1000)
    keys = rng.choice(["a", "b", "c"], size=1000)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    rows = group_quantiles(ds, "k", "v").take_all()
    got = {(r["k"], r["q"]): r["quantile_value"] for r in rows}
    for k in "abc":
        v = np.sort(vals[keys == k])
        n = len(v)
        for q in (0.25, 0.5, 0.75, 0.9):
            assert got[(k, q)] == v[max(1, math.ceil(q * n)) - 1]
    assert {r["n"] for r in rows if r["k"] == "a"} == {int((keys == "a").sum())}


def test_kll_sketch_rank_error_bound():
    """Single-stream and 8-way-merged sketches stay within ~1% rank error
    at capacity 200 (KLL's O(n/k) bound with slack)."""
    from go_light_rag_ray.stages.kll import KLL, kll_merge_packed, kll_pack

    rng = np.random.default_rng(3)
    data = rng.exponential(size=100_000)
    v = np.sort(data)

    s = KLL(200)
    for chunk in np.array_split(data, 23):
        s.update(chunk)
    parts = []
    for chunk in np.array_split(data, 8):
        p = KLL(200)
        p.update(chunk)
        parts.append(kll_pack(p))
    merged = kll_merge_packed(parts, 200)
    assert merged.n == len(data)

    for sk in (s, merged):
        for q in (0.1, 0.5, 0.9, 0.99):
            est_rank = np.searchsorted(v, sk.quantile(q))
            true_rank = max(1, math.ceil(q * len(data)))
            assert abs(est_rank - true_rank) / len(data) < 0.01


def test_group_quantiles_sketch_close_to_exact(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.normal(size=20_000)
    keys = rng.choice(["a", "b"], size=20_000)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(8)
    exact = {(r["k"], r["q"]): r for r in
             group_quantiles(ds, "k", "v").take_all()}
    sk = {(r["k"], r["q"]): r for r in
          group_quantiles(ds, "k", "v", strategy="sketch").take_all()}
    assert set(exact) == set(sk)
    for key, er in exact.items():
        sr = sk[key]
        assert sr["n"] == er["n"]
        # value-space check: sketch value within the [q-2%, q+2%] exact band
        kmask = keys == key[0]
        v = np.sort(vals[kmask])
        n = len(v)
        lo = v[max(0, math.ceil((key[1] - 0.02) * n) - 1)]
        hi = v[min(n - 1, math.ceil((key[1] + 0.02) * n) - 1)]
        assert lo <= sr["quantile_value"] <= hi


def test_bigram_score_hand_computed(ray_session):
    from go_light_rag_ray.stages.lm import bigram_score

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a b a b", "a b", "solo"],
    }))
    # corpus bigrams: doc0: (a,b)(b,a)(a,b); doc1: (a,b) → counts ab=3, ba=1
    out = _by_id(bigram_score(docs).take_all())
    assert set(out) == {0, 1}          # "solo" has no bigram → no row
    assert out[0]["n_bigrams"] == 3 and out[0]["sum_freq"] == 3 + 1 + 3
    assert out[0]["oov_count"] == 0
    assert abs(out[0]["mean_bigram_freq"] - 2.333333) < 1e-12
    assert out[1]["n_bigrams"] == 1 and out[1]["sum_freq"] == 3


def test_misra_gries_guarantees():
    """Every term with share > n/(m+1) survives; estimates undercount by
    at most n/(m+1); merge ≈ single-stream build."""
    from go_light_rag_ray.stages.heavyhitters import MisraGries

    rng = np.random.default_rng(5)
    # zipf-ish stream over 2000 terms, 3 planted heavy hitters
    words = [f"w{int(i)}" for i in rng.zipf(1.5, size=30_000) if i < 2000]
    words += ["HH1"] * 5000 + ["HH2"] * 3000 + ["HH3"] * 2000
    rng.shuffle(words)
    true = {}
    for w in words:
        true[w] = true.get(w, 0) + 1

    m = 64
    s = MisraGries(m)
    for i in range(0, len(words), 1000):
        chunk = words[i:i + 1000]
        s.update(chunk)
    bound = s.n / (m + 1)
    for hh in ("HH1", "HH2", "HH3"):
        assert hh in s.counters
        assert 0 <= true[hh] - s.counters[hh] <= bound

    # merged sketches obey the same guarantee
    parts = []
    for i in range(0, len(words), 5000):
        p = MisraGries(m)
        p.update(words[i:i + 5000])
        parts.append(p)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == len(words)
    for hh in ("HH1", "HH2", "HH3"):
        assert hh in merged.counters
        assert 0 <= true[hh] - merged.counters[hh] <= merged.n / (m + 1)


def test_corpus_top_words_and_mg_agree_on_heavies(ray_session):
    from go_light_rag_ray.stages.heavyhitters import (
        corpus_top_words,
        mg_top_words,
    )

    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(50)),
        "text": ["the quick the lazy the fox word%d" % i for i in range(50)],
    })).repartition(6)
    exact = corpus_top_words(docs, k=3).take_all()
    assert [(r["rank"], r["word"], r["count"]) for r in exact] == \
        [(1, "the", 150), (2, "fox", 50), (3, "lazy", 50)]
    sketch = mg_top_words(docs, k=2, m=8)
    assert sketch[0][0] == "the"


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_cms_point_estimates(ray_session):
    """On a tiny vocabulary (no cell collisions at width 2^14) the CMS
    estimate equals the exact count; in general it never undercounts."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.heavyhitters import cms_cells, cms_estimate

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["a b a c", "b a", "c c c a"],
    })).repartition(3)
    cells = cms_cells(docs).materialize()
    exact = {"a": 4, "b": 2, "c": 4}
    for w, n in exact.items():
        assert cms_estimate(cells, w) == n
    assert cms_estimate(cells, "zzz") == 0


def test_cms_merges_across_corpora(ray_session):
    """Cells from two corpus halves merged by per-cell sum equal the
    whole-corpus sketch (the mergeable-summary property)."""
    import pyarrow as pa
    import ray.data
    import ray.data.aggregate as agg

    from go_light_rag_ray.stages.heavyhitters import cms_cells

    texts = [f"w{i % 17} w{i % 5} common" for i in range(40)]

    def mk(rows, off=0):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(off, off + len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }))

    whole = {(r["row_j"], r["pos"]): r["cnt"]
             for r in cms_cells(mk(texts)).take_all()}
    merged_ds = (
        cms_cells(mk(texts[:15])).union(cms_cells(mk(texts[15:], off=15)))
        .groupby(["row_j", "pos"])
        .aggregate(agg.Sum("cnt", alias_name="cnt"))
    )
    merged = {(r["row_j"], r["pos"]): r["cnt"] for r in merged_ds.take_all()}
    assert merged == whole
