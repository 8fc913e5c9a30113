"""Text analysis: token stats, quality, language ID, fingerprints."""

import hashlib

import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_stats,
)


def _docs():
    return ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick-brown fox",
            "a a a a",
            "",
            "small slow big big",
        ],
    }))


def test_token_stats():
    rows = {r["doc_id"]: r for r in token_stats(_docs()).take_all()}
    assert rows[0]["n_tokens"] == 3            # whitespace tokens
    assert rows[0]["n_bpe_tokens"] == 5        # the, quick, -, brown, fox
    assert rows[0]["n_chars"] == len("the quick-brown fox")
    assert rows[2]["n_tokens"] == rows[2]["n_bpe_tokens"] == 0


def test_quality_scores():
    rows = {r["doc_id"]: r for r in quality_scores(_docs()).take_all()}
    assert rows[1]["distinct_ratio"] == 0.25
    assert rows[1]["stopword_ratio"] == 1.0    # "a" is a stopword
    assert rows[1]["quality"] == 0.0
    assert rows[0]["distinct_ratio"] == 1.0
    assert rows[0]["stopword_ratio"] == 1 / 3   # "the" of 3 tokens
    assert rows[0]["quality"] == 1.0 * (1 - 1 / 3)
    assert rows[2]["quality"] == 0.0


def test_language_id():
    rows = {r["doc_id"]: r for r in language_id(_docs()).take_all()}
    assert rows[0]["lang_pred"] == "en"        # "the", "a" markers
    assert rows[3]["lang_pred"] == "de"        # small/slow/big markers
    assert rows[3]["lang_score"] == 1.0
    assert rows[2]["lang_pred"] == "de"        # empty → tie → first code
    assert rows[2]["lang_score"] == 0.0


def test_fingerprints():
    rows = {r["doc_id"]: r["fingerprint"]
            for r in fingerprints(_docs(), shingle_k=2).take_all()}
    # doc1 windows: "a a" ×3 → fp = md5("a a")
    assert rows[1] == hashlib.md5(b"a a").hexdigest()
    assert rows[2] == hashlib.md5(b"").hexdigest()
    w = ["the quick-brown", "quick-brown fox"]
    assert rows[0] == min(hashlib.md5(x.encode()).hexdigest() for x in w)


def test_tfidf_top_terms():
    from go_light_rag_ray.stages.textstats import tfidf_top_terms

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["rare common common", "common common", "other common"],
    }))
    rows = tfidf_top_terms(docs, k=2).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r["rank"])
    # "rare": tf=1 df=1 → 1.0 beats "common": tf=2 df=3 → 0.667
    assert (d0[0]["word"], d0[0]["score"]) == ("rare", 1.0)
    assert d0[1]["word"] == "common" and d0[1]["tf"] == 2 and d0[1]["df"] == 3
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert d2[0]["word"] == "other"        # tf1/df1 beats common tf1/df3
    assert all(len(v) <= 2 for v in by_doc.values())


def test_unigram_lm_scoring(ray_session):
    """Train → broadcast → score: corpus frequencies, OOV handling, and
    top_vocab capping."""
    import numpy as np

    from go_light_rag_ray.stages.lm import unigram_score, word_freq_model

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["the cat sat", "the the dog", ""],
    }))
    model = word_freq_model(docs)
    counts = dict(zip(model.column("word").to_pylist(),
                      model.column("c").to_pylist()))
    assert counts == {"the": 3, "cat": 1, "sat": 1, "dog": 1}

    rows = {r["doc_id"]: r for r in unigram_score(docs, model).take_all()}
    # doc 1: the(3)+cat(1)+sat(1)=5 over 3 tokens
    assert rows[1]["n_tokens"] == 3 and rows[1]["sum_freq"] == 5
    assert rows[1]["mean_token_freq"] == round(5 / 3, 6)
    # doc 2: 3+3+1=7
    assert rows[2]["sum_freq"] == 7
    # zero-token docs emit NO row (the SQL oracle's join+group-by drops
    # them; the scorer matches that row set exactly)
    assert 3 not in rows
    assert all(r["oov_count"] == 0 for r in rows.values())

    # capped vocab: only "the" survives top_vocab=1; other tokens are OOV
    capped = word_freq_model(docs, top_vocab=1)
    assert capped.column("word").to_pylist() == ["the"]
    rows_c = {r["doc_id"]: r
              for r in unigram_score(docs, capped).take_all()}
    assert rows_c[1]["oov_count"] == 2 and rows_c[1]["sum_freq"] == 3


def test_importance_weights_hand_computed(ray_session):
    """DSIR-style weights: hand-checked integer sums + ratio against a
    forced target slice (target_fraction=1 → target model == raw model →
    weight 1.0 for every doc), then a real split via the md5 bucket."""
    import hashlib

    import numpy as np

    from go_light_rag_ray.stages.lm import importance_weights

    docs = ray.data.from_arrow(pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["x x y", "x z", "y z z", ""],
    }))
    # degenerate: everything is target → sum_target == sum_raw everywhere
    rows = {r["doc_id"]: r
            for r in importance_weights(docs, target_fraction=1.0).take_all()}
    assert "d" not in rows          # zero-token docs emit no row
    assert all(r["sum_target"] == r["sum_raw"] and r["weight"] == 1.0
               for r in rows.values())
    # raw model: x=3, y=2, z=3 → doc a raw sum = 3+3+2 = 8
    assert rows["a"]["n_tokens"] == 3 and rows["a"]["sum_raw"] == 8

    # real split: recompute the expected target slice with the same md5
    # bucket and check one doc's sums by hand
    frac = 0.5
    thr = int(frac * (1 << 32))
    tgt = {i for i in ("a", "b", "c")
           if int(hashlib.md5(f"dsir{i}".encode()).hexdigest()[:8], 16) < thr}
    assert tgt, "fixture must select a non-empty target slice"
    tcounts: dict[str, int] = {}
    texts = {"a": "x x y", "b": "x z", "c": "y z z"}
    for i in tgt:
        for w in texts[i].split():
            tcounts[w] = tcounts.get(w, 0) + 1
    rows = {r["doc_id"]: r
            for r in importance_weights(docs, target_fraction=frac).take_all()}
    for i in ("a", "b", "c"):
        sum_t = sum(tcounts.get(w, 0) for w in texts[i].split())
        assert rows[i]["sum_target"] == sum_t
        expect = np.floor(sum_t / rows[i]["sum_raw"] * 1e6 + 0.5) / 1e6
        assert rows[i]["weight"] == expect


def test_scrub_text_denylist_and_pii(ray_session):
    from go_light_rag_ray.stages.scrub import scrub_text

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["contact bob@example.com about the merge plan",
                 "ssn 123456789 and id 42 stay partially",
                 "clean text with nothing to hide"],
    }))
    rows = {r["doc_id"]: r
            for r in scrub_text(docs, denylist=["merge"]).take_all()}
    assert rows[1]["text"] == "contact <email> about the <masked> plan"
    assert rows[1]["n_masked"] == 2
    assert rows[2]["text"] == "ssn <number> and id 42 stay partially"
    assert rows[2]["n_masked"] == 1       # 42 is under the 6-digit floor
    assert rows[3]["text"] == "clean text with nothing to hide"
    assert rows[3]["n_masked"] == 0


def test_tfidf_strategies_equivalent(ray_session):
    """grouped (default) and segment executions produce identical rows."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.textstats import tfidf_top_terms

    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(40)),
        "text": [f"alpha beta w{i % 7} w{i % 3} gamma w{i}" for i in range(40)],
    })).repartition(5)
    key = lambda r: (r["doc_id"], r["rank"])  # noqa: E731
    a = sorted(tfidf_top_terms(docs, k=3).take_all(), key=key)
    b = sorted(tfidf_top_terms(docs, k=3, strategy="segment").take_all(),
               key=key)
    assert len(a) > 0 and a == b


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------

def test_inverted_index_strategies_agree():
    import ray.data as rd

    from go_light_rag_ray.stages.textstats import inverted_index

    docs = rd.from_arrow(pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["red blue red", "blue green", "red   green blue", "solo"],
    }))
    want = [
        ("blue", 3, "a|b|c"),
        ("green", 2, "b|c"),
        ("red", 2, "a|c"),
    ]
    for strat in ("grouped", "segment"):
        rows = inverted_index(docs, min_df=2, strategy=strat).take_all()
        got = sorted((r["word"], r["df"], r["postings"]) for r in rows)
        assert got == want, strat


def test_inverted_index_df_bounds():
    import ray.data as rd

    from go_light_rag_ray.stages.textstats import inverted_index

    docs = rd.from_arrow(pa.table({
        "doc_id": ["a", "b", "c"],
        "text": ["x y", "x y", "x"],
    }))
    rows = inverted_index(docs, min_df=1, max_df=2).take_all()
    got = sorted((r["word"], r["df"]) for r in rows)
    assert got == [("y", 2)]  # x has df 3 > max_df


def test_top_vocab_trim_is_distributed_and_exact(ray_session):
    """The top_vocab trim runs inside the dataset (per-block partial top-k
    + one bounded merge); the result must equal the old driver-side sort
    across many blocks with boundary ties."""
    from go_light_rag_ray.stages.lm import bigram_freq_model, word_freq_model

    # 26 words with counts 1..26 plus ties at the cut
    texts = []
    for i, w in enumerate("abcdefghijklmnopqrstuvwxyz"):
        texts.extend([w * 3] * (i + 1))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
    })).repartition(8)                       # force many blocks
    m = word_freq_model(docs, top_vocab=5)
    assert m.column("word").to_pylist() == sorted(
        [w * 3 for w in "vwxyz"])            # counts 22..26
    assert sorted(m.column("c").to_pylist()) == [22, 23, 24, 25, 26]

    # tie at the boundary breaks lexicographically (word ascending)
    docs2 = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["aa", "bb", "cc", "dd"],
    })).repartition(4)
    m2 = word_freq_model(docs2, top_vocab=2)
    assert m2.column("word").to_pylist() == ["aa", "bb"]

    bm = bigram_freq_model(ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["x y x y", "x y", "p q"],
    })).repartition(3), top_vocab=1)
    assert bm.column("bigram").to_pylist() == ["x\x1fy"]
    assert bm.column("c").to_pylist() == [3]


def test_corpus_summary_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.textstats import corpus_summary

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b c", "a  a", ""],
    })).repartition(2)
    row = corpus_summary(docs).take_all()[0]
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 5          # 3 + 2 + 0
    assert row["max_doc_tokens"] == 3
    assert row["total_chars"] == 5 + 4 + 0
    assert row["distinct_words"] == 3        # a b c
    assert row["mean_doc_tokens"] == 1.666667
