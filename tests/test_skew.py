"""Hot-key skew: the salted shuffle produces identical output under heavy
entity skew (F6 fixture at a meaningful size), at any salt level."""

import ray.data

from go_light_rag_ray.corpus import generate_documents
from go_light_rag_ray.pipelines.kg import Handler, kg_pipeline


def _key(r):
    return (r["kind"], r["entity_id"], r["src"], r["tgt"])


def test_skewed_corpus_salt_levels_agree(ray_session):
    # 60% of documents mention the same hot entity
    docs = generate_documents(300, skew_fraction=0.6)
    base = None
    for salts in (1, 8, 32):
        h = Handler(rules="pattern", content_mode="spans",
                    max_summaries_token_length=0, merge_cap=0,
                    salt_buckets=salts)
        rows = sorted(
            kg_pipeline(ray.data.from_arrow(docs), h).take_all(), key=_key
        )
        if base is None:
            base = rows
            hot = [r for r in rows if r["entity_id"] == "OMNIPRESENT CORP"]
            assert hot and hot[0]["mention_count"] > 100  # the skew is real
        else:
            assert rows == base


def test_skew_with_merge_cap_bounds_row_width(ray_session):
    docs = generate_documents(300, skew_fraction=0.6)
    h = Handler(rules="pattern", content_mode="spans",
                max_summaries_token_length=0, merge_cap=16, salt_buckets=8)
    rows = kg_pipeline(ray.data.from_arrow(docs), h).take_all()
    hot = next(r for r in rows if r["entity_id"] == "OMNIPRESENT CORP")
    assert hot["mention_count"] > 100          # counts stay exact
    assert len(hot["descriptions"]) <= 16      # width bounded by the cap
    assert len(hot["source_ids"]) <= 16
