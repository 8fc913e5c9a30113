"""Real BPE tokenizer: merge-loop semantics vs reference bpetokenizer.go.

The classic hand-checkable vocabulary (l/o/w/e/r/n/s/t/d + merges toward
"low", "lower", "newest", "widest") exercises rank priority, left-to-right
fusion, special tokens, and both loaders — the behaviors of
bpetokenizer.go:101-190 — without any downloaded vocabulary.
"""

import json

import pytest

from go_light_rag_ray.bpe import BPETokenizer, gpt2_byte_map
from go_light_rag_ray.tokenizer import get_tokenizer

VOCAB = {c: i for i, c in enumerate("lowernstdi ")}
VOCAB.update({"lo": 20, "low": 21, "er": 22, "st": 23, "est": 24,
              "ne": 25, "new": 26, "newest": 27, "es": 28})
MERGES = [("l", "o"), ("lo", "w"), ("e", "r"), ("s", "t"), ("e", "st"),
          ("n", "e"), ("ne", "w"), ("new", "est"), ("e", "s")]
SPECIAL = {"<|endoftext|>": 999}


def tok(**kw):
    return BPETokenizer(VOCAB, MERGES, SPECIAL, **kw)


def test_merge_rank_priority():
    t = tok()
    # "lowest": l+o (rank 0) → lo, lo+w (rank 1) → low, s+t (rank 3) → st,
    # e+st (rank 4) → est.  ("e","s") rank 8 never fires because ("s","t")
    # outranks it — rank order, not left-to-right order, picks the merge.
    assert t._bpe("lowest") == ["low", "est"]
    assert t._bpe("newest") == ["newest"]
    assert t._bpe("lower") == ["low", "er"]


def test_leftmost_fusion_all_occurrences():
    t = tok()
    # one pass of the best pair fuses every non-overlapping occurrence
    assert t._bpe("lolo") == ["lo", "lo"]


def test_encode_ids_and_unknown():
    t = tok()
    assert t.encode_ids("lowest") == [21, 24]
    assert t.encode_ids("low lowest") == [21, 21, 24]  # whitespace dropped
    with pytest.raises(KeyError):
        t.encode_ids("xyz")  # not in vocab


def test_special_tokens_bypass_bpe():
    t = tok()
    assert t.encode_ids("low<|endoftext|>low") == [21, 999, 21]
    assert "<|endoftext|>" in t.encode("low<|endoftext|>")


def test_protocol_roundtrip_lossless():
    t = tok()
    s = "low lower newest  \n lowest"
    assert t.decode(t.encode(s)) == s
    assert t.count(s) == len(t.encode(s))


def test_from_files_loader(tmp_path):
    vocab_p = tmp_path / "vocab.json"
    merges_p = tmp_path / "merges.txt"
    vocab_p.write_text(json.dumps(VOCAB))
    merges_p.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    t = BPETokenizer.from_files(str(vocab_p), str(merges_p),
                                special_tokens=SPECIAL)
    assert t.encode_ids("lowest") == [21, 24]
    via_registry = get_tokenizer(f"bpe:{vocab_p}:{merges_p}")
    assert via_registry.encode_ids("newest") == [27]


def test_from_tokenizer_json_loader(tmp_path):
    # GPT-2 byte table: space maps to Ġ (U+0120)
    g = gpt2_byte_map()
    assert g[ord(" ")] == "Ġ"
    vocab = {g[ord(c)]: i for i, c in enumerate("abc")}
    vocab["Ġ"] = 3
    vocab[g[ord("a")] + g[ord("b")]] = 4
    spec = {
        "model": {"type": "BPE", "vocab": vocab, "merges": ["a b"]},
        "added_tokens": [{"content": "<eos>", "id": 9, "special": True}],
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(spec))
    t = BPETokenizer.from_tokenizer_json(str(p))
    assert t.encode_ids("abc") == [4, 2]
    assert t.encode_ids("<eos>") == [9]
    assert t.decode(t.encode("ab c")) == "ab c"


def test_chunker_integration(tmp_path, ray_session):
    """Handler(tokenizer='bpe:…') drives the sliding-window chunker with
    true BPE counts (reference default.go:53-96 semantics, T2 vocabulary)."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.pipelines.kg import Handler, chunk_documents

    vocab_p = tmp_path / "vocab.json"
    merges_p = tmp_path / "merges.txt"
    vocab_p.write_text(json.dumps(VOCAB))
    merges_p.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    handler = Handler(
        tokenizer=f"bpe:{vocab_p}:{merges_p}",
        chunk_max_tokens=4,
        chunk_overlap_tokens=1,
        content_mode="text",
    )
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": [1], "text": ["lowest newest lower low"]}))
    rows = chunk_documents(docs, handler).take_all()
    assert len(rows) >= 2
    # chunk windows decode to exact substrings: re-joining with the overlap
    # removed reproduces the document
    assert rows[0]["content"].startswith("lowest")
