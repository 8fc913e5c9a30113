"""Driver-contract invariants over __ray_entry__ (no Ray session needed:
these only inspect the registries, never run pipelines).

The window-size check exists because of a real bug: two tail insertions
anchored on a registry line that a window rotation had MOVED landed
mid-window and silently pushed two queries past the driver's 50-query
cap (caught by code review in r5)."""

import ast
import os
import re

ENTRY = os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")

ROTATION_R5 = {
    "ann_topk_lsh", "ann_topk_ivf", "media_decode", "split_leakage_safe",
    "events_retention", "session_events_salted", "pricing_rollup",
}


def _registry_keys():
    src = open(ENTRY).read()
    tree = ast.parse(src)
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name in (
                "queries", "oracle_sql"):
            ret = node.body[-1]
            out[node.name] = [k.value for k in ret.value.keys]
    return src, out


def test_window_is_exactly_fifty_and_marker_agrees():
    src, regs = _registry_keys()
    keys = regs["queries"]
    assert len(keys) == len(set(keys)), "duplicate query names"
    # the comment marker and the dict order must agree on the cut
    lines = src.splitlines()
    marker = next(i for i, l in enumerate(lines)
                  if "end of driver window" in l)
    qstart = next(i for i, l in enumerate(lines)
                  if l.startswith("def queries"))
    before = sum(1 for l in lines[qstart:marker]
                 if re.match(r'\s+"[a-z_0-9]+": q_', l))
    assert before == 50, (
        f"{before} registry entries precede the end-of-window marker; "
        "the driver caps at the FIRST 50 — a new query belongs in the "
        "tail (after the marker), not anchored on a window entry")
    window = set(keys[:50])
    assert ROTATION_R5 <= window, "r5 rotation targets fell out of the window"
    assert "decontam_multi" in window and "kg_nodes" in window


def test_every_query_is_oracled_or_documented_rows_only():
    _, regs = _registry_keys()
    queries = set(regs["queries"])
    oracles = set(regs["oracle_sql"])
    assert oracles <= queries, f"orphan oracles: {oracles - queries}"
    rows_only = queries - oracles
    # the intrinsic non-SQL-expressible set (BASELINE.md round-5 notes) —
    # additions here need an explicit justification
    assert rows_only == {"entity_ann", "chunks_by_handler",
                         "chunk_embeddings"}, rows_only
