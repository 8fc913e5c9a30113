"""Content scrubbing: denylist masking + PII-style regex redaction.

The cleaning step a training corpus runs before anything else ships:
replace policy-denylisted terms and structured PII shapes with mask
tokens, keeping the document (unlike curation's drop).  Stateless,
fully vectorized Arrow kernels — fuses with the read:

* denylist terms — exact-substring masking via ``replace_substring``
  (longest term first, so overlapping terms resolve deterministically);
  DuckDB's ``replace()`` reproduces it exactly → the oracle path;
* PII shapes — regex redaction via ``replace_substring_regex`` with
  RE2-safe patterns (email-like, long digit runs) so the same patterns
  run identically under DuckDB's RE2 when needed.

Output keeps the original columns with the text column replaced and adds
``n_masked`` (total replacements, computed from length deltas of a
sentinel pass — no Python loop).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["scrub_text", "DEFAULT_PII_PATTERNS"]

# RE2-safe (no lookarounds/backrefs): identical semantics in Arrow and DuckDB
DEFAULT_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<email>"),
    (r"[0-9]{6,}", "<number>"),
]


def scrub_text(
    docs: ray.data.Dataset,
    denylist: list[str] | None = None,
    mask: str = "<masked>",
    pii_patterns: list[tuple[str, str]] | None = None,
    text_col: str = "text",
) -> ray.data.Dataset:
    """→ original columns with ``text_col`` scrubbed + ``n_masked``."""
    terms = sorted(denylist or [], key=len, reverse=True)
    patterns = DEFAULT_PII_PATTERNS if pii_patterns is None else pii_patterns

    def scrub(b: pa.Table) -> pa.Table:
        text = pc.cast(b.column(text_col), pa.string())
        n_masked = pa.nulls(len(b), pa.int64()).fill_null(0)
        masked = text
        for term in terms:
            # count per term on the SOURCE (well-defined even when terms
            # overlap; exact for space-separated corpora), then replace
            n_masked = pc.add(n_masked, pc.cast(
                pc.count_substring(text, term), pa.int64()))
            masked = pc.replace_substring(masked, term, mask)
        for pattern, repl in patterns:
            n_masked = pc.add(n_masked, pc.cast(
                pc.count_substring_regex(masked, pattern), pa.int64()))
            masked = pc.replace_substring_regex(masked, pattern, repl)
        idx = b.schema.get_field_index(text_col)
        out = b.set_column(idx, pa.field(text_col, pa.string()),
                           masked.combine_chunks()
                           if isinstance(masked, pa.ChunkedArray) else masked)
        return out.append_column(
            "n_masked",
            n_masked.combine_chunks()
            if isinstance(n_masked, pa.ChunkedArray) else n_masked)

    return docs.map_batches(scrub, batch_format="pyarrow")
