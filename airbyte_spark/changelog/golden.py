"""Single-threaded reference applier — the golden oracle for tests.

Mirrors, in plain pandas/python, exactly the semantics the engine must
implement (SURVEY.md §7.1 contract):

1. LWW: the winner per doc_id is the event with max (lsn, ts_ms)
   (cursor then extracted_at tie-break — BigQuerySqlGenerator.java:456-477).
2. Tombstones: a winning delete removes the row; older events arriving later
   never resurrect it; a *newer* insert/update after a delete does
   (BaseSqlGeneratorIntegrationTest.java:863-919).
3. Duplicates (same LSN re-emissions) are absorbed (at-least-once in,
   exactly-once out).
4. Validation repair: n_tok := len(tokens) when they disagree (flagged);
   out-of-vocab token values are normalized mod vocab (flagged); rows are
   repaired and applied, never dropped (BigQuerySqlGenerator.java:544-566).

Intentionally naive (dict replay, event-at-a-time) — correctness only; the
engine must match this at any batch split, parallelism, or replay order.
"""

from __future__ import annotations

import pandas as pd


def _validate_payload(tokens, n_tok, vocab_size: int):
    """Return (tokens, n_tok, errors) after repair. Mirror of
    airbyte_spark.functions.validate (the vectorized version)."""
    errors: list[str] = []
    if tokens is None:
        return None, n_tok, errors
    toks = list(tokens)
    if any(t < 0 or t >= vocab_size for t in toks):
        toks = [t % vocab_size for t in toks]
        errors.append("oov_tokens")
    if n_tok is None or int(n_tok) != len(toks):
        errors.append("n_tok_mismatch")
        n_tok = len(toks)
    return toks, int(n_tok), errors


def apply_golden(
    seed_pdf: pd.DataFrame | None,
    changelog_pdf: pd.DataFrame,
    vocab_size: int = 50_257,
    patch_mode: bool = False,
) -> pd.DataFrame:
    """Replay seed + changelog; return the expected final table as pandas
    with columns (doc_id, tokens, n_tok, source, _ab_lsn), sorted by doc_id.

    ``seed_pdf`` rows are treated as inserts at their own (lsn, ts_ms)
    (the generator seeds at lsn=0, before any stream event).

    ``patch_mode``: U events carry only changed columns (tokens+n_tok as
    one group — present iff tokens is not None; `source` present iff
    non-None or listed in the row's `_ab_null_fields`). A patch to a
    DELETED doc is suppressed (a tombstone is positive knowledge; see
    operators/patch.py resolve_patches); a patch to an unknown doc upserts
    the touched columns with the rest NULL.
    """
    # state: doc_id -> dict(lsn, ts_ms, deleted, tokens, n_tok, source)
    state: dict[str, dict] = {}

    def apply_event(op, doc_id, lsn, ts_ms, tokens, n_tok, source, null_fields=()):
        cur = state.get(doc_id)
        key = (int(lsn), int(ts_ms))
        if cur is not None and key < (cur["lsn"], cur["ts_ms"]):
            return  # older than what we hold — LWW discards
        if op == "D":
            state[doc_id] = {
                "lsn": key[0], "ts_ms": key[1], "deleted": True,
                "tokens": None, "n_tok": None, "source": None,
            }
            return
        if patch_mode and op == "U":
            if cur is not None and cur["deleted"]:
                return  # tombstone suppresses partial images
            nf = list(null_fields) if null_fields is not None else []
            base = cur if cur is not None else {
                "tokens": None, "n_tok": None, "source": None,
            }
            new = {"lsn": key[0], "ts_ms": key[1], "deleted": False,
                   "tokens": base["tokens"], "n_tok": base["n_tok"],
                   "source": base["source"]}
            if tokens is not None:
                toks, nt, _err = _validate_payload(tokens, n_tok, vocab_size)
                new["tokens"], new["n_tok"] = toks, nt
            if "source" in nf:
                new["source"] = None
            elif source is not None:
                new["source"] = source
            state[doc_id] = new
            return
        toks, nt, _err = _validate_payload(tokens, n_tok, vocab_size)
        state[doc_id] = {
            "lsn": key[0], "ts_ms": key[1], "deleted": False,
            "tokens": toks, "n_tok": nt, "source": source,
        }

    if seed_pdf is not None:
        for row in seed_pdf.itertuples(index=False):
            apply_event("I", row.doc_id, row.lsn, row.ts_ms, row.tokens, row.n_tok, row.source)

    ordered = changelog_pdf.sort_values(["lsn", "ts_ms"], kind="mergesort")
    # itertuples positional-renames underscore-prefixed columns; alias it
    has_nf = "_ab_null_fields" in ordered.columns
    if has_nf:
        ordered = ordered.rename(columns={"_ab_null_fields": "nf"})
    for row in ordered.itertuples(index=False):
        apply_event(
            row.op, row.doc_id, row.lsn, row.ts_ms, row.tokens, row.n_tok, row.source,
            null_fields=row.nf if has_nf else (),
        )

    rows = [
        {
            "doc_id": d,
            "tokens": v["tokens"],
            "n_tok": v["n_tok"],
            "source": v["source"],
            "_ab_lsn": v["lsn"],
        }
        for d, v in state.items()
        if not v["deleted"]
    ]
    out = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source", "_ab_lsn"])
    return out.sort_values("doc_id").reset_index(drop=True)
