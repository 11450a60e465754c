"""Snippet highlighting: ES ``highlight`` analogue over stored source.

The reference serves matchID hits through Elasticsearch, whose highlighter
re-analyzes a hit's stored ``_source`` field and returns a fragment around
the first query-term occurrence. Here the stored source is any doc_id-ordered
parquet (the corpus shards themselves qualify — ``DocStore(paths=...)`` does
row-group-statistics-pruned lookups, so fetching k hits' text reads only the
row groups containing them, never a corpus scan), and the fragmenter is the
same ``norm`` analyzer the index was built with: tokenize the source, find
the first position of any query term, emit the ±``window`` token fragment.

Determinism contract (what the DuckDB oracle replicates): the fragment is
``tokens[max(0, p-window) : p+window+1]`` joined with single spaces, where
``p`` is the minimum first-occurrence position over the analyzed query terms.
Only the top-k hit set enters this path — per-doc Python is fine here; the
scored candidate generation stays in the vectorized scorers.
"""

from __future__ import annotations

from ..functions.analysis import tokenize
from .query import analyze_query
from .docstore import DocStore


def snippet_for(text: str, qterms: set[str], window: int = 3) -> str:
    """The ±window token fragment around the first query-term hit; empty
    string when no term occurs (a scored hit always has one)."""
    toks = tokenize(text)
    for p, t in enumerate(toks):
        if t in qterms:
            return " ".join(toks[max(0, p - window):p + window + 1])
    return ""


def highlight_snippets(
    store: DocStore,
    doc_ids,
    query: str,
    window: int = 3,
    text_col: str = "text",
) -> dict[int, str]:
    """doc_id → snippet for the given hits, via one pruned stored-source
    lookup (row groups containing the ids only)."""
    qterms = set(analyze_query(query))
    tbl = store.lookup(doc_ids, [text_col])
    ids = tbl[store.id_col].to_numpy().tolist()
    texts = tbl[text_col].to_pylist()
    return {int(d): snippet_for(t or "", qterms, window)
            for d, t in zip(ids, texts)}
