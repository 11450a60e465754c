"""Distributed BM25 serving: an actor pool of index readers.

The reference serves queries from Elasticsearch nodes restored from a
snapshot (`Makefile:206-220` + the sibling deces-backend **[public]**). Here
serving is a pool of Ray actors, each holding an :class:`IndexReader` over
the same relocatable index directory (bucket reads are lazy, so each actor
warms only the buckets its queries touch). Queries are round-robined;
throughput scales with the pool size since readers share nothing.

This is the ``@ray.remote`` escape hatch the Dataset API genuinely cannot
express (a long-lived shared read-only index served at low latency) —
SURVEY.md §2.5 "stateful stages".
"""

from __future__ import annotations

import itertools

import ray

from .query import search as _search


@ray.remote
class _QueryWorker:
    def __init__(self, index_dir: str):
        from .alias import resolve_alias
        from .reader import IndexReader

        # the pool can be pointed at an ALIAS (blue/green deploys): each
        # worker remembers the unresolved path and re-resolves on refresh()
        self._path = index_dir
        self._resolved = resolve_alias(index_dir)
        self.reader = IndexReader(self._resolved)

    def refresh(self) -> bool:
        """Re-resolve the alias; reopen the reader iff the target moved
        (ES searcher-refresh semantics — no actor restart). Returns whether
        the worker switched generations."""
        from .alias import resolve_alias
        from .reader import IndexReader

        target = resolve_alias(self._path)
        if target == self._resolved:
            return False
        self._resolved = target
        self.reader = IndexReader(target)
        return True

    def resolved_dir(self) -> str:
        return self._resolved

    def explain(self, query: str, doc_id: int):
        from .query import explain as _explain

        return _explain(self.reader, query, doc_id)

    def search(self, query: str, k: int = 10, algorithm: str = "auto"):
        return _search(self.reader, query, k, algorithm=algorithm)

    def search_many(self, queries: list[str], k: int = 10,
                    algorithm: str = "auto"):
        return [_search(self.reader, q, k, algorithm=algorithm)
                for q in queries]

    def search_fields(self, matches, k: int = 10, filters=None,
                      algorithm: str = "exact"):
        from .fielded import search_fields as _sf

        return _sf(self.reader, matches, k, filters=filters,
                   algorithm=algorithm)

    def msearch_many(self, requests: list[dict]):
        """Heterogeneous request batch (ES ``_msearch`` body lines): each
        request is {"type": <match|and|phrase|prefix|fuzzy|wildcard|regexp|
        fielded|dis_max|more_like_this>, ...kwargs}. A failing request
        yields {"error": ...} in its slot instead of failing the batch —
        ES per-line error semantics."""
        from . import fielded as F
        from . import query as Q

        dispatch = {
            "match": lambda r: _search(self.reader, r["query"],
                                       r.get("k", 10),
                                       algorithm=r.get("algorithm", "auto")),
            "and": lambda r: Q.search_and(self.reader, r["query"],
                                          r.get("k", 10)),
            "phrase": lambda r: Q.search_phrase(
                self.reader, r["query"], r.get("k", 10),
                slop=r.get("slop", 0), field=r.get("field"),
                filters=r.get("filters")),
            "prefix": lambda r: Q.search_prefix(
                self.reader, r["query"], r.get("k", 10),
                field=r.get("field")),
            "fuzzy": lambda r: Q.search_fuzzy(
                self.reader, r["query"], r.get("k", 10),
                max_dist=r.get("max_dist", 1),
                max_expansions=r.get("max_expansions", 64),
                field=r.get("field")),
            "wildcard": lambda r: Q.search_wildcard(
                self.reader, r["query"], r.get("k", 10),
                max_expansions=r.get("max_expansions", 1024),
                field=r.get("field")),
            "regexp": lambda r: Q.search_regexp(
                self.reader, r["query"], r.get("k", 10),
                max_expansions=r.get("max_expansions", 1024),
                field=r.get("field")),
            "more_like_this": lambda r: Q.more_like_this(
                self.reader, r["query"], r.get("k", 10),
                max_query_terms=r.get("max_query_terms", 25)),
            "phrase_prefix": lambda r: Q.search_phrase_prefix(
                self.reader, r["query"], r.get("k", 10),
                max_expansions=r.get("max_expansions", 50),
                slop=r.get("slop", 0), field=r.get("field"),
                filters=r.get("filters")),
            "suggest": lambda r: Q.suggest_terms(
                self.reader, r["query"], r.get("n", 5),
                max_dist=r.get("max_dist", 2), field=r.get("field")),
            "rescore": lambda r: Q.rescore(
                self.reader, r["query"], r["rescore_phrase"],
                r.get("k", 10), window_size=r.get("window_size", 100),
                query_weight=r.get("query_weight", 1.0),
                rescore_weight=r.get("rescore_weight", 1.0),
                slop=r.get("slop", 0)),
            "explain": lambda r: Q.explain(
                self.reader, r["query"], r["doc_id"]),
            "fielded": lambda r: F.search_fields(
                self.reader, r["matches"], r.get("k", 10),
                filters=r.get("filters"),
                algorithm=r.get("algorithm", "exact")),
            "dis_max": lambda r: F.search_dis_max(
                self.reader, r["matches"], r.get("k", 10),
                tie_breaker=r.get("tie_breaker", 0.0),
                filters=r.get("filters")),
            "cross_fields": lambda r: F.search_cross_fields(
                self.reader, r["fields"], r["query"], r.get("k", 10),
                filters=r.get("filters")),
            "span_near": lambda r: Q.search_span_near(
                self.reader, r["terms"], r.get("k", 10),
                slop=r.get("slop", 0), in_order=r.get("in_order", False),
                field=r.get("field"), filters=r.get("filters")),
            "boosting": lambda r: Q.search_boosting(
                self.reader, r["positive"], r["negative"], r.get("k", 10),
                negative_boost=r.get("negative_boost", 0.5)),
            "bool_prefix": lambda r: Q.search_bool_prefix(
                self.reader, r["query"], r.get("k", 10),
                max_expansions=r.get("max_expansions", 50)),
            "query_string": lambda r: Q.search_query_string(
                self.reader, r["query"], r.get("k", 10)),
            "constant_score": lambda r: F.constant_score(
                self.reader, r["filters"], r.get("k", 10),
                boost=r.get("boost", 1.0)),
        }
        out = []
        for req in requests:
            fn = dispatch.get(req.get("type", "match"))
            if fn is None:
                out.append({"error": f"unknown type {req.get('type')!r}"})
                continue
            try:
                out.append(fn(req))
            except Exception as exc:  # per-request isolation, ES-style
                out.append({"error": f"{type(exc).__name__}: {exc}"})
        return out

    def search_phrase(self, phrase: str, k: int = 10, slop: int = 0,
                      field=None, filters=None):
        from .query import search_phrase as _sp

        return _sp(self.reader, phrase, k, slop=slop, field=field,
                   filters=filters)

    def search_fuzzy(self, query: str, k: int = 10, max_dist: int = 1):
        from .query import search_fuzzy as _sf

        return _sf(self.reader, query, k, max_dist=max_dist)

    def search_after(self, query: str, k: int = 10, after=None):
        from .query import search_after as _sa

        return _sa(self.reader, query, k, after=after)

    def highlight(self, query: str, k: int = 10, window: int = 3,
                  text_col: str = "text"):
        """Top-k + snippets from the index's own docvalues store — requires
        the index to have been built with the text as a docvalue field."""
        from .highlight import highlight_snippets
        from .query import search as _s

        res = _s(self.reader, query, k)
        snips = highlight_snippets(self.reader.docstore,
                                   [d for d, _ in res], query,
                                   window=window, text_col=text_col)
        return [(d, s, snips.get(d, "")) for d, s in res]


class QueryService:
    """Round-robin pool of query actors over one index directory — or an
    ALIAS (``alias.set_alias`` pointer): ``refresh()`` makes every worker
    re-resolve and reopen on a moved target without restarting the pool."""

    def __init__(self, index_dir: str, num_workers: int = 4,
                 num_cpus_per_worker: float = 1.0):
        self.workers = [
            _QueryWorker.options(num_cpus=num_cpus_per_worker).remote(index_dir)
            for _ in range(num_workers)
        ]
        self._rr = itertools.cycle(self.workers)

    def search(self, query: str, k: int = 10, algorithm: str = "auto"):
        """Single query (blocking)."""
        return ray.get(next(self._rr).search.remote(query, k, algorithm))

    def explain(self, query: str, doc_id: int):
        """ES ``_explain``: the per-(field, term) BM25 decomposition of one
        doc's score for ``query``, served from the pool."""
        return ray.get(next(self._rr).explain.remote(query, doc_id))

    def refresh(self) -> int:
        """Make every worker re-resolve its alias (no-op on a plain index
        dir); returns how many workers switched index generations."""
        return sum(ray.get([w.refresh.remote() for w in self.workers]))

    def resolved_dirs(self) -> list[str]:
        """Each worker's currently served concrete index directory."""
        return ray.get([w.resolved_dir.remote() for w in self.workers])

    def search_fields(self, matches, k: int = 10, filters=None,
                      algorithm: str = "exact"):
        """Fielded bool query (blocking); filters are Keyword/Range/Geo
        filter objects (they pickle to the worker)."""
        return ray.get(next(self._rr).search_fields.remote(
            matches, k, filters, algorithm))

    def search_phrase(self, phrase: str, k: int = 10, slop: int = 0,
                      field=None, filters=None):
        """Phrase query (positional indexes only); ``field`` scopes it to
        one field of a fielded positional index, ``filters`` add ES bool
        filter context (objects pickle to the worker)."""
        return ray.get(next(self._rr).search_phrase.remote(
            phrase, k, slop, field, filters))

    def search_fuzzy(self, query: str, k: int = 10, max_dist: int = 1):
        return ray.get(next(self._rr).search_fuzzy.remote(query, k, max_dist))

    def search_after(self, query: str, k: int = 10, after=None):
        """Deep pagination: (rounded score, url) cursor, ES [_score, _id]
        order (see ``query.search_after``)."""
        return ray.get(next(self._rr).search_after.remote(query, k, after))

    def highlight(self, query: str, k: int = 10, window: int = 3,
                  text_col: str = "text"):
        """Top-k hits as (doc_id, score, snippet); the index must store the
        source text as a docvalue field named ``text_col``."""
        return ray.get(next(self._rr).highlight.remote(
            query, k, window, text_col))

    def _fanout(self, items: list, call) -> list:
        """Round-robin shard ``items`` across the pool, one actor call per
        shard via ``call(worker, shard)``; results in input order."""
        n = len(self.workers)
        shards: list[list] = [[] for _ in range(n)]
        owners: list[tuple[int, int]] = []
        for i, item in enumerate(items):
            w = i % n
            owners.append((w, len(shards[w])))
            shards[w].append(item)
        futures = [call(self.workers[w], shard)
                   for w, shard in enumerate(shards) if shard]
        live = [w for w, shard in enumerate(shards) if shard]
        results = dict(zip(live, ray.get(futures)))
        return [results[w][j] for w, j in owners]

    def search_batch(self, queries: list[str], k: int = 10,
                     algorithm: str = "auto") -> list:
        """Fan a query batch across the pool; results in input order."""
        return self._fanout(
            queries, lambda w, s: w.search_many.remote(s, k, algorithm))

    def msearch(self, requests: list[dict]) -> list:
        """ES ``_msearch``: a heterogeneous request batch (mixed query
        types — see ``_QueryWorker.msearch_many``) fanned across the pool,
        results in input order; a failing request returns an
        ``{"error": ...}`` slot, never fails the batch."""
        return self._fanout(
            requests, lambda w, s: w.msearch_many.remote(s))

    def shutdown(self) -> None:
        for w in self.workers:
            ray.kill(w)
        self.workers = []
