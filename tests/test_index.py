"""End-to-end index build + query: rank identity, postings parity, resume.

Mirrors the reference's end-to-end-only test strategy (SURVEY.md §5) but
strengthens it with an independent brute-force oracle and byte-level resume
checks (FIXTURES.md F4/F5).
"""

import json
import os
import shutil

import numpy as np
import pytest

from deces_dataprep_ray.functions.ids import doc_id_from_url
from deces_dataprep_ray.index.build import build_index, compact_head_segments
from deces_dataprep_ray.index.query import (
    analyze_query,
    idf,
    search_exact,
    search_wand,
)
from deces_dataprep_ray.index.reader import IndexReader

QUERIES = [
    "term1",
    "term2 term3",
    "term1 term2 term3 term4",
    "café crème",
    "sèvres 42",
    "term50 term300",
    "term1000 term2000 term1",
    "münchen köln term7",
    "zzz_absent",
    "TERM1 TERM2",  # case-folds to same as term1 term2
    "term4999",     # tail term
]


def brute_topk(inv, dls, query, k, k1=1.2, b=0.75):
    n = len(dls)
    avgdl = sum(dls.values()) / n
    scores: dict[int, float] = {}
    for t in analyze_query(query):
        pl = inv.get(t)
        if not pl:
            continue
        w_idf = idf(n, len(pl))
        for d, tf in pl.items():
            w = np.float64(tf) / (
                np.float64(tf) + k1 * (1 - b + b * (np.float64(dls[d]) / avgdl))
            )
            scores[d] = scores.get(d, 0.0) + w_idf * float(w)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_stats_match_bruteforce(built_index, brute_force):
    idx, man = built_index
    inv, dls = brute_force
    r = IndexReader(idx)
    assert r.n_docs == len(dls)
    assert abs(r.avgdl - sum(dls.values()) / len(dls)) < 1e-9
    assert r.vocabulary_size() == len(inv)


def test_postings_parity(built_index, brute_force):
    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)
    some_terms = sorted(inv)[:50] + sorted(inv, key=lambda t: -len(inv[t]))[:20]
    for t in some_terms:
        docs, tfs, dls_arr = r.postings(t)
        assert dict(zip(docs.tolist(), tfs.tolist())) == inv[t], t
        assert (np.diff(docs.astype(np.int64)) > 0).all(), f"{t}: not sorted"
    assert r.df("zzz_not_a_term") == 0


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_exact_vs_wand(built_index, query):
    idx, _ = built_index
    r = IndexReader(idx)
    assert search_exact(r, query, 10) == search_wand(r, query, 10), query


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_vs_bruteforce(built_index, brute_force, query):
    idx, _ = built_index
    inv, dls = brute_force
    r = IndexReader(idx)
    got = search_exact(r, query, 10)
    want = brute_topk(inv, dls, query, 10)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (_, s1), (_, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9


def test_wand_deep_k(built_index, brute_force):
    idx, _ = built_index
    inv, dls = brute_force
    r = IndexReader(idx)
    q = "term1 term2 term5"
    assert search_exact(r, q, 200) == search_wand(r, q, 200)


def test_head_compaction_preserves_results(built_index, tmp_path):
    idx, man = built_index
    # copy the index (relocatable by design) and compact the copy
    idx2 = str(tmp_path / "copy")
    shutil.copytree(idx, idx2)
    r1 = IndexReader(idx2)
    before = [search_wand(r1, q, 10) for q in QUERIES]
    n = compact_head_segments(idx2)
    assert n == len(r1.head_terms)
    r2 = IndexReader(idx2)
    assert r2.head_compacted
    after = [search_wand(r2, q, 10) for q in QUERIES]
    assert before == after


def test_head_terms_are_segmented(built_index):
    idx, man = built_index
    r = IndexReader(idx)
    heads = sorted(r.head_terms, key=lambda t: -r.df(t))
    assert heads, "corpus should produce head terms"
    segs = r.term_segments(heads[0])
    assert len(segs) > 1, "hottest term should be salted into multiple segments"
    # segments are doc-range contiguous and ordered
    prev_last = -1
    for s in segs:
        assert int(s["blk_last"][-1]) > prev_last
        prev_last = int(s["blk_last"][-1])


def test_resume_after_partial_failure(corpus_dir, tmp_path, brute_force):
    """FIXTURES.md F5: kill mid-build → rerun resumes → byte-identical index."""
    paths = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
    kw = dict(num_buckets=8, salt_shards=2, head_min_df=60, batch_size=256)
    full = str(tmp_path / "full")
    build_index(paths, full, **kw)

    # simulate a crash: complete build, then destroy 3 buckets + manifest entry
    broken = str(tmp_path / "broken")
    shutil.copytree(full, broken)
    man_path = os.path.join(broken, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    del man["phases"]["postings"]  # driver died before marking the phase
    with open(man_path, "w") as f:
        json.dump(man, f)
    for b in (0, 3, 5):
        shutil.rmtree(os.path.join(broken, "postings", f"bucket={b:05d}"))

    build_index(paths, broken, **kw)  # resume

    # every bucket byte-identical to the uninterrupted build
    for b in range(8):
        p1 = os.path.join(full, "postings", f"bucket={b:05d}", "part.parquet")
        p2 = os.path.join(broken, "postings", f"bucket={b:05d}", "part.parquet")
        assert os.path.exists(p1) == os.path.exists(p2)
        if os.path.exists(p1):
            with open(p1, "rb") as f1, open(p2, "rb") as f2:
                assert f1.read() == f2.read(), f"bucket {b} differs after resume"


def test_config_change_invalidates(corpus_dir, tmp_path):
    paths = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )[:1]
    idx = str(tmp_path / "idx")
    m1 = build_index(paths, idx, num_buckets=4, salt_shards=2, head_min_df=60)
    m2 = build_index(paths, idx, num_buckets=4, salt_shards=2, head_min_df=50)
    assert m1.hash != m2.hash


def test_resolve_urls(built_index):
    idx, _ = built_index
    r = IndexReader(idx)
    docs, _, _ = r.postings("term1")
    want = [int(d) for d in docs[:5]]
    urls = r.resolve_urls(want)
    assert set(urls) == set(want)
    for did, url in urls.items():
        assert doc_id_from_url(url) == did


def test_golden_topk(built_index):
    """Golden top-k file (FIXTURES.md F4) — regenerate with
    `python tests/golden/gen_topk.py` when the corpus or scoring changes."""
    idx, _ = built_index
    golden = os.path.join(os.path.dirname(__file__), "golden", "topk.jsonl")
    r = IndexReader(idx)
    with open(golden) as f:
        for line in f:
            case = json.loads(line)
            got = search_wand(r, case["query"], case["k"])
            assert [d for d, _ in got] == [x["doc_id"] for x in case["results"]]
            for (_, s), x in zip(got, case["results"]):
                assert abs(s - x["score"]) < 1e-12, case["query"]


def test_search_and_conjunctive(built_index, brute_force):
    from deces_dataprep_ray.index.query import search_and

    idx, _ = built_index
    inv, dls = brute_force
    r = IndexReader(idx)
    q = "term1 term2 term4"
    res = search_and(r, q, 50)
    terms = analyze_query(q)
    inter = set(inv[terms[0]])
    for t in terms[1:]:
        inter &= set(inv[t])
    assert {d for d, _ in res} <= inter
    # scores equal the OR scorer's scores for the same docs
    or_scores = dict(search_exact(r, q, 10_000))
    for d, s in res:
        assert s == or_scores[d]
    # all-terms docs that the OR scorer ranks are present up to k
    assert len(res) == min(50, len(inter))
    assert search_and(r, "term1 zzz_absent", 10) == []


def test_search_prefix_expansion(built_index, brute_force):
    from deces_dataprep_ray.index.query import expand_prefix, search_prefix

    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)
    terms = expand_prefix(r, "term12")
    want = sorted(t for t in inv if t.startswith("term12"))
    assert terms == want
    res = search_prefix(r, "term12*", 10)
    manual = search_exact(r, " ".join(want), 10)
    assert res == manual
    assert search_prefix(r, "zzzz*", 10) == []
    # cap respected
    assert len(expand_prefix(r, "term", max_expansions=7)) == 7


def test_search_prefix_hyphenated_stem(built_index, brute_force):
    # 'term2-ca*' must expand the POSITIONALLY last subtoken ('ca'), keeping
    # 'term2' exact — not analyze_query's lexicographically last
    from deces_dataprep_ray.index.query import expand_prefix, search_prefix

    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)
    expanded = expand_prefix(r, "ca")
    assert expanded == sorted(t for t in inv if t.startswith("ca"))
    res = search_prefix(r, "term2-ca*", 10)
    manual = search_exact(r, " ".join(sorted(set(expanded) | {"term2"})), 10)
    assert res == manual


def test_topk_massive_tie_break(built_index):
    # thousands of docs tied at the k-th score: (score desc, doc_id asc)
    # must hold exactly in the vectorized selection
    from deces_dataprep_ray.index.query import _topk_from_scores

    ids = np.arange(50_000, dtype=np.int64)[::-1].copy()
    scores = np.ones(50_000)
    got = _topk_from_scores(ids, scores, 5)
    assert got == [(i, 1.0) for i in range(5)]


def test_fuzzy_expansion_and_search(built_index, brute_force):
    from deces_dataprep_ray.index.query import expand_fuzzy, search_fuzzy

    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)

    def ref_lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    for q, d in [("term12", 1), ("trm1", 1), ("cafe", 2), ("zzzzzzzz", 1)]:
        want = sorted(t for t in inv if ref_lev(q, t) <= d)
        got = expand_fuzzy(r, q, max_dist=d, max_expansions=10**6)
        assert got == want, (q, d)

    # fuzzy search == OR search over the expanded set
    expanded = expand_fuzzy(r, "term12", 1, 10**6)
    assert search_fuzzy(r, "term12", 10, max_dist=1, max_expansions=10**6) \
        == search_exact(r, " ".join(expanded), 10)
    # expansion cap keeps the exact match
    capped = expand_fuzzy(r, "term12", 1, max_expansions=2)
    assert "term12" in capped and len(capped) <= 2




def test_multireader_equals_full_rebuild(corpus_dir, built_index, tmp_path):
    # two generation indexes over disjoint halves answer IDENTICALLY to the
    # single full index (combined N/avgdl/df; weights recomputed at query)
    import glob

    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.multi import MultiReader

    paths = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    assert len(paths) >= 2
    mid = len(paths) // 2
    gens = []
    for gname, sub in (("g0", paths[:mid]), ("g1", paths[mid:])):
        idx = str(tmp_path / gname)
        build_index(sub, idx, num_buckets=8, salt_shards=4, head_min_df=60,
                    batch_size=256)
        gens.append(idx)
    full_idx, _ = built_index
    full = IndexReader(full_idx)
    multi = MultiReader(gens)
    assert multi.n_docs == full.n_docs
    assert abs(multi.avgdl - full.avgdl) < 1e-9
    from deces_dataprep_ray.index.query import search_and, search_pruned

    for q in QUERIES[:6]:
        assert search_exact(multi, q, 10) == search_exact(full, q, 10), q
        assert search_and(multi, q, 10) == search_and(full, q, 10), q
        # pruned over generations: per-generation block maxima rescaled to
        # the union avgdl stay valid bounds — rank/score identity holds
        assert search_pruned(multi, q, 10) == search_exact(full, q, 10), q
    # the rescale is real: generations' avgdl differ from the union's, so
    # at least one generation's bounds needed scaling
    assert any(abs(r.avgdl - multi.avgdl) > 1e-12 for r in multi.readers)
    # url resolution spans generations
    res = search_exact(multi, "term1 term2", 5)
    urls = multi.resolve_urls([d for d, _ in res])
    assert len(urls) == len(res)


def test_multireader_rejects_mismatched_config(built_index, corpus_dir, tmp_path):
    import glob

    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.multi import MultiReader

    idx2 = str(tmp_path / "k1diff")
    build_index(sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))[:1],
                idx2, num_buckets=4, salt_shards=2, head_min_df=60,
                batch_size=256, k1=2.0)
    with pytest.raises(ValueError):
        MultiReader([built_index[0], idx2])


def test_min_should_match(built_index, brute_force):
    from deces_dataprep_ray.index.query import (
        search_and,
        search_min_should_match,
    )

    idx, _ = built_index
    inv, dls = brute_force
    r = IndexReader(idx)
    q = "term1 term2 term3"
    # msm=1 == OR; msm=#terms == AND; msm in between checked vs brute force
    assert search_min_should_match(r, q, 10, 1) == search_exact(r, q, 10)
    assert search_min_should_match(r, q, 10, 3) == search_and(r, q, 10)
    got = search_min_should_match(r, q, 10, 2)
    full = dict(brute_topk(inv, dls, q, 10**9))
    terms = ["term1", "term2", "term3"]
    want = sorted(((d, s) for d, s in full.items()
                   if sum(1 for t in terms if d in inv.get(t, {})) >= 2),
                  key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want]
