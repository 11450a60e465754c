"""Benchmark harness. Prints ONE JSON line.

Headline: full inverted-index build (analyze → SPIMI → salted shuffle →
encoded bucket write) over a deterministic synthetic pages corpus sized by
the sf of ``$GRAFT_SF_DIR`` (sf0.1 → 100k docs), plus BM25 query latency
(block-max WAND p50) and a sweep of the driver queries over the sf tables.

  GRAFT_SF_DIR   input table dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS ray.init num_cpus (default 32)

``python bench.py --scaling`` runs the headline build twice in fresh
processes (num_cpus=8 then 32) on the same input and reports both
throughputs and the scaling efficiency (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The postings exchange is object-store-SPILL-bound at Ray's default store
# sizing (~43% of memory): at 1.2M docs / 32 cpus the phase measured 54.8 s
# spilling vs 25.1 s at 60% — sizing the store to the shuffle's working set
# is the single biggest build knob on this box (a real cluster sizes
# per-node stores the same way). setdefault: callers can still override.
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.6")

BENCH_QUERIES = [
    "term1", "term2 term3", "term1 term2 term3 term4", "café crème",
    "sèvres 42", "term50 term300", "term1000 term2000 term1",
    "münchen köln term7", "term12 term13 term14", "hôtel élève garçon",
    "term4 term17 term29", "term0 2024", "term99 term100", "term7 term800",
    "term5 term6 term7 term8 term9", "42 2024", "term31 term42 term53",
    "term2 term2000", "term300 term301 term302", "term1 term4999",
]


def corpus_sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_corpus(n_docs: int) -> list[str]:
    from deces_dataprep_ray.corpus import write_pages_corpus

    d = f"/tmp/dcray_bench/pages_{n_docs}"
    return write_pages_corpus(d, n_docs, shard_rows=25_000)


def warm_workers(num_cpus: int) -> None:
    """Spawn + warm the worker pool (process start, package imports) before
    timing — measures the build, not cluster cold start. A real cluster at
    either size would be warm before a 10^12-doc job."""
    import ray.data as rd

    def touch(batch):
        import deces_dataprep_ray.index.build  # noqa: F401 — force imports

        return batch

    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        touch, batch_format="pyarrow").count()


def _partial_flusher(result: dict):
    """Incremental flush of the in-progress result to $BENCH_PARTIAL_PATH.

    BENCH_r03 was voided by a single transient raylet crash (rc=1, no JSON).
    The parent process (see `main`) retries a crashed child once and, if the
    retry also dies, salvages the last flushed partial — so a late crash
    keeps every number measured before it."""
    path = os.environ.get("BENCH_PARTIAL_PATH")

    def flush() -> None:
        if not path:
            return
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f)
        os.replace(tmp, path)
        # test hook: simulate the r03 mid-run raylet death at the first
        # flush point ("always" crashes every attempt → salvage path;
        # a file path crashes only the first attempt → retry path)
        inj = os.environ.get("BENCH_INJECT_CRASH")
        if inj == "always":
            os._exit(1)
        if inj and inj != "always":
            if not os.path.exists(inj):
                with open(inj, "w") as f:
                    f.write("crashed once")
                os._exit(1)

    return flush


def run_bench(sf_dir: str, num_cpus: int, headline_only: bool) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deces_dataprep_ray.corpus import ExtractText
    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.query import (
        search_exact,
        search_pruned,
    )
    from deces_dataprep_ray.index.reader import IndexReader

    sf = corpus_sf(sf_dir)
    n_docs = int(os.environ.get("RAY_GRAFT_DOCS", "0")) or max(1000, int(sf * 4_000_000))
    paths = ensure_corpus(n_docs)

    # warm the page cache so the timed run measures compute + shuffle
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
    warm_workers(num_cpus)

    queries: dict[str, float] = {}
    index_dir = f"/tmp/dcray_bench/index_{n_docs}_{num_cpus}"

    # in-progress result, flushed to $BENCH_PARTIAL_PATH after each section
    # (queries is mutated in place, so every flush carries all numbers so far)
    result = {
        "metric": "index_build_sec", "value": None, "unit": "sec",
        "queries": queries, "sf": sf, "num_cpus": num_cpus, "docs": n_docs,
        "partial": True,
    }
    flush = _partial_flusher(result)

    # best-of-2: this sandbox shows ±20% run-to-run variance from noisy
    # neighbors; the minimum is the faithful measure of the engine.
    # (--scaling sets BENCH_BUILD_RUNS=1: the median-of-N protocol handles
    # noise across samples instead of inside each sample)
    n_runs = int(os.environ.get("BENCH_BUILD_RUNS", "2"))
    build_times = []
    for _ in range(n_runs):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        build_index(
            paths, index_dir,
            # FIXED across parallelism levels: the scaling protocol compares
            # the SAME job at 8 and 32 CPUs, so the physical plan (bucket
            # count = reduce partitions) must not depend on the CPU count.
            # 128 (not 64): at 32 cpus 64 reduce partitions under-parallelize
            # the exchange — measured 4x interleaved at 400k docs, postings
            # 10.1 s @64 vs 6.1-6.3 s @128 (neutral at 8 cpus). Overridable
            # via BENCH_NUM_BUCKETS for A/B.
            num_buckets=int(os.environ.get("BENCH_NUM_BUCKETS", "128")),
            salt_shards=8,
            batch_size=4096,
        )
        build_times.append(time.time() - t0)
    build_sec = min(build_times)
    queries["index_build"] = round(build_sec, 3)
    queries["index_build_runs"] = [round(t, 3) for t in build_times]
    result["value"] = round(build_sec, 3)
    result["docs_per_sec"] = round(n_docs / build_sec, 1)
    flush()

    reader = IndexReader(index_dir)

    # query latency: one warm pass, then timed; `pruned` is the scale path.
    # Doc-at-a-time WAND is a rank-identity TEST ORACLE only (never picked
    # by algorithm="auto"); benching its Python loop every round measured
    # dead weight (663 ms p50 in BENCH_r04) — retired per the r04 verdict,
    # rank-identity coverage unchanged in tests/test_index.py.
    for q in BENCH_QUERIES[:5]:
        search_pruned(reader, q, 10)
    lat_p, lat_exact = [], []
    for q in BENCH_QUERIES:
        t = time.time()
        search_pruned(reader, q, 10)
        lat_p.append(time.time() - t)
    for q in BENCH_QUERIES:
        t = time.time()
        search_exact(reader, q, 10)
        lat_exact.append(time.time() - t)
    queries["query_pruned_p50"] = round(statistics.median(lat_p), 4)
    queries["query_exact_p50"] = round(statistics.median(lat_exact), 4)
    flush()

    if not headline_only:
        import ray.data as rd

        from deces_dataprep_ray.index.service import QueryService

        svc = QueryService(index_dir, num_workers=8)
        qs = BENCH_QUERIES * 10
        svc.search_batch(BENCH_QUERIES, 10)  # warm the pool
        t = time.time()
        svc.search_batch(qs, 10)
        dt = time.time() - t
        queries["service_qps_8workers"] = round(len(qs) / dt, 1)
        # heterogeneous msearch batch (mixed match/wildcard/fuzzy/MLT)
        # wildcard stems are truncated to ≤6 chars (short first tokens
        # like "42" stay short); max_expansions=64 is what actually bounds
        # each slot's OR width — a bare unbounded "term*" would expand to
        # the ENTIRE ~8k-term synthetic vocabulary per request and measure
        # pathological expansion scoring, not service dispatch
        mreqs = [
            {"type": "match", "query": q} if i % 4 == 0 else
            {"type": "wildcard", "query": q.split()[0][:6] + "*",
             "max_expansions": 64}  # ES-typical bounded rewrite
            if i % 4 == 1 else
            {"type": "fuzzy", "query": q.split()[0]} if i % 4 == 2 else
            {"type": "more_like_this", "query": q, "max_query_terms": 3}
            for i, q in enumerate(BENCH_QUERIES * 5)
        ]
        svc.msearch(mreqs[:len(BENCH_QUERIES)])  # warm every distinct req
        t = time.time()
        svc.msearch(mreqs)
        queries["msearch_qps_8workers"] = round(
            len(mreqs) / (time.time() - t), 1)
        svc.shutdown()
        flush()

        # dictionary-expansion + docvalue-serving latencies (warm)
        from deces_dataprep_ray.index.query import (
            more_like_this,
            search_wildcard,
        )

        # typical selectivity (tens of expansions); "term1*" would be a
        # ~1.1k-term OR on this vocabulary — that cost is expansion
        # scoring, not dictionary lookup, and scales with max_expansions.
        # Warm pass loads the dictionary AND the patterns' postings so the
        # timed pass measures the serving path, not cold bucket IO.
        pats = ("term12*", "term?3", "term55*")
        for pat in pats:
            search_wildcard(reader, pat, 10)
        t = time.time()
        for pat in pats:
            search_wildcard(reader, pat, 10)
        queries["query_wildcard_p50"] = round((time.time() - t) / 3, 4)
        mlt_like = " ".join(BENCH_QUERIES[:3])
        more_like_this(reader, mlt_like, 10, max_query_terms=5)  # warm
        t = time.time()
        more_like_this(reader, mlt_like, 10, max_query_terms=5)
        queries["query_mlt"] = round(time.time() - t, 4)
        flush()

        t = time.time()
        out_dir = f"/tmp/dcray_bench/extract_{n_docs}"
        shutil.rmtree(out_dir, ignore_errors=True)
        (
            rd.read_parquet(paths)
            .map_batches(ExtractText, batch_size=1024,
                         batch_format="pyarrow", concurrency=(1, num_cpus))
            .write_parquet(out_dir)
        )
        queries["extract_html"] = round(time.time() - t, 3)
        flush()

        from deces_dataprep_ray.pipelines import driver_queries as dq

        for name, fn in [
            ("groupby_agg", dq.q_groupby_agg),
            ("broadcast_join", dq.q_broadcast_join),
            ("term_df", dq.q_term_df),
            ("exact_dedup", dq.q_exact_dedup),
            ("ann_cosine", dq.q_ann_cosine),
            ("minhash_pairs", dq.q_minhash_pairs),
            # vectorized text stages (round-4 rework): full-corpus walls
            ("langid", dq.q_langid),
            ("fingerprint", dq.q_fingerprint),
            ("hash_split", dq.q_hash_split),
            # round-5 ops: boilerplate spans + media decode features
            ("dup_spans", dq.q_dup_spans),
            ("media_features", dq.q_media_features),
        ]:
            t = time.time()
            fn(sf_dir)
            queries[name] = round(time.time() - t, 3)
            flush()

        # fielded index: build over the documents table (text+source fields,
        # lang keyword, n_chars docvalue), then filtered-query p50 warm
        t = time.time()
        fidx = dq._fielded_index_for(sf_dir)
        queries["fielded_index_build"] = round(time.time() - t, 3)
        from deces_dataprep_ray.index.fielded import (
            KeywordFilter,
            RangeFilter,
            search_fields,
        )

        fr = IndexReader(fidx)
        search_fields(fr, [("text", "data spark window")], 10)  # warm
        lat_f = []
        for q in ["data spark window", "slow query", "table scan merge",
                  "row group filter", "hash join stream"]:
            t = time.time()
            search_fields(fr, [("text", q)], 10,
                          filters=[KeywordFilter("lang", "en"),
                                   RangeFilter("n_chars", 100, 400)])
            lat_f.append(time.time() - t)
        queries["query_fielded_filtered_p50"] = round(
            statistics.median(lat_f), 4)
        flush()

        # docvalue serving over the fielded index: distributed sort top-k,
        # collapse, terms+metrics aggregation (one wall each, warm index)
        from deces_dataprep_ray.index.aggs import terms_metric_agg
        from deces_dataprep_ray.index.fielded import (
            collapse_topk,
            sort_by_field,
        )

        t = time.time()
        sort_by_field(fr, "n_chars", k=10, descending=True)
        queries["sort_by_field"] = round(time.time() - t, 3)
        t = time.time()
        collapse_topk(fr, None, "lang_dv", k=10,
                      matches=[("text", "data spark window")])
        queries["collapse"] = round(time.time() - t, 3)
        t = time.time()
        terms_metric_agg(fr, "lang_dv", "n_chars")
        queries["terms_metric_agg"] = round(time.time() - t, 3)
        flush()

        # persisted ANN index: one query reads only probe-bucket row groups
        t = time.time()
        dq.q_ann_lsh(sf_dir)
        queries["ann_lsh_persisted"] = round(time.time() - t, 3)
        flush()

        # positional index + phrase p50: head-term phrases are the worst
        # case (candidate set = intersection of the hottest terms); the
        # cross-doc vectorized slop DP is what's being measured. The build
        # resumes from /tmp across runs — only the first run pays it.
        from deces_dataprep_ray.index.query import search_phrase

        pos_idx = f"/tmp/dcray_bench/posindex_{n_docs}"
        t = time.time()
        build_index(paths, pos_idx, num_buckets=64, salt_shards=8,
                    batch_size=4096, store_positions=True)
        queries["positional_index_build"] = round(time.time() - t, 3)
        pr = IndexReader(pos_idx)
        phrases = ["term1 term2", "term2 term1", "term1 term2 term3",
                   "term10 term11", "term3 term1"]
        search_phrase(pr, phrases[0], 10)  # warm decode caches
        lat_ph, lat_sl = [], []
        for q in phrases:
            t = time.time()
            search_phrase(pr, q, 10)
            lat_ph.append(time.time() - t)
        for q in phrases:
            t = time.time()
            search_phrase(pr, q, 10, slop=2)
            lat_sl.append(time.time() - t)
        queries["query_phrase_p50"] = round(statistics.median(lat_ph), 4)
        queries["query_phrase_slop2_p50"] = round(statistics.median(lat_sl), 4)
        flush()

        # generation compaction: split the corpus into two halves, build
        # each as its own generation (resume-cached across runs), then time
        # the shuffle-free force-merge into one index
        from deces_dataprep_ray.index.compact import compact_generations

        half = len(paths) // 2 or 1
        gdirs = []
        for gi, gp in enumerate((paths[:half], paths[half:] or paths[:1])):
            gdir = f"/tmp/dcray_bench/gen{gi}_{n_docs}"
            build_index(gp, gdir, num_buckets=64, salt_shards=8,
                        batch_size=4096)
            gdirs.append(gdir)
        cmp_dir = f"/tmp/dcray_bench/compacted_{n_docs}"
        shutil.rmtree(cmp_dir, ignore_errors=True)
        t = time.time()
        compact_generations(gdirs, cmp_dir, concurrency=min(64, num_cpus))
        queries["compact_generations"] = round(time.time() - t, 3)
        flush()

    man = reader.manifest
    n_postings = man.phase("postings").get("n_postings", 0)
    phase_seconds = {k: v.get("seconds") for k, v in man.doc["phases"].items()}
    result = {
        "metric": "index_build_sec",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / build_sec, 1),
        "n_postings": int(n_postings),
        "phase_seconds": phase_seconds,
    }
    ray.shutdown()
    return result


def _burn(_) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return x


def _hw_capacity_ratio(lo: int = 8, hi: int = 32) -> float:
    """Measure this machine's ACTUAL aggregate compute ratio between lo and
    hi concurrent processes (SMT / throttling make 32 logical CPUs deliver
    well under 4x the throughput of 8). The engine cannot scale past the
    hardware; report efficiency against both ideal and measured capacity."""
    import multiprocessing as mp

    rates = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            rates[n] = sum(p.map(_burn, range(n)))
    return rates[hi] / rates[lo]


def run_scaling(sf_dir: str) -> dict:
    """Two-parallelism-level scaling protocol, median-of-N per leg.

    N samples per leg (SCALING_SAMPLES, default 5) run INTERLEAVED
    (8,32,8,32,…) so a host-contention window hits both legs symmetrically
    instead of biasing one. Each sample is a single fresh-process build
    (BENCH_BUILD_RUNS=1 — the cross-sample median absorbs noise). The
    clean-run criterion is mechanical, not narrative: a sample is flagged
    `contended` when its build wall deviates > 25% from its leg's median;
    a secondary median over clean samples only is reported alongside."""
    env_base = dict(os.environ, GRAFT_SF_DIR=sf_dir, BENCH_HEADLINE_ONLY="1",
                    BENCH_BUILD_RUNS="1")
    n_samples = int(os.environ.get("SCALING_SAMPLES", "5"))
    # SCALING_LEVELS="2,8" measures the same 4x factor BELOW the SMT /
    # memory-controller saturation knee — separates engine scaling from
    # single-box hardware saturation (default 8,32 matches the rule's N,4N)
    lo_n, hi_n = (int(x) for x in
                  os.environ.get("SCALING_LEVELS", "8,32").split(","))

    def one(ncpu: int) -> dict:
        # --child: run the bench directly (no parent wrapper — a partial
        # salvage would corrupt the measurement); retry a crashed sample
        # once in a fresh process (transient raylet death, see BENCH_r03)
        env = dict(env_base, RAY_GRAFT_CPUS=str(ncpu))
        last_err = ""
        for _ in range(2):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env, capture_output=True, text=True,
            )
            if proc.returncode == 0:
                return json.loads(proc.stdout.strip().splitlines()[-1])
            last_err = proc.stderr[-4000:]
        raise RuntimeError(
            f"scaling sample ({ncpu} cpus) failed twice:\n" + last_err)

    # hardware capacity is calibrated BEFORE EVERY interleaved sample pair:
    # host contention arrives in multi-minute waves here, so a single
    # up-front ratio misrepresents later samples; the median ratio is used
    # for the vs-hw figure and the per-sample ratios are reported raw
    hw_ratios: list[float] = []
    samples: dict[int, list[dict]] = {lo_n: [], hi_n: []}
    for _ in range(n_samples):
        hw_ratios.append(_hw_capacity_ratio(lo_n, hi_n))
        for ncpu in (lo_n, hi_n):  # interleave legs
            samples[ncpu].append(one(ncpu))
    hw_ratio = statistics.median(hw_ratios)

    def leg(ncpu: int) -> dict:
        walls = [s["value"] for s in samples[ncpu]]
        med = statistics.median(walls)
        flags = [abs(w - med) / med > 0.25 for w in walls]
        clean = [w for w, f in zip(walls, flags) if not f] or walls
        # host contention is ONE-SIDED (it only ever adds wall time), so
        # when >half the samples hit a contention window the median is
        # contaminated and the deviation-from-median flag inverts. The
        # leg's floor — median of samples within 25% of the leg minimum —
        # estimates the uncontended wall robustly in any mix.
        floor = min(walls)
        floor_clean = [w for w in walls if w <= floor * 1.25]
        phases: dict[str, float] = {}
        for ph in (samples[ncpu][0].get("phase_seconds") or {}):
            vals = [s["phase_seconds"].get(ph) for s in samples[ncpu]
                    if s.get("phase_seconds", {}).get(ph) is not None]
            if vals:
                phases[ph] = round(statistics.median(vals), 3)
        return {
            "walls": [round(w, 3) for w in walls],
            "median_wall": round(med, 3),
            "median_docs_per_sec": round(samples[ncpu][0]["docs"] / med, 1),
            "contended_flags": flags,
            "clean_median_wall": round(statistics.median(clean), 3),
            "floor_wall": round(statistics.median(floor_clean), 3),
            "floor_n_samples": len(floor_clean),
            "phase_seconds_median": phases,
        }

    lo, hi = leg(lo_n), leg(hi_n)
    docs = samples[lo_n][0]["docs"]
    speedup = lo["median_wall"] / hi["median_wall"]
    eff = speedup / (hi_n / lo_n)
    clean_speedup = lo["clean_median_wall"] / hi["clean_median_wall"]
    floor_speedup = lo["floor_wall"] / hi["floor_wall"]
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "efficiency_vs_hw_capacity": round(speedup / hw_ratio, 3),
        "clean_efficiency": round(clean_speedup / (hi_n / lo_n), 3),
        "clean_efficiency_vs_hw_capacity": round(clean_speedup / hw_ratio, 3),
        "floor_efficiency": round(floor_speedup / (hi_n / lo_n), 3),
        "floor_efficiency_vs_hw_capacity": round(floor_speedup / hw_ratio, 3),
        f"hw_capacity_ratio_{lo_n}_to_{hi_n}": round(hw_ratio, 3),
        "levels": [lo_n, hi_n],
        "hw_capacity_ratios_per_sample": [round(r, 3) for r in hw_ratios],
        "samples_per_leg": n_samples,
        f"leg_{lo_n}cpu": lo,
        f"leg_{hi_n}cpu": hi,
        "docs": docs,
        "sf": samples[lo_n][0]["sf"],
        f"docs_per_sec_{lo_n}cpu": lo["median_docs_per_sec"],
        f"docs_per_sec_{hi_n}cpu": hi["median_docs_per_sec"],
        "queries": {f"build_{lo_n}cpu": lo["median_wall"],
                    f"build_{hi_n}cpu": hi["median_wall"]},
    }


def _run_supervised(argv: list[str]) -> dict:
    """Run the bench in a CHILD process; retry once on nonzero exit; if both
    attempts die, salvage the last flushed partial result. A transient
    raylet crash (BENCH_r03: rc=1, parsed null) can no longer void a round's
    perf evidence — the parent always prints one JSON line and exits 0."""
    os.makedirs("/tmp/dcray_bench", exist_ok=True)
    partial_path = f"/tmp/dcray_bench/partial_{os.getpid()}.json"
    env = dict(os.environ, BENCH_PARTIAL_PATH=partial_path)
    attempts = 0
    last_err = ""
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", *argv],
            env=env, capture_output=True, text=True,
        )
        attempts += 1
        if proc.returncode == 0:
            sys.stderr.write(proc.stderr)
            for line in reversed(proc.stdout.strip().splitlines()):
                if line.startswith("{"):
                    out = json.loads(line)
                    out["bench_attempts"] = attempts
                    return out
        last_err = proc.stderr[-2000:]
        sys.stderr.write(
            f"bench child attempt {attempts} failed "
            f"(rc={proc.returncode}); "
            + ("retrying in a fresh process\n" if attempts == 1 else
               "salvaging partial results\n"))
    if os.path.exists(partial_path):
        with open(partial_path) as f:
            out = json.load(f)
        out["partial"] = True
        out["bench_attempts"] = attempts
        out["note"] = "all attempts crashed; results up to the last flush"
        out["last_stderr_tail"] = last_err[-800:]
        return out
    raise RuntimeError(f"bench crashed before the first flush:\n{last_err}")


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
        return
    headline_only = os.environ.get("BENCH_HEADLINE_ONLY") == "1" or \
        "--headline-only" in sys.argv
    if "--child" in sys.argv:
        result = run_bench(sf_dir, num_cpus, headline_only)
        result.pop("partial", None)
        print(json.dumps(result))
        return
    print(json.dumps(_run_supervised(
        [a for a in sys.argv[1:] if a != "--child"])))


if __name__ == "__main__":
    main()
