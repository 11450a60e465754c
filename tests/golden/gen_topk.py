"""Regenerate tests/golden/topk.jsonl (FIXTURES.md F4).

Run from repo root: ``python tests/golden/gen_topk.py``.
Builds the same 800-doc corpus/index the test fixtures use and records the
exhaustive-oracle top-k per query. Scores are produced by search_exact (the
frozen accumulation order); WAND must match them exactly.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

QUERIES = [
    ("term1", 10),
    ("term2 term3", 10),
    ("term1 term2 term3 term4", 10),
    ("café crème", 10),
    ("sèvres 42", 10),
    ("term50 term300", 10),
    ("term1000 term2000 term1", 10),
    ("münchen köln term7", 10),
    ("term4 term17 term29", 25),
    ("term0 2024", 10),
    ("term12 term13 term14", 50),
    ("hôtel élève garçon", 10),
]


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deces_dataprep_ray.corpus import write_pages_corpus
    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.query import search_exact
    from deces_dataprep_ray.index.reader import IndexReader

    with tempfile.TemporaryDirectory() as tmp:
        cdir = os.path.join(tmp, "corpus")
        write_pages_corpus(cdir, 800, shard_rows=200)
        paths = sorted(
            os.path.join(cdir, f) for f in os.listdir(cdir) if f.endswith(".parquet")
        )
        idx = os.path.join(tmp, "index")
        build_index(paths, idx, num_buckets=8, salt_shards=4, head_min_df=60,
                    batch_size=256)
        reader = IndexReader(idx)
        out_path = os.path.join(os.path.dirname(__file__), "topk.jsonl")
        with open(out_path, "w") as f:
            for q, k in QUERIES:
                res = search_exact(reader, q, k)
                f.write(json.dumps({
                    "query": q,
                    "k": k,
                    "results": [{"doc_id": d, "score": s} for d, s in res],
                }, ensure_ascii=False) + "\n")
        print(f"wrote {out_path} ({len(QUERIES)} queries)")
    ray.shutdown()


if __name__ == "__main__":
    main()
