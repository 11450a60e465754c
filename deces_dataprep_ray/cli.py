"""Command-line entry — the ``ray job submit`` surface.

    ray job submit -- python -m deces_dataprep_ray.cli build \
        --input '/data/pages/*.parquet' --index /data/index
    ray job submit -- python -m deces_dataprep_ray.cli query \
        --index /data/index --q "café crème" -k 10
    python -m deces_dataprep_ray.cli compact --index /data/index

Replaces the reference's Makefile orchestration (`Makefile:161-175`
recipe-run / `:225-254` backup): the build is resumable via the manifest, so
re-submitting a failed job continues where it stopped.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="deces_dataprep_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an inverted index")
    b.add_argument("--input", required=True, help="parquet path or glob")
    b.add_argument("--index", required=True)
    b.add_argument("--url-col", default="url")
    b.add_argument("--text-col", default="text")
    b.add_argument("--num-buckets", type=int, default=64)
    b.add_argument("--salt-shards", type=int, default=8)
    b.add_argument("--batch-size", type=int, default=4096)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--sample", type=int, default=0, metavar="N",
                   help="dry-run on the first N rows only (the reference's "
                        "test_chunk_size head-sample)")
    b.add_argument("--fields", default=None,
                   help='JSON {"field": "column"} — analyzed fields')
    b.add_argument("--keyword-fields", default=None,
                   help='JSON {"field": "column"} — raw keyword sub-fields')
    b.add_argument("--docvalue-fields", default=None,
                   help='JSON {"name": "column"} — typed docvalues columns')

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--algorithm", default="auto",
                   choices=["auto", "pruned", "wand", "exact"])
    q.add_argument("--urls", action="store_true", help="resolve doc urls")

    c = sub.add_parser("compact", help="compact head-term segments")
    c.add_argument("--index", required=True)

    p = sub.add_parser("push", help="backup the index with a checksummed "
                                    "inventory")
    p.add_argument("--index", required=True)
    p.add_argument("--dest", required=True)

    pl = sub.add_parser("pull", help="restore + verify a pushed backup")
    pl.add_argument("--src", required=True)
    pl.add_argument("--index", required=True)

    v = sub.add_parser("verify", help="verify index integrity in place")
    v.add_argument("--index", required=True)

    args = ap.parse_args(argv)

    import ray

    started_ray = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        started_ray = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "build":
            from .index.build import build_index

            paths = sorted(glob.glob(args.input)) or [args.input]
            source = paths
            if args.sample:
                import ray.data as rd

                source = rd.read_parquet(paths).limit(args.sample)
            man = build_index(
                source, args.index, url_col=args.url_col,
                text_col=args.text_col, num_buckets=args.num_buckets,
                salt_shards=args.salt_shards, batch_size=args.batch_size,
                resume=not args.no_resume,
                fields=json.loads(args.fields) if args.fields else None,
                keyword_fields=(json.loads(args.keyword_fields)
                                if args.keyword_fields else None),
                docvalue_fields=(json.loads(args.docvalue_fields)
                                 if args.docvalue_fields else None),
            )
            print(json.dumps({
                "index": args.index,
                "config_hash": man.hash,
                "stats": man.phase("stats"),
                "phase_seconds": {k: v.get("seconds")
                                  for k, v in man.doc["phases"].items()},
            }))
        elif args.cmd == "query":
            from .index.query import search
            from .index.reader import IndexReader

            reader = IndexReader(args.index)
            res = search(reader, args.q, args.k, algorithm=args.algorithm)
            urls = reader.resolve_urls([d for d, _ in res]) if args.urls else {}
            print(json.dumps([
                {"doc_id": d, "score": s, **({"url": urls[d]} if urls else {})}
                for d, s in res
            ]))
        elif args.cmd == "compact":
            from .index.build import compact_head_segments

            n = compact_head_segments(args.index)
            print(json.dumps({"compacted_terms": n}))
        elif args.cmd == "push":
            from .index.backup import push_index

            doc = push_index(args.index, args.dest)
            print(json.dumps({"dest": args.dest, "n_files": doc["n_files"],
                              "bytes": doc["bytes"]}))
        elif args.cmd == "pull":
            from .index.backup import pull_index

            report = pull_index(args.src, args.index)
            print(json.dumps(report))
        elif args.cmd == "verify":
            from .index.backup import verify_index

            print(json.dumps(verify_index(args.index)))
    finally:
        if started_ray:  # never tear down a session the caller owns
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
