"""Generation compaction: merge N index generations into ONE index.

The reference's append story is monthly delta files rolled up into the
annual rebuild (`/root/reference/Makefile:42` FILES_TO_PROCESS spans
annual + monthly files; the matchID backend re-runs the whole pipeline and
Elasticsearch force-merges segments). :mod:`multi` serves generation
unions at query time with rescaled block bounds; this module is the
rollup: a **force-merge without re-analysis** — the compacted index is
byte-for-byte a first-class index (exact block-max metadata baked against
the union's avgdl, one posting row per (term, seg), one docvalues store)
and serves every query path at full speed.

Design (Ray-Data-first, shuffle-free):

- Bucket/segment routing is STABLE across generations (term hash + the
  doc_id-range salt), so bucket b of the compacted index is a pure
  function of bucket b of every generation — one ``map_batches`` task per
  bucket decodes the generations' (term, seg) rows back to partials and
  hands them to the same :func:`~.build.build_bucket` reducer the build
  uses (merge-sort by doc_id, re-encode, atomic write + _OK resume). No
  all-to-all exchange: the postings phase reads N_gen bucket files per
  task and writes one.
- The ONLY rows that change buckets are terms that were non-head in one
  generation but head in another (the union head set is the generations'
  union): their seg-0 row re-splits by doc range. Each TARGET task pulls
  exactly those terms from their source buckets with a predicate-pushdown
  read (term-sorted files ⇒ row-group pruned) — the moved set is tiny by
  construction, so this costs a few extra small reads, not a shuffle.
- Stats merge exactly: manifests store integer Σdl (global and per-field),
  so the compacted avgdl equals a from-scratch build's bit-for-bit, and
  the exact scorer returns IDENTICAL scores to a full rebuild over the
  union corpus (doc_ids are url hashes — stable across builds).
- Docvalues: generations' stores are each doc_id-sorted; the union is a
  plain Ray Data ``sort("doc_id")`` re-sort (same cap on sort width as
  the build — docvalue rows are tiny).

Doc sets must be disjoint across generations (the MultiReader contract,
`multi.py`); a doc present twice keeps its first (term,seg)-sorted
occurrence via ``build_bucket``'s idempotence filter, but its docvalues
row would duplicate — compaction does not deduplicate the docstore.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..functions.codecs import decode_positions, decode_postings_blocks
from ..functions.ids import term_hash
from ..state.manifest import Manifest, bucket_dir, done_buckets
from .build import build_bucket, derive_termstats

_COMPAT_KEYS = (
    "analyzer", "k1", "b", "fields", "keyword_fields", "docvalue_fields",
    "store_positions", "num_buckets", "salt_shards",
)


def _route_row(term: str, salt_shards: int, num_buckets: int) -> np.ndarray:
    """Per-salt bucket routing for a head term — must match
    ``EmitPartials.head_mat`` and ``IndexReader.buckets_for``."""
    out = np.empty(salt_shards, dtype=np.int64)
    for s in range(salt_shards):
        h = hashlib.blake2b(
            f"{term}\x00{s}".encode("utf-8"), digest_size=8).digest()
        out[s] = int.from_bytes(h, "big") % num_buckets
    return out


def _decode_row(row: dict, with_pos: bool):
    """Encoded bucket row → (docs u64, tfs u8, dls u16, poss u32|None)."""
    docs, tfs, dls = decode_postings_blocks(row)
    tfs = tfs.astype(np.uint8)
    dls = dls.astype(np.uint16)
    poss = None
    if with_pos:
        lens = np.minimum(tfs, 255).astype(np.int64)
        poss = decode_positions(row["pos_bytes"], lens).astype(np.uint32)
    return docs, tfs, dls, poss


def _filter_excluded(docs, tfs, dls, poss, excl: np.ndarray):
    """Drop tombstoned docs from one decoded posting list (positions slices
    gathered along). Returns the filtered quadruple."""
    if not len(excl) or not len(docs):
        return docs, tfs, dls, poss
    keep = ~np.isin(docs, excl)
    if keep.all():
        return docs, tfs, dls, poss
    if poss is not None:
        plens = np.minimum(tfs, 255).astype(np.int64)
        pstarts = np.cumsum(plens) - plens
        k = np.flatnonzero(keep)
        kl = plens[k]
        tot = int(kl.sum())
        idx = (np.repeat(pstarts[k], kl)
               + np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(kl) - kl, kl))
        poss = poss[idx]
    return docs[keep], tfs[keep], dls[keep], poss


def _table_rows(tbl: pa.Table, with_pos: bool):
    """Iterate a bucket table as decode-ready dicts (mirrors the reader).
    Kept for the tiny moved-term pickups; the main compaction path decodes
    whole tables columnar via :func:`_decode_bucket_table`."""
    for i in range(tbl.num_rows):
        yield {
            "term": tbl["term"][i].as_py(),
            "seg": tbl["seg"][i].as_py(),
            "n": tbl["n"][i].as_py(),
            "doc_bytes": tbl["doc_bytes"][i].as_py(),
            "tf_bytes": tbl["tf_bytes"][i].as_py(),
            "dl_bytes": tbl["dl_bytes"][i].as_py(),
            **({"pos_bytes": tbl["pos_bytes"][i].as_py()} if with_pos else {}),
        }


def _decode_bucket_table(tbl: pa.Table, with_pos: bool, excl: np.ndarray):
    """Columnar decode of a WHOLE bucket table: one ``vb_decode`` per
    stream over the zero-copy concatenated buffer (varbyte is
    self-delimiting, so decoding the concatenation equals the
    concatenation of per-row decodes), segmented delta-decode via modular
    base subtraction (exact mod 2^64 even though the cross-row cumsum
    wraps), and a vectorized tombstone filter. Replaces the round-4
    per-row ``.as_py()`` + per-row ``vb_decode`` loop that made
    compaction cost ≈ a full rebuild.

    Returns (terms, segs, docs, tfs, dls, counts, poss, pos_lens) with
    zero-posting rows dropped, or None when nothing survives."""
    nrows = tbl.num_rows
    if nrows == 0:
        return None
    from ..functions.codecs import (
        binary_column_view,
        delta_decode_segments,
        vb_decode,
    )

    n = tbl["n"].to_numpy().astype(np.int64)
    total = int(n.sum())
    doc_b, _ = binary_column_view(tbl["doc_bytes"])
    tf_b, _ = binary_column_view(tbl["tf_bytes"])
    dl_b, _ = binary_column_view(tbl["dl_bytes"])
    tfs = vb_decode(tf_b, total).astype(np.uint8)
    dls = vb_decode(dl_b, total).astype(np.uint16)
    docs = delta_decode_segments(vb_decode(doc_b, total), n)
    starts = np.cumsum(n) - n
    poss = pos_lens = None
    if with_pos:
        pos_b, _ = binary_column_view(tbl["pos_bytes"])
        pos_lens = np.minimum(tfs, 255).astype(np.int64)
        poss = decode_positions(pos_b.tobytes(), pos_lens).astype(np.uint32)
    keep = (~np.isin(docs, excl) if len(excl)
            else np.ones(total, bool))
    if not keep.all():
        if with_pos:
            poss = poss[np.repeat(keep, pos_lens)]
            pos_lens = pos_lens[keep]
        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        counts = np.add.reduceat(keep, starts)
        counts[n == 0] = 0
    else:
        counts = n
    row_mask = counts > 0
    terms = tbl["term"].to_pylist()
    segs = tbl["seg"].to_numpy().astype(np.int64)
    if not row_mask.all():
        terms = [t for t, k in zip(terms, row_mask) if k]
        segs = segs[row_mask]
        counts = counts[row_mask]
    if not len(terms):
        return None
    if with_pos and pos_lens is not None:
        # pos_lens is per-POSTING; regroup per row for the list offsets
        pl_counts = counts
        row_pos = np.add.reduceat(
            pos_lens, np.cumsum(pl_counts) - pl_counts) \
            if len(pos_lens) else np.zeros(len(counts), np.int64)
    else:
        row_pos = None
    return terms, segs, docs, tfs, dls, counts, poss, row_pos


class _Partials:
    """Accumulates decoded partial-posting rows in build-input layout."""

    def __init__(self, with_pos: bool):
        self.with_pos = with_pos
        self.bucket: list[int] = []
        self.term: list[str] = []
        self.seg: list[int] = []
        self.docs: list[np.ndarray] = []
        self.tfs: list[np.ndarray] = []
        self.dls: list[np.ndarray] = []
        self.poss: list[np.ndarray] = []

    def add(self, bucket: int, term: str, seg: int, docs, tfs, dls, poss):
        self.bucket.append(bucket)
        self.term.append(term)
        self.seg.append(int(seg))
        self.docs.append(docs)
        self.tfs.append(tfs)
        self.dls.append(dls)
        if self.with_pos:
            self.poss.append(poss)

    def add_decoded(self, bucket: int, decoded) -> None:
        """Bulk-add a :func:`_decode_bucket_table` result: the flat arrays
        are split per row once (numpy views, no per-row decode)."""
        terms, segs, docs, tfs, dls, counts, poss, row_pos = decoded
        offs = np.cumsum(counts) - counts
        self.bucket.extend([bucket] * len(terms))
        self.term.extend(terms)
        self.seg.extend(int(s) for s in segs)
        for o, c in zip(offs, counts):
            self.docs.append(docs[o:o + c])
            self.tfs.append(tfs[o:o + c])
            self.dls.append(dls[o:o + c])
        if self.with_pos:
            po = np.cumsum(row_pos) - row_pos
            for o, c in zip(po, row_pos):
                self.poss.append(poss[o:o + c])

    def table(self) -> pa.Table | None:
        if not self.term:
            return None
        lens = np.asarray([len(d) for d in self.docs], np.int64)
        offs = pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int64())
        cols = {
            "bucket": pa.array(self.bucket, pa.int64()),
            "term": pa.array(self.term, pa.large_string()),
            "seg": pa.array(self.seg, pa.int32()),
            "docs": pa.LargeListArray.from_arrays(
                offs, pa.array(np.concatenate(self.docs), pa.uint64())),
            "tfs": pa.LargeListArray.from_arrays(
                offs, pa.array(np.concatenate(self.tfs), pa.uint8())),
            "dls": pa.LargeListArray.from_arrays(
                offs, pa.array(np.concatenate(self.dls), pa.uint16())),
        }
        if self.with_pos:
            plens = np.asarray([len(p) for p in self.poss], np.int64)
            poffs = pa.array(np.concatenate(([0], np.cumsum(plens))),
                             pa.int64())
            cols["poss"] = pa.LargeListArray.from_arrays(
                poffs, pa.array(np.concatenate(self.poss), pa.uint32()))
        return pa.table(cols)


_MANIFEST_ROW_SCHEMA = pa.schema([
    ("bucket", pa.int64()), ("rows", pa.int64()), ("terms", pa.int64()),
    ("n_postings", pa.int64()), ("bytes", pa.int64()),
    ("checksum", pa.large_string()),
])


class CompactBucket:
    """Actor-pool stage: one call = one output bucket.

    Per-actor state: the union head set, each generation's moved-term list
    (union heads the generation hash-routed), and their routing rows —
    computed once in ``__init__``, reused across the buckets this actor
    compacts."""

    def __init__(self, *, gen_dirs: list[str], heads_ref: Any,
                 gen_heads: list[list[str]], num_buckets: int,
                 salt_shards: int, out_dir: str, cfg_hash: str,
                 avgdl: float, k1: float, b: float, block_size: int,
                 avgdl_map: dict[str, float] | None, with_pos: bool,
                 skip_buckets: tuple[int, ...] = (),
                 exclusions_ref: Any = None):
        heads = (ray.get(heads_ref)
                 if isinstance(heads_ref, ray.ObjectRef) else list(heads_ref))
        excl = (ray.get(exclusions_ref)
                if isinstance(exclusions_ref, ray.ObjectRef)
                else exclusions_ref)
        self.exclusions = (excl if excl is not None
                           else [np.empty(0, np.uint64)] * len(gen_dirs))
        self.gen_dirs = gen_dirs
        self.union_heads = set(heads)
        self.num_buckets = num_buckets
        self.salt_shards = salt_shards
        self.salt_shift = np.uint64(
            63 - max(0, salt_shards.bit_length() - 1))
        self.out_dir = out_dir
        self.cfg_hash = cfg_hash
        self.avgdl = avgdl
        self.k1 = k1
        self.b = b
        self.block_size = block_size
        self.avgdl_map = avgdl_map
        self.with_pos = with_pos
        self.skip = set(skip_buckets)
        # moved[i]: union-head terms gen i placed as non-head (seg-0 row in
        # the term-hash bucket) — these re-split by doc range on compaction
        self.moved: list[dict[str, tuple[int, np.ndarray]]] = []
        for gh in gen_heads:
            gh_set = set(gh)
            m: dict[str, tuple[int, np.ndarray]] = {}
            for t in self.union_heads - gh_set:
                m[t] = (term_hash(t) % num_buckets,
                        _route_row(t, salt_shards, num_buckets))
            self.moved.append(m)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_tables = []
        for bid in batch["id"].to_pylist():
            if bid in self.skip:
                continue
            t = self._compact_one(int(bid))
            if t is not None:
                out_tables.append(t)
        if not out_tables:
            return _MANIFEST_ROW_SCHEMA.empty_table()
        return pa.concat_tables(out_tables)

    def _compact_one(self, b: int) -> pa.Table | None:
        parts = _Partials(self.with_pos)
        for gi, gdir in enumerate(self.gen_dirs):
            moved = self.moved[gi]
            excl = self.exclusions[gi]
            path = os.path.join(bucket_dir(gdir, b), "part.parquet")
            if os.path.exists(path):
                tbl = pq.read_table(path)
                if moved:  # target tasks pull these (re-routed)
                    vs = pa.array(list(moved)).cast(
                        tbl["term"].type.value_type
                        if pa.types.is_dictionary(tbl["term"].type)
                        else tbl["term"].type)
                    tbl = tbl.filter(
                        pc.invert(pc.is_in(tbl["term"], value_set=vs)))
                decoded = _decode_bucket_table(tbl, self.with_pos, excl)
                if decoded is not None:
                    parts.add_decoded(b, decoded)
            # moved pickup: union-head terms this generation hash-routed,
            # whose doc-range salts land in MY bucket
            mine = [(t, src, route) for t, (src, route) in moved.items()
                    if b in route]
            by_src: dict[int, list[tuple[str, np.ndarray]]] = {}
            for t, src, route in mine:
                by_src.setdefault(src, []).append((t, route))
            for src, terms in by_src.items():
                spath = os.path.join(bucket_dir(gdir, src), "part.parquet")
                if not os.path.exists(spath):
                    continue
                import pyarrow.dataset as pa_dataset

                routes = dict(terms)
                stbl = pa_dataset.dataset(spath).to_table(
                    filter=pc.field("term").isin([t for t, _ in terms]))
                for row in _table_rows(stbl, self.with_pos):
                    docs, tfs, dls, poss = _decode_row(row, self.with_pos)
                    docs, tfs, dls, poss = _filter_excluded(
                        docs, tfs, dls, poss, excl)
                    if not len(docs):
                        continue
                    route = routes[row["term"]]
                    salts = (docs >> self.salt_shift).astype(np.int64)
                    keep = route[salts] == b
                    if not keep.any():
                        continue
                    # contiguous runs per salt (docs sorted ⇒ salts sorted)
                    k_idx = np.flatnonzero(keep)
                    k_salts = salts[k_idx]
                    run_starts = np.concatenate(
                        ([0], np.flatnonzero(np.diff(k_salts)) + 1))
                    run_ends = np.concatenate((run_starts[1:], [len(k_idx)]))
                    if self.with_pos:
                        plens = np.minimum(tfs, 255).astype(np.int64)
                        pstarts = np.cumsum(plens) - plens
                    for lo, hi in zip(run_starts, run_ends):
                        idx = k_idx[lo:hi]
                        p = None
                        if self.with_pos:
                            i0, i1 = int(idx[0]), int(idx[-1])
                            p = poss[pstarts[i0]:
                                     pstarts[i1] + plens[i1]]
                        parts.add(b, row["term"], int(k_salts[lo]),
                                  docs[idx], tfs[idx], dls[idx], p)
        group = parts.table()
        if group is None:
            return None
        return build_bucket(
            group, index_dir=self.out_dir, cfg_hash=self.cfg_hash,
            avgdl=self.avgdl, k1=self.k1, b=self.b,
            block_size=self.block_size, avgdl_map=self.avgdl_map)


def compact_generations(
    gen_dirs: list[str],
    out_dir: str,
    *,
    concurrency: int | None = None,
    resume: bool = True,
) -> Manifest:
    """Merge index generations at ``gen_dirs`` into one index at
    ``out_dir``. Returns the new manifest. Rank- AND score-identical to a
    from-scratch :func:`~.build.build_index` over the union corpus (exact
    scorer; the pruned path's block bounds are exact, not the
    ``MultiReader`` rescaled upper bounds). Resumable per bucket via the
    same _OK sidecars as the build."""
    t0 = time.time()
    mans: list[Manifest] = []
    for d in gen_dirs:
        m = Manifest.load(d)
        if m is None:
            raise FileNotFoundError(f"no manifest at {d}")
        mans.append(m)
    cfg0 = mans[0].doc["config"]
    for m in mans[1:]:
        for key in _COMPAT_KEYS:
            if m.doc["config"].get(key) != cfg0.get(key):
                raise ValueError(
                    f"generation {m.index_dir} differs in {key!r}: "
                    f"{m.doc['config'].get(key)!r} vs {cfg0.get(key)!r}")
    num_buckets = int(cfg0["num_buckets"])
    salt_shards = int(cfg0["salt_shards"])
    block_size = int(cfg0["block_size"])
    with_pos = bool(cfg0.get("store_positions"))
    fielded = (cfg0.get("fields") is not None
               or bool(cfg0.get("keyword_fields")))

    gen_heads = [list(m.phase("head_terms").get("terms", [])) for m in mans]
    union_heads = sorted(set().union(*map(set, gen_heads)))
    n_docs = sum(int(m.phase("stats").get("n_docs", 0)) for m in mans)
    total_dl = sum(int(m.phase("stats").get("total_dl", 0)) for m in mans)

    # tombstones: drop deleted docs' postings/docvalues and subtract their
    # EXACT stats contribution — O(deletes) docstore lookups against the
    # dl (+ per-field dl__*) columns the build stores for exactly this.
    # After compaction the index is score-identical to a rebuild over the
    # surviving docs (the ES force-merge reclaim).
    from .docstore import DocStore
    from .multi import generation_exclusions

    exclusions = generation_exclusions(list(gen_dirs))
    # manifest config stores fields as sorted (name, src_col) pair lists
    field_names = (sorted({name for name, _ in (cfg0.get("fields") or [])}
                          | {name for name, _ in
                             (cfg0.get("keyword_fields") or [])})
                   if fielded else [])
    fdl_deltas: dict[str, list[int]] = {f: [0, 0] for f in field_names}
    for gdir, excl in zip(gen_dirs, exclusions):
        if not len(excl):
            continue
        store = DocStore(os.path.join(gdir, "docvalues"))
        cols = ["dl"] + ["dl__" + f for f in field_names]
        try:
            tbl = store.lookup(excl, cols)
        except Exception as exc:
            raise RuntimeError(
                f"generation {gdir} predates dl-bearing docvalues — "
                "rebuild it (or compact without tombstones) to reclaim "
                f"deletes: {exc}") from exc
        n_docs -= tbl.num_rows
        total_dl -= int(pc.sum(tbl["dl"]).as_py() or 0)
        for f in field_names:
            col = tbl["dl__" + f]
            fdl_deltas[f][0] += int(pc.sum(col).as_py() or 0)
            fdl_deltas[f][1] += int(pc.sum(
                pc.cast(pc.greater(col, 0), pa.int64())).as_py() or 0)
    avgdl = (total_dl / n_docs) if n_docs else 1.0

    avgdl_map: dict[str, float] | None = None
    fstats: dict[str, dict] = {}
    if fielded:
        sums: dict[str, list[int]] = {}
        for m in mans:
            for f, v in m.phase("fieldstats").get("fields", {}).items():
                s = sums.setdefault(f, [0, 0])
                s[0] += int(v.get("sum_dl", 0))
                s[1] += int(v.get("n_docs", 0))
        for f, (s, c) in sums.items():
            ds, dc = fdl_deltas.get(f, (0, 0))
            s, c = s - ds, c - dc
            fstats[f] = {"n_docs": c, "sum_dl": s,
                         "avgdl": (s / c) if c else 0.0}
        avgdl_map = {f: (float(v["avgdl"]) or 1.0)
                     for f, v in fstats.items()}

    tomb_tag = ""
    if any(len(e) for e in exclusions):
        h = hashlib.sha256()
        for e in exclusions:
            h.update(np.ascontiguousarray(e).tobytes())
        tomb_tag = f"-tomb:{h.hexdigest()[:12]}"
    cfg = dict(
        cfg0,
        input_tag="compact(" + "+".join(
            str(m.doc["config"].get("input_tag")) for m in mans)
        + ")" + tomb_tag,
    )
    existing = Manifest.load(out_dir) if resume else None
    if existing is not None and existing.compatible_with(cfg):
        man = existing
    else:
        if os.path.exists(out_dir) and not resume:
            shutil.rmtree(out_dir)
        man = Manifest(out_dir, cfg)
    man.save()

    def _took() -> float:
        return round(time.time() - t0, 3)

    if not man.phase_done("stats"):
        man.mark_done("stats", n_docs=n_docs, total_dl=total_dl,
                      avgdl=avgdl, seconds=_took(),
                      source="compacted " + str(len(gen_dirs)) + " gens")
    if fielded and not man.phase_done("fieldstats"):
        man.mark_done("fieldstats", seconds=_took(), fields=fstats)
    if not man.phase_done("head_terms"):
        man.mark_done("head_terms", seconds=_took(), terms=union_heads,
                      source="union of generation head sets")

    if not man.phase_done("postings"):
        done = done_buckets(out_dir, num_buckets, man.hash) if resume else {}
        heads_ref = ray.put(union_heads)
        exclusions_ref = ray.put(exclusions)
        conc = concurrency or min(num_buckets, 16)
        manifest_rows = (
            rd.range(num_buckets, override_num_blocks=num_buckets)
            .map_batches(
                CompactBucket,
                fn_constructor_kwargs=dict(
                    gen_dirs=list(gen_dirs), heads_ref=heads_ref,
                    gen_heads=gen_heads, num_buckets=num_buckets,
                    salt_shards=salt_shards, out_dir=out_dir,
                    cfg_hash=man.hash, avgdl=avgdl,
                    k1=float(cfg0["k1"]), b=float(cfg0["b"]),
                    block_size=block_size, avgdl_map=avgdl_map,
                    with_pos=with_pos,
                    skip_buckets=tuple(done.keys()),
                    exclusions_ref=exclusions_ref,
                ),
                batch_format="pyarrow",
                concurrency=conc,
            )
            .to_pandas()
        )
        buckets = {int(r.bucket): {
            "rows": int(r.rows), "terms": int(r.terms),
            "n_postings": int(r.n_postings), "bytes": int(r.bytes),
            "checksum": r.checksum, "status": "done",
        } for r in manifest_rows.itertuples()}
        for bkt, ok in (done or {}).items():
            buckets[int(bkt)] = {
                "rows": ok["rows"], "terms": ok["terms"],
                "n_postings": ok["n_postings"], "bytes": ok["bytes"],
                "checksum": ok["checksum"], "status": "done",
            }
        man.mark_done(
            "postings", seconds=_took(),
            buckets={str(k): v for k, v in sorted(buckets.items())},
            n_postings=int(sum(v["n_postings"] for v in buckets.values())),
            bytes=int(sum(v["bytes"] for v in buckets.values())),
        )

    if not man.phase_done("termstats"):
        n_terms = derive_termstats(
            out_dir, num_buckets, union_heads,
            os.path.join(out_dir, "termstats"))
        man.mark_done("termstats", dir="termstats", n_terms=int(n_terms),
                      seconds=_took())

    if not man.phase_done("docvalues"):
        dv_dir = os.path.join(out_dir, "docvalues")
        tmp_dir = dv_dir + ".tmp"
        for d in (tmp_dir, dv_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        gen_ds = []
        for g, excl in zip(gen_dirs, exclusions):
            gd = os.path.join(g, "docvalues")
            if not os.path.isdir(gd):
                continue
            srcs = [os.path.join(gd, f) for f in sorted(os.listdir(gd))
                    if f.endswith(".parquet")]
            if not srcs:
                continue
            ds = rd.read_parquet(srcs, override_num_blocks=16)
            if len(excl):
                excl_ref = ray.put(excl)

                def drop(t: pa.Table, _ref=excl_ref) -> pa.Table:
                    e = ray.get(_ref)
                    ids = t["doc_id"].to_numpy().astype(np.uint64)
                    # no assume_unique on ids: if a doc ever violated the
                    # disjoint-generation contract and appeared twice in one
                    # store, assume_unique would yield undefined masks —
                    # the exact-match cost difference is negligible next to
                    # the parquet read (exclusions are np.unique'd upstream)
                    return t.filter(pa.array(~np.isin(ids, e)))

                ds = ds.map_batches(drop, batch_format="pyarrow")
            gen_ds.append(ds)
        if gen_ds:
            base = gen_ds[0]
            for other in gen_ds[1:]:
                base = base.union(other)
            base.sort("doc_id").write_parquet(tmp_dir, row_group_size=8192)
        os.makedirs(tmp_dir, exist_ok=True)
        os.replace(tmp_dir, dv_dir)
        n_rows = sum(
            pq.read_metadata(os.path.join(dv_dir, f)).num_rows
            for f in os.listdir(dv_dir) if f.endswith(".parquet"))
        man.mark_done("docvalues", seconds=_took(), dir="docvalues",
                      rows=int(n_rows))
    return man
