"""Inverted-index build: Ray-Data-native SPIMI → salted shuffle → bucket files.

The reference streams cleaned chunks into Elasticsearch and lets Lucene build
the inverted index (`Makefile:161-175` recipe-run → ES bulk; analysis config
`datasets/deces_index.yml`). Here the build is owned end-to-end as a Ray Data
pipeline:

  read_parquet(pages)
    → map_batches(analyze, task pool)            # tokenize, fold, tf per doc
    → write_parquet(analyzed/)                   # checkpoint + docstore
  read(analyzed[terms,tfs]) → df/cf partials → groupby(term).sum  # termstats
  (stats fall out of termstats: N from parquet metadata, Σcf = tokens)
  read(analyzed)          → map_batches(EmitPartials, task pool)  # SPIMI:
        per-batch (term, seg) partial postings, sorted by doc_id, routed to a
        term-hash bucket; head terms are SALTED into ``salt_shards`` doc-range
        segments so no single group holds a Zipf head term's full postings
    → groupby("bucket").map_groups(build_bucket) # merge partials, delta+varbyte
        encode with per-block max-weight metadata, write bucket atomically

Scale notes (designed for 10^12 docs / 100 TB, tested single-node):
- The analyzed checkpoint is written once; every later phase prunes columns at
  the read (dl-only for stats, terms-only for head detection), so no phase
  re-tokenizes and no phase reads the html/text payload again.
- Map-side combine (per-batch partial postings as Arrow list columns) shrinks
  the shuffle: the groupby moves one row per (term, seg, input batch), not one
  row per posting.
- Head-term salting bounds the largest shuffle group at ~1/salt_shards of the
  hottest term; segments are doc_id-range-contiguous, so the final posting
  list is the ordered concatenation of its segments (merged lazily by the
  reader, or eagerly by ``compact_head_segments`` for small indexes).
- Every bucket output is atomic (tmp+rename) with an ``_OK.json`` sidecar
  (rows/bytes/checksum/lineage); a rerun skips finished buckets mid-shuffle —
  the fine-grained replacement for the reference's snapshot skip
  (`Makefile:177-181`).
"""

from __future__ import annotations

import functools
import hashlib
import io
import logging
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
from ray.data.aggregate import Sum

from ..functions.analysis import analyze_batch
from ..functions.codecs import (
    binary_column_from,
    binary_column_view,
    decode_positions,
    encode_positions,
    encode_postings_blocks,
    vb_encode,
    vb_lengths,
)
from ..functions.ids import doc_ids_from_urls, term_buckets
from ..state.manifest import (
    OK_NAME,
    Manifest,
    atomic_write_json,
    bucket_dir,
    done_buckets,
)

logger = logging.getLogger(__name__)

ANALYZER_VERSION = "norm-v2"  # bump when analysis.py changes semantics


# ---------------------------------------------------------------------------
# Phase A: analyze → per-doc checkpoint
# ---------------------------------------------------------------------------

class AnalyzeDocs:
    """Actor-pool stage: pages → (doc_id, url, dl, terms, tfs[, tdls, dl__f…]).

    Stateful setup (fold tables / compiled regexes import-time in analysis.py)
    is amortized per actor; __call__ is one vectorized pass per batch.

    Fielded mode (``fields`` / ``keyword_fields`` given — the reference's
    per-field ES mapping, `datasets/deces_index.yml:42-157`): each analyzed
    field's tokens are indexed as ``field:token`` terms; each keyword field's
    whole normalized value as one ``field:value`` term (the ``raw`` sub-field
    pattern, `deces_index.yml:55-61`). The checkpoint then also carries
    ``tdls`` (per-posting FIELD length — BM25's length norm is per field) and
    one ``dl__<field>`` uint32 column per field (feeds the per-field
    n_docs/avgdl stats pass). ``passthrough`` columns are copied unchanged
    into the checkpoint for the docvalues store (typed range/geo filters).

    ``store_positions`` composes with both modes: in fielded mode each
    analyzed field's positions are 0-based within THAT field's token stream
    (phrase queries are per-field — the reference's mapping is all-fielded,
    `deces_index.yml:42-157`, so match_phrase-on-NOM needs exactly this),
    and a keyword field's single term sits at position 0.
    """

    def __init__(self, url_col: str = "url", text_col: str = "text",
                 fields: dict[str, str] | None = None,
                 keyword_fields: dict[str, str] | None = None,
                 passthrough: tuple[tuple[str, str], ...] = (),
                 store_positions: bool = False):
        from ..functions.analysis import TokenFolder

        self.url_col = url_col
        self.text_col = text_col
        self.fields = dict(fields) if fields else None
        self.keyword_fields = dict(keyword_fields or {})
        self.passthrough = tuple(passthrough)
        self.store_positions = store_positions
        self.folder = TokenFolder()  # per-actor fold memo, amortized

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fields is None and not self.keyword_fields:
            return self._call_single(batch)
        return self._call_fielded(batch)

    def _call_single(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        texts = ["" if t is None else t for t in texts]
        if self.store_positions:
            flat_terms, flat_tfs, offsets, dl, tpos = \
                _analyze_with_positions(texts, self.folder)
        else:
            flat_terms, flat_tfs, offsets, dl = analyze_batch(
                texts, self.folder)
        doc_ids = doc_ids_from_urls(urls)
        cols: dict[str, Any] = {
            "doc_id": pa.array(doc_ids, pa.uint64()),
            "url": pa.array(urls, pa.string()),
            "dl": pa.array(dl, pa.uint32()),
            "terms": pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                pa.array(flat_terms, pa.large_string()),
            ),
            "tfs": pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                pa.array(flat_tfs, pa.uint32()),
            ),
        }
        if self.store_positions:
            cols["tpos"] = tpos
        # docvalue columns must reach the checkpoint in single-field mode
        # too — phase E reads them for the docstore
        for out_name, src_col in self.passthrough:
            cols[out_name] = batch[src_col]
        return pa.table(cols)

    def _call_fielded(self, batch: pa.Table) -> pa.Table:
        from ..functions.analysis import normalize_keyword

        urls = batch[self.url_col].to_pylist()
        n = len(urls)
        doc_ids = doc_ids_from_urls(urls)
        empty_str = pa.array([], pa.large_string())

        doc_idx_parts: list[np.ndarray] = []
        term_parts: list[pa.Array] = []
        tf_parts: list[np.ndarray] = []
        tdl_parts: list[np.ndarray] = []
        pos_parts: list[np.ndarray] = []  # per-posting flat position slices
        dl_cols: dict[str, np.ndarray] = {}
        total_dl = np.zeros(n, np.int64)

        for f in sorted(self.fields or {}):
            texts = batch[self.fields[f]].to_pylist()
            texts = ["" if t is None else str(t) for t in texts]
            if self.store_positions:
                # positions are 0-based within the FIELD's own token stream
                ft, ftf, off, dl, tp = _analyze_with_positions(
                    texts, self.folder)
                pos_parts.append(tp.flatten().to_numpy(
                    zero_copy_only=False).astype(np.uint32))
            else:
                ft, ftf, off, dl = analyze_batch(texts, self.folder)
            lens = np.diff(off)
            di = np.repeat(np.arange(n, dtype=np.int64), lens)
            doc_idx_parts.append(di)
            # vectorized "field:" prefix on the flat term array
            arr = pa.array(ft, pa.large_string()) if len(ft) else empty_str
            term_parts.append(pc.binary_join_element_wise(
                pa.scalar(f + ":", pa.large_string()), arr,
                pa.scalar("", pa.large_string())))
            tf_parts.append(ftf.astype(np.uint32))
            dl32 = dl.astype(np.uint32)
            tdl_parts.append(dl32[di])
            dl_cols[f] = dl32
            total_dl += dl

        for f in sorted(self.keyword_fields):
            vals = batch[self.keyword_fields[f]].to_pylist()
            norms = ["" if v is None else normalize_keyword(str(v))
                     for v in vals]
            di = np.flatnonzero(np.fromiter((len(s) > 0 for s in norms),
                                            bool, n)).astype(np.int64)
            doc_idx_parts.append(di)
            term_parts.append(pa.array([f + ":" + norms[i] for i in di],
                                       pa.large_string()))
            tf_parts.append(np.ones(len(di), np.uint32))
            tdl_parts.append(np.ones(len(di), np.uint32))
            if self.store_positions:
                # a keyword field is one unanalyzed term at position 0
                pos_parts.append(np.zeros(len(di), np.uint32))
            has = np.zeros(n, np.uint32)
            has[di] = 1
            dl_cols[f] = has

        doc_idx = (np.concatenate(doc_idx_parts) if doc_idx_parts
                   else np.empty(0, np.int64))
        order = np.argsort(doc_idx, kind="stable")
        terms_flat = (pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in term_parts]).take(pa.array(order, pa.int64()))
            if term_parts else empty_str)
        tfs_pre = (np.concatenate(tf_parts) if tf_parts
                   else np.empty(0, np.uint32))
        tfs_flat = tfs_pre[order]
        tdls_flat = (np.concatenate(tdl_parts)[order] if tdl_parts
                     else np.empty(0, np.uint32))
        offsets = np.searchsorted(doc_idx[order],
                                  np.arange(n + 1, dtype=np.int64)
                                  ).astype(np.int64)
        off_arr = pa.array(offsets, pa.int64())
        cols: dict[str, Any] = {
            "doc_id": pa.array(doc_ids, pa.uint64()),
            "url": pa.array(urls, pa.string()),
            "dl": pa.array(np.minimum(total_dl, 2**32 - 1).astype(np.uint32),
                           pa.uint32()),
            "terms": pa.LargeListArray.from_arrays(off_arr, terms_flat),
            "tfs": pa.LargeListArray.from_arrays(
                off_arr, pa.array(tfs_flat, pa.uint32())),
            "tdls": pa.LargeListArray.from_arrays(
                off_arr, pa.array(tdls_flat, pa.uint32())),
        }
        if self.store_positions:
            # gather each posting's variable-length position slice into the
            # reordered (doc-major) posting order, exactly the single-field
            # checkpoint layout: per-posting slice length = min(tf, 255)
            flat_pos_all = (np.concatenate(pos_parts) if pos_parts
                            else np.empty(0, np.uint32))
            lens_pre = np.minimum(tfs_pre, 255).astype(np.int64)
            starts_pre = np.cumsum(lens_pre) - lens_pre
            l_o = lens_pre[order]
            s_o = starts_pre[order]
            ends = np.cumsum(l_o)
            total = int(ends[-1]) if len(ends) else 0
            idx = (np.repeat(s_o, l_o)
                   + np.arange(total) - np.repeat(ends - l_o, l_o))
            pos_prefix = np.concatenate(([0], ends)).astype(np.int64)
            cols["tpos"] = pa.LargeListArray.from_arrays(
                pa.array(pos_prefix[offsets], pa.int64()),
                pa.array(flat_pos_all[idx], pa.uint32()))
        for f, dlc in sorted(dl_cols.items()):
            cols["dl__" + f] = pa.array(dlc, pa.uint32())
        for out_name, src_col in self.passthrough:
            cols[out_name] = batch[src_col]
        return pa.table(cols)


def _analyze_with_positions(texts, folder):
    """Single-pass positional analysis, fully vectorized: tokenize once,
    then ONE lexsort over the batch's flat token stream groups each doc's
    postings (ascending positions within each (doc, term) group) — no
    per-token Python. Per-doc term order is the batch factorize order
    (deterministic for a given input + batch_size; nothing downstream
    depends on within-doc term order — the shuffle re-sorts by (term, doc)).
    Positions are capped at 255 per posting to stay consistent with the
    shuffle's uint8 tf quantization — the documented phrase-recall cap."""
    import pandas as pd

    from ..functions.analysis import tokenize_many

    tok_lists = tokenize_many(texts, folder)
    n = len(texts)
    doc_lens = np.fromiter((len(t) for t in tok_lists), np.int64, n)
    dl = doc_lens.astype(np.uint32)
    total = int(doc_lens.sum())
    if total == 0:
        off = np.zeros(n + 1, np.int64)
        tpos = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pa.array([], pa.uint32()))
        return (np.empty(0, object), np.empty(0, np.uint32), off, dl, tpos)
    flat = np.empty(total, object)
    at = 0
    for toks in tok_lists:
        flat[at: at + len(toks)] = toks
        at += len(toks)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), doc_lens)
    doc_starts = np.zeros(n + 1, np.int64)
    np.cumsum(doc_lens, out=doc_starts[1:])
    pos_in_doc = np.arange(total, dtype=np.int64) - doc_starts[doc_idx]
    codes, uq = pd.factorize(flat, sort=False)
    order = np.lexsort((pos_in_doc, codes, doc_idx))
    d_s = doc_idx[order]
    c_s = codes[order]
    p_s = pos_in_doc[order]
    change = np.empty(total, bool)
    change[0] = True
    np.not_equal(d_s[1:], d_s[:-1], out=change[1:])
    change[1:] |= c_s[1:] != c_s[:-1]
    starts = np.flatnonzero(change)
    group_lens = np.diff(np.concatenate((starts, [total])))
    terms_flat = np.asarray(uq, object)[c_s[starts]]
    tfs = group_lens.astype(np.uint32)
    posting_doc = d_s[starts]
    offsets = np.searchsorted(posting_doc,
                              np.arange(n + 1, dtype=np.int64)
                              ).astype(np.int64)
    # positions: first min(tf, 255) of each group, already ascending
    keep_lens = np.minimum(group_lens, 255)
    ends = np.cumsum(keep_lens)
    tot_pos = int(ends[-1])
    idx = (np.repeat(starts, keep_lens)
           + np.arange(tot_pos) - np.repeat(ends - keep_lens, keep_lens))
    flat_pos = p_s[idx].astype(np.uint32)
    doc_pos_lens = np.zeros(n, np.int64)
    np.add.at(doc_pos_lens, posting_doc, keep_lens)
    pos_off = np.zeros(n + 1, np.int64)
    np.cumsum(doc_pos_lens, out=pos_off[1:])
    tpos = pa.LargeListArray.from_arrays(
        pa.array(pos_off, pa.int64()), pa.array(flat_pos, pa.uint32()))
    return (terms_flat, tfs, offsets, dl, tpos)


# Task-pool variants: Ray reuses warm worker processes across tasks and
# phases, so per-process module state replaces actor state with zero pool
# spin-up cost (an actor pool pays one process start + import per actor,
# which dominates small/medium builds).
_ANALYZER_SINGLETON: dict[tuple, AnalyzeDocs] = {}


def _analyze_docs_fn(batch: pa.Table, url_col: str, text_col: str,
                     fields: tuple | None = None,
                     keyword_fields: tuple = (),
                     passthrough: tuple = (),
                     store_positions: bool = False) -> pa.Table:
    key = (url_col, text_col, fields, keyword_fields, passthrough,
           store_positions)
    inst = _ANALYZER_SINGLETON.get(key)
    if inst is None:
        inst = _ANALYZER_SINGLETON.setdefault(key, AnalyzeDocs(
            url_col, text_col,
            fields=dict(fields) if fields is not None else None,
            keyword_fields=dict(keyword_fields),
            passthrough=passthrough,
            store_positions=store_positions))
    return inst(batch)


_EMIT_SINGLETON: dict[tuple, "EmitPartials"] = {}


def _emit_partials_fn(
    batch: pa.Table, head_ref, num_buckets: int, salt_shards: int,
    skip_buckets: tuple[int, ...],
) -> pa.Table:
    key = (
        head_ref.hex() if isinstance(head_ref, ray.ObjectRef) else id(head_ref),
        num_buckets, salt_shards, skip_buckets,
    )
    inst = _EMIT_SINGLETON.get(key)
    if inst is None:
        inst = _EMIT_SINGLETON.setdefault(
            key, EmitPartials(head_ref, num_buckets, salt_shards, skip_buckets)
        )
    return inst(batch)


# ---------------------------------------------------------------------------
# Phase C helpers: head-term detection (df pre-pass)
# ---------------------------------------------------------------------------

def _df_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies: one (term, df) row per unique
    term per batch — the map-side combine that keeps the termstats groupby
    small. Terms are per-doc unique in ``analyzed``, so an Arrow
    ``value_counts`` over the flat term stream is the per-batch df. (Collection frequency is NOT
    computed here: per-term cf already falls out of the postings reduce, and
    the global token count is Σdl over the cheap uint32 ``dl`` column — so
    this pass reads ONLY the ``terms`` column, skipping the tf lists.)"""
    col = batch["terms"].combine_chunks()
    flat = col.flatten()
    if len(flat) == 0:
        return pa.table({"term": pa.array([], pa.large_string()),
                         "df": pa.array([], pa.int64())})
    # Arrow-native value_counts: no per-token Python objects (a flatten to
    # an object ndarray materializes one PyObject per token — measured as
    # allocator/DRAM churn that anti-scales past ~8 concurrent workers)
    vc = pc.value_counts(flat)
    return pa.table({"term": vc.field("values"),
                     "df": vc.field("counts").cast(pa.int64())})


# ---------------------------------------------------------------------------
# Phase D: SPIMI partial-postings emission (map-side combine)
# ---------------------------------------------------------------------------

class EmitPartials:
    """Actor-pool stage: analyzed rows → per-(term, seg) partial postings.

    State per actor: the broadcast head-term set (ray.put once on the driver,
    fetched once per actor — never re-shipped per batch) and the precomputed
    head-term → per-salt bucket routing matrix.
    """

    def __init__(
        self,
        head_ref: Any,
        num_buckets: int,
        salt_shards: int,
        skip_buckets: tuple[int, ...] = (),
    ):
        if head_ref is None:
            heads: list[str] = []
        elif isinstance(head_ref, ray.ObjectRef):
            heads = ray.get(head_ref)
        else:
            heads = list(head_ref)
        self.num_buckets = num_buckets
        self.salt_shards = salt_shards
        self.salt_shift = np.uint64(63 - max(0, salt_shards.bit_length() - 1))
        self.head_row = {t: i for i, t in enumerate(heads)}
        # routing matrix: head term i × salt s → bucket
        mat = np.empty((max(1, len(heads)), salt_shards), dtype=np.int64)
        for i, t in enumerate(heads):
            for s in range(salt_shards):
                h = hashlib.blake2b(
                    f"{t}\x00{s}".encode("utf-8"), digest_size=8
                ).digest()
                mat[i, s] = int.from_bytes(h, "big") % num_buckets
        self.head_mat = mat
        self.skip = np.asarray(sorted(skip_buckets), dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tbl = batch.combine_chunks()
        terms_col = tbl["terms"].combine_chunks()
        tfs_col = tbl["tfs"].combine_chunks()
        flat_terms = terms_col.flatten()  # stays Arrow — see factorize below
        flat_tfs = tfs_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint32)
        lens = pc.list_value_length(terms_col).to_numpy().astype(np.int64)
        doc_rep = np.repeat(tbl["doc_id"].to_numpy(), lens).astype(np.uint64)
        if "tdls" in tbl.column_names:
            # fielded mode: the per-posting length norm is the FIELD's dl
            dl_rep = (tbl["tdls"].combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False).astype(np.uint32))
        else:
            dl_rep = np.repeat(tbl["dl"].to_numpy(), lens).astype(np.uint32)
        with_pos = "tpos" in tbl.column_names
        if with_pos:
            # flat token positions, aligned with the flat posting order
            # (doc-major, term-major within doc); per-posting slice length
            # is min(tf, 255) — the capped tf the shuffle/bucket stores
            flat_pos = (tbl["tpos"].combine_chunks().flatten()
                        .to_numpy(zero_copy_only=False).astype(np.uint32))
            pos_len = np.minimum(flat_tfs, 255).astype(np.int64)
            pos_start = np.cumsum(pos_len) - pos_len
        if len(flat_terms) == 0:
            return _empty_partials(with_pos)

        # Arrow dictionary_encode instead of pandas factorize over an object
        # ndarray: factorize needs one Python str per token (~200x the batch's
        # unique count under a Zipf vocabulary) — that allocation churn is
        # pure overhead AND is DRAM-bound, so it anti-scales with worker
        # count. Only the per-batch UNIQUES become Python strings here.
        denc = pc.dictionary_encode(flat_terms)
        inv = denc.indices.to_numpy().astype(np.int64)
        uq = denc.dictionary.to_numpy(zero_copy_only=False)
        buckets_uq = term_buckets(uq, self.num_buckets).astype(np.int64)
        head_row_uq = np.full(len(uq), -1, dtype=np.int64)
        for i, t in enumerate(uq):
            r = self.head_row.get(t)
            if r is not None:
                head_row_uq[i] = r

        salt = np.zeros(len(flat_terms), dtype=np.uint64)
        bucket = buckets_uq[inv]
        hr = head_row_uq[inv]
        is_head = hr >= 0
        if is_head.any():
            salt[is_head] = doc_rep[is_head] >> self.salt_shift
            bucket[is_head] = self.head_mat[
                hr[is_head], salt[is_head].astype(np.int64)
            ]

        if self.skip.size:
            keep = ~np.isin(bucket, self.skip)
            if not keep.all():
                inv, salt, bucket = inv[keep], salt[keep], bucket[keep]
                doc_rep, dl_rep, flat_tfs = doc_rep[keep], dl_rep[keep], flat_tfs[keep]
                if with_pos:
                    pos_len, pos_start = pos_len[keep], pos_start[keep]
            if len(inv) == 0:
                return _empty_partials(with_pos)

        # Lucene-style quantization for the shuffle: tf saturates at 255,
        # dl at 65535 (uint8/uint16 instead of uint32 — 31% less exchange
        # volume; BM25's tf/(tf+k) is asymptotically flat there anyway)
        flat_tfs = np.minimum(flat_tfs, 255).astype(np.uint8)
        dl_rep = np.minimum(dl_rep, 65535).astype(np.uint16)
        order = np.lexsort((doc_rep, salt, inv))
        inv_s = inv[order]
        salt_s = salt[order]
        group_change = np.empty(len(order), dtype=bool)
        group_change[0] = True
        np.not_equal(inv_s[1:], inv_s[:-1], out=group_change[1:])
        group_change[1:] |= salt_s[1:] != salt_s[:-1]
        starts = np.flatnonzero(group_change)
        offsets = np.concatenate((starts, [len(order)])).astype(np.int64)

        row_term = uq[inv_s[starts]]
        row_seg = salt_s[starts].astype(np.int32)
        row_bucket = bucket[order][starts]
        off_arr = pa.array(offsets, pa.int64())
        cols = {
            "bucket": pa.array(row_bucket, pa.int64()),
            "term": pa.array(row_term, pa.large_string()),
            "seg": pa.array(row_seg, pa.int32()),
            "docs": pa.LargeListArray.from_arrays(
                off_arr, pa.array(doc_rep[order], pa.uint64())
            ),
            "tfs": pa.LargeListArray.from_arrays(
                off_arr, pa.array(flat_tfs[order], pa.uint8())
            ),
            "dls": pa.LargeListArray.from_arrays(
                off_arr, pa.array(dl_rep[order], pa.uint16())
            ),
        }
        if with_pos:
            # gather each reordered posting's variable-length position
            # slice, then ship it VARBYTE-DELTA-encoded (reset at every
            # posting start — the same stream shape the bucket files
            # store): positions are small ints, so this genuinely
            # compresses the exchange ~2.5-3x (unlike doc ids, whose
            # full-range hashes made delta+varbyte a measured LOSS —
            # BASELINE.md round-5; they stay raw u64). The decode is the
            # batched decode_positions the reader already uses.
            l_o = pos_len[order]
            s_o = pos_start[order]
            ends = np.cumsum(l_o)
            total = int(ends[-1]) if len(ends) else 0
            idx = (np.repeat(s_o, l_o)
                   + np.arange(total) - np.repeat(ends - l_o, l_o))
            flat_pp = flat_pos[idx].astype(np.uint64)
            d_pos = flat_pp.copy()
            if total:
                d_pos[1:] -= flat_pp[:-1]
                p_starts_v = (ends - l_o).astype(np.int64)
                d_pos[p_starts_v] = flat_pp[p_starts_v]
            nbp = vb_lengths(d_pos)
            cump = np.zeros(len(nbp) + 1, np.int64)
            np.cumsum(nbp, out=cump[1:])
            prefix = np.concatenate(([0], ends)).astype(np.int64)
            cols["pos_vb"] = binary_column_from(
                vb_encode(d_pos, nbp), cump[prefix[offsets]])
        return pa.table(cols)


def _empty_partials(with_pos: bool = False) -> pa.Table:
    off = pa.array([0], pa.int64())
    cols = {
        "bucket": pa.array([], pa.int64()),
        "term": pa.array([], pa.large_string()),
        "seg": pa.array([], pa.int32()),
        "docs": pa.LargeListArray.from_arrays(off, pa.array([], pa.uint64())),
        "tfs": pa.LargeListArray.from_arrays(off, pa.array([], pa.uint8())),
        "dls": pa.LargeListArray.from_arrays(off, pa.array([], pa.uint16())),
    }
    if with_pos:
        cols["pos_vb"] = binary_column_from(b"", np.zeros(1, np.int64))
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Phase D reduce: merge partials per bucket, encode, write atomically
# ---------------------------------------------------------------------------

BUCKET_SCHEMA = pa.schema(
    [
        ("term", pa.large_string()),
        ("seg", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("n", pa.int64()),
        ("doc_bytes", pa.large_binary()),
        ("tf_bytes", pa.large_binary()),
        ("dl_bytes", pa.large_binary()),
        ("blk_last", pa.list_(pa.uint64())),
        ("blk_max_w", pa.list_(pa.float64())),
        ("blk_count", pa.list_(pa.int32())),
        ("blk_off_doc", pa.list_(pa.uint32())),
        ("blk_off_tf", pa.list_(pa.uint32())),
        ("blk_off_dl", pa.list_(pa.uint32())),
    ]
)


def bucket_schema(with_pos: bool = False) -> pa.Schema:
    """Bucket layout; positional indexes append a ``pos_bytes`` stream
    (varbyte of per-posting delta-encoded token positions, split by tf)."""
    if not with_pos:
        return BUCKET_SCHEMA
    return BUCKET_SCHEMA.append(pa.field("pos_bytes", pa.large_binary()))


def bm25_weight(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """The doc-dependent BM25 factor tf/(tf + k1*(1-b+b*dl/avgdl)).

    Frozen float64 formula — block-max metadata, the exhaustive oracle and
    WAND all call this exact function so scores match bit-for-bit
    (SURVEY.md §7.4 "rank-identical BM25")."""
    tf = tfs.astype(np.float64)
    norm = k1 * (1.0 - b + b * (dls.astype(np.float64) / avgdl))
    return tf / (tf + norm)


def build_bucket(
    group: pa.Table,
    *,
    index_dir: str,
    cfg_hash: str,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    avgdl_map: dict[str, float] | None = None,
) -> pa.Table:
    """Reduce one bucket: merge per-batch partials per (term, seg), sort by
    doc_id, block-encode, write ``bucket=NNNNN/part.parquet`` atomically with
    an _OK sidecar. Returns one manifest row."""
    bucket = int(group["bucket"][0].as_py())
    tbl = group.combine_chunks()
    docs_col = tbl["docs"].combine_chunks()
    flat_docs = docs_col.flatten().to_numpy().astype(np.uint64)
    flat_tfs = tbl["tfs"].combine_chunks().flatten().to_numpy().astype(np.uint32)
    flat_dls = tbl["dls"].combine_chunks().flatten().to_numpy().astype(np.uint32)
    lens = pc.list_value_length(docs_col).to_numpy().astype(np.int64)

    # positions arrive either varbyte-delta-encoded (the shuffle layout,
    # "pos_vb" — batched decode below) or as plain u32 lists ("poss", the
    # layout compaction's decoded partials use)
    with_pos = ("poss" in tbl.column_names
                or "pos_vb" in tbl.column_names)
    if with_pos:
        pos_len = np.minimum(flat_tfs, 255).astype(np.int64)
        pos_start = np.cumsum(pos_len) - pos_len
        if "pos_vb" in tbl.column_names:
            pos_data, _ = binary_column_view(tbl["pos_vb"])
            flat_pos_all = decode_positions(pos_data.tobytes(), pos_len)
        else:
            flat_pos_all = (tbl["poss"].combine_chunks().flatten()
                            .to_numpy(zero_copy_only=False)
                            .astype(np.uint32))

    segs = tbl["seg"].to_numpy()
    # factorize (term, seg) at row level, then explode to postings —
    # Arrow-native: term strings stay in Arrow buffers end to end (the
    # fielded branch below is the only consumer of Python term objects)
    tdenc = pc.dictionary_encode(tbl["term"].combine_chunks())
    tcodes = tdenc.indices.to_numpy().astype(np.int64)
    row_key = tcodes * np.int64(1 << 20) + segs.astype(np.int64)
    key_rep = np.repeat(row_key, lens)
    order = np.lexsort((flat_docs, key_rep))
    key_s = key_rep[order]
    docs_s = flat_docs[order]
    tfs_s = flat_tfs[order]
    dls_s = flat_dls[order]

    # duplicate doc_ids for a term can only come from duplicate input rows
    # (same url read twice); keep first occurrence for idempotence — the
    # reference gets the same via ES _id upsert (deces_dataprep.yml:14-15)
    n0 = len(key_s)
    if n0:
        dup = np.zeros(n0, dtype=bool)
        np.equal(key_s[1:], key_s[:-1], out=dup[1:])
        dup[1:] &= docs_s[1:] == docs_s[:-1]
        if dup.any():
            keepm = ~dup
            key_s = key_s[keepm]
            docs_s = docs_s[keepm]
            tfs_s = tfs_s[keepm]
            dls_s = dls_s[keepm]
            if with_pos:
                order = order[keepm]
    n = len(key_s)

    change = np.empty(n, dtype=bool)
    if n:
        change[0] = True
        np.not_equal(key_s[1:], key_s[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    bounds = np.concatenate((starts, [n])).astype(np.int64)
    n_groups = len(starts)

    # BM25 weight per posting — vectorized over the whole bucket. Fielded
    # mode maps each unique term's FIELD avgdl through its dictionary code
    # (numpy broadcasts a per-posting avgdl array through bm25_weight).
    if avgdl_map is None:
        weights_s = bm25_weight(tfs_s, dls_s, avgdl, k1, b)
    else:
        uq_terms = tdenc.dictionary.to_numpy(zero_copy_only=False)
        avgdl_uq = np.asarray(
            [(avgdl_map.get(str(t).split(":", 1)[0], avgdl) or 1.0)
             for t in uq_terms], np.float64)
        weights_s = bm25_weight(
            tfs_s, dls_s, avgdl_uq[(key_s >> np.int64(20))], k1, b)

    cf_g = (np.add.reduceat(tfs_s, starts, dtype=np.int64)
            if n else np.empty(0, np.int64))

    if with_pos and n:
        # whole-bucket position stream: gather each surviving posting's
        # ascending position slice in sorted-posting order, delta-encode
        # with a reset at every posting start (byte-identical to per-group
        # encode_positions), one varbyte pass
        l_o = pos_len[order]
        s_o = pos_start[order]
        p_ends = np.cumsum(l_o)
        tot_pos = int(p_ends[-1]) if n else 0
        gidx = (np.repeat(s_o, l_o)
                + np.arange(tot_pos, dtype=np.int64)
                - np.repeat(p_ends - l_o, l_o))
        flat_p = flat_pos_all[gidx]  # uint32; within-posting ascending
        p_starts = p_ends - l_o
        d_pos = flat_p.copy()
        if tot_pos:
            d_pos[1:] -= flat_p[:-1]
            d_pos[p_starts] = flat_p[p_starts]
        nb_pos = vb_lengths(d_pos)
        pos_stream = vb_encode(d_pos, nb_pos)
        cum_pos = np.zeros(tot_pos + 1, np.int64)
        np.cumsum(nb_pos, out=cum_pos[1:])
        # posting index → position-value index (end sentinel = tot_pos)
        pv_prefix = np.concatenate((p_starts, [tot_pos])).astype(np.int64)

    # --- per-group encode (cache-resident) ----------------------------
    # The streams are encoded GROUP BY GROUP on purpose: salting bounds a
    # group to ~64K postings, so each group's working set lives in L2 and
    # the only DRAM traffic is the input gather and the output bytes. The
    # whole-bucket single-pass variant (byte-identical output) was measured
    # 2-3x SLOWER at 32 concurrent reducers: its ~300 MB of per-pass
    # intermediates stream through the shared memory controller, which is
    # the scarce resource under concurrency — cycles are not.
    schema = bucket_schema(with_pos)
    uq_np = tdenc.dictionary.to_numpy(zero_copy_only=False)
    g_df = (bounds[1:] - bounds[:-1]).astype(np.int64)
    rows: dict[str, list] = {name: [] for name in schema.names}
    key_mask = np.int64((1 << 20) - 1)
    for gi in range(n_groups):
        lo, hi = int(bounds[gi]), int(bounds[gi + 1])
        key = key_s[lo]
        enc = encode_postings_blocks(
            docs_s[lo:hi], tfs_s[lo:hi], dls_s[lo:hi], weights_s[lo:hi],
            block_size=block_size)
        rows["term"].append(uq_np[key >> np.int64(20)])
        rows["seg"].append(int(key & key_mask))
        rows["df"].append(hi - lo)
        rows["cf"].append(int(cf_g[gi]))
        rows["n"].append(enc["n"])
        rows["doc_bytes"].append(enc["doc_bytes"])
        rows["tf_bytes"].append(enc["tf_bytes"])
        rows["dl_bytes"].append(enc["dl_bytes"])
        rows["blk_last"].append(enc["blk_last"])
        rows["blk_max_w"].append(enc["blk_max_w"])
        rows["blk_count"].append(enc["blk_count"])
        rows["blk_off_doc"].append(enc["blk_off_doc"])
        rows["blk_off_tf"].append(enc["blk_off_tf"])
        rows["blk_off_dl"].append(enc["blk_off_dl"])
        if with_pos:
            rows["pos_bytes"].append(
                pos_stream[cum_pos[pv_prefix[lo]]:cum_pos[pv_prefix[hi]]])
    out = pa.table(
        {name: pa.array(rows[name], schema.field(name).type)
         for name in schema.names})
    # deterministic layout: sort rows by (term, seg) for row-group pruning
    out = out.sort_by([("term", "ascending"), ("seg", "ascending")])

    bdir = bucket_dir(index_dir, bucket)
    os.makedirs(bdir, exist_ok=True)
    buf = io.BytesIO()
    pq.write_table(out, buf, row_group_size=4096)
    data = buf.getvalue()
    checksum = hashlib.sha256(data).hexdigest()
    part = os.path.join(bdir, "part.parquet")
    tmp = part + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, part)
    n_postings = int(g_df.sum())
    ok = {
        "bucket": bucket,
        "config_hash": cfg_hash,
        "rows": out.num_rows,
        "terms": pc.count_distinct(out["term"]).as_py(),
        "n_postings": n_postings,
        "bytes": len(data),
        "checksum": checksum,
    }
    atomic_write_json(os.path.join(bdir, OK_NAME), ok)
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "terms": pa.array([ok["terms"]], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
            "bytes": pa.array([len(data)], pa.int64()),
            "checksum": pa.array([checksum], pa.large_string()),
        }
    )


def derive_termstats(index_dir: str, num_buckets: int, heads: list[str],
                     termstats_dir: str,
                     warn_df: int | None = None) -> int:
    """Derive the exact term dictionary from the written bucket files.

    A non-head term lives in exactly ONE bucket with ONE (seg=0) row, so its
    bucket-row df IS its exact df: a column-pruned streaming map over the
    buckets' (term, df) columns — no shuffle, no token scan. Head terms
    (few, listed in the manifest) are the only rows needing a cross-bucket
    sum — merged driver-side from a predicate-pushdown read. Returns the
    dictionary row count. Shared by ``build_index`` and
    ``compact_generations``."""
    import pyarrow.dataset as pa_dataset

    bucket_paths = [
        os.path.join(bucket_dir(index_dir, bkt), "part.parquet")
        for bkt in range(num_buckets)
    ]
    bucket_paths = [p for p in bucket_paths if os.path.exists(p)]
    tmp_dir = termstats_dir + ".tmp"
    for d in (tmp_dir, termstats_dir):
        if os.path.exists(d):
            shutil.rmtree(d)
    head_arr = pa.array(sorted(heads), pa.large_string())

    def _nonhead_stats(t: pa.Table) -> pa.Table:
        keep = (pc.invert(pc.is_in(t["term"], value_set=head_arr))
                if len(head_arr) else None)
        if keep is not None:
            t = t.filter(keep)
        return pa.table({"term": t["term"], "df": t["df"]})

    if bucket_paths:
        (rd.read_parquet(bucket_paths, columns=["term", "df"],
                         override_num_blocks=len(bucket_paths))
         .map_batches(_nonhead_stats, batch_format="pyarrow")
         .write_parquet(tmp_dir))
    os.makedirs(tmp_dir, exist_ok=True)
    if heads and bucket_paths:
        head_rows = pa_dataset.dataset(bucket_paths).to_table(
            columns=["term", "df"],
            filter=pc.field("term").isin(heads))
        import pandas as pd  # noqa: F401 — groupby below

        agg = (head_rows.to_pandas().groupby("term", as_index=False)
               ["df"].sum())
        pq.write_table(
            pa.table({"term": pa.array(agg["term"], pa.large_string()),
                      "df": pa.array(agg["df"], pa.int64())}),
            os.path.join(tmp_dir, "head_terms.parquet"))
    os.replace(tmp_dir, termstats_dir)
    if warn_df is not None and bucket_paths:
        # backstop for the sampled head detection: a true head term missed
        # by the sample stays unsalted (one bucket group carries its full
        # posting list) — correctness holds, but surface the skew loudly
        flt = pc.field("df") >= int(warn_df)
        if heads:
            flt = flt & ~pc.field("term").isin(heads)
        missed = pa_dataset.dataset(termstats_dir).to_table(
            columns=["term", "df"], filter=flt)
        if missed.num_rows:
            worst = sorted(zip(missed["term"].to_pylist(),
                               missed["df"].to_numpy().tolist()),
                           key=lambda kv: -kv[1])[:5]
            logger.warning(
                "derive_termstats: %d non-head term(s) with df >= %d were "
                "NOT salted (sampled head detection missed them; their "
                "postings each sit in one reducer group): %s",
                missed.num_rows, int(warn_df), worst)
    return sum(
        pq.read_metadata(os.path.join(termstats_dir, f)).num_rows
        for f in os.listdir(termstats_dir)
        if f.endswith(".parquet")
    )


# ---------------------------------------------------------------------------
# The build driver
# ---------------------------------------------------------------------------

def _input_tag(paths: list[str]) -> str:
    """Data-version tag: hash of sorted (name, size) — the reference's
    ``data-tag`` bucket-listing equivalent (`Makefile:85-90`)."""
    items = []
    for p in sorted(paths):
        try:
            items.append((os.path.basename(p), os.path.getsize(p)))
        except OSError:
            items.append((os.path.basename(p), -1))
    blob = repr(items).encode()
    return hashlib.sha256(blob).hexdigest()[:12]


def build_index(
    source: str | list[str] | rd.Dataset,
    index_dir: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    fields: dict[str, str] | None = None,
    keyword_fields: dict[str, str] | None = None,
    docvalue_fields: dict[str, str] | None = None,
    num_buckets: int = 32,
    block_size: int = 128,
    salt_shards: int = 8,
    head_min_df: int | None = None,
    head_df_ratio: float = 0.05,
    k1: float = 1.2,
    b: float = 0.75,
    batch_size: int = 2048,
    store_positions: bool = False,
    input_tag: str | None = None,
    resume: bool = True,
) -> Manifest:
    """Build (or resume) an inverted index at ``index_dir``. See module doc.

    ``fields`` / ``keyword_fields`` (field → source column) switch on fielded
    indexing (per-field ``field:term`` postings with per-field length norms —
    the reference's per-field mapping + ``raw`` keyword sub-fields).
    ``docvalue_fields`` (name → source column) are typed columns stored in
    the doc_id-sorted docvalues store for range/geo filters and url
    resolution."""
    assert salt_shards & (salt_shards - 1) == 0, "salt_shards must be a power of 2"
    # Config validation: the checkpoint's core columns and the `field:term`
    # routing scheme are easy to corrupt silently with a colliding name.
    _RESERVED = {"doc_id", "url", "dl", "terms", "tfs", "tdls", "tpos"}
    for name in (docvalue_fields or {}):
        if name in _RESERVED or name.startswith("dl__"):
            raise ValueError(
                f"docvalue_fields name {name!r} collides with a reserved "
                f"checkpoint column ({sorted(_RESERVED)} / 'dl__<field>')")
    overlap = set(fields or {}) & set(keyword_fields or {})
    if overlap:
        raise ValueError(
            f"fields and keyword_fields must be disjoint; both define "
            f"{sorted(overlap)}")
    for name in list(fields or {}) + list(keyword_fields or {}):
        if ":" in name:
            raise ValueError(
                f"field name {name!r} must not contain ':' (it is the "
                "field:term routing separator)")
    if isinstance(source, str):
        paths = [source]
    elif isinstance(source, list):
        paths = source
    else:
        paths = None

    fielded = fields is not None or bool(keyword_fields)
    tag = input_tag or (_input_tag(paths) if paths else "dataset")
    cfg = {
        "analyzer": ANALYZER_VERSION,
        "url_col": url_col,
        "text_col": text_col,
        "fields": sorted((fields or {}).items()) if fielded else None,
        "keyword_fields": sorted((keyword_fields or {}).items()),
        "docvalue_fields": sorted((docvalue_fields or {}).items()),
        "num_buckets": num_buckets,
        "block_size": block_size,
        "salt_shards": salt_shards,
        "store_positions": bool(store_positions),
        "head_min_df": head_min_df,
        "head_df_ratio": head_df_ratio,
        "k1": k1,
        "b": b,
        "input_tag": tag,
    }

    existing = Manifest.load(index_dir) if resume else None
    if existing is not None and existing.compatible_with(cfg):
        man = existing
    else:
        if os.path.exists(index_dir) and not resume:
            shutil.rmtree(index_dir)
        man = Manifest(index_dir, cfg)
    man.save()

    # map_batches parallelism is bounded by BLOCK count, not batch_size: a
    # 16-file input read as 16 blocks runs at most 16 concurrent map tasks.
    # Split reads to ~3 blocks per CPU so every stage can saturate the
    # cluster (cheap: parquet row-group level splits).
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nblocks = max(len(paths) if paths else 1, 3 * ncpu)

    analyzed_dir = os.path.join(index_dir, "analyzed")
    _t0 = time.time()

    def _took() -> float:
        nonlocal _t0
        sec = round(time.time() - _t0, 3)
        _t0 = time.time()
        return sec

    # --- Phase A: analyze + checkpoint -----------------------------------
    passthrough = tuple(sorted((docvalue_fields or {}).items()))
    if not man.phase_done("analyzed"):
        if paths is not None:
            read_cols = {url_col}
            if fielded:
                read_cols |= set((fields or {}).values())
                read_cols |= set((keyword_fields or {}).values())
            else:
                read_cols.add(text_col)
            read_cols |= {c for _, c in passthrough}
            ds = rd.read_parquet(paths, columns=sorted(read_cols),
                                 override_num_blocks=nblocks)
        else:
            ds = source
        analyzed = ds.map_batches(
            _analyze_docs_fn,
            fn_kwargs={
                "url_col": url_col, "text_col": text_col,
                "fields": (tuple(sorted((fields or {}).items()))
                           if fielded else None),
                "keyword_fields": tuple(sorted((keyword_fields or {}).items())),
                "passthrough": passthrough,
                "store_positions": bool(store_positions),
            },
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        tmp_dir = analyzed_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.exists(analyzed_dir):
            shutil.rmtree(analyzed_dir)
        analyzed.write_parquet(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)  # empty dataset writes nothing
        os.replace(tmp_dir, analyzed_dir)
        man.mark_done("analyzed", dir="analyzed", seconds=_took())

    # empty input: no analyzed files → short-circuit every later phase
    if not any(f.endswith(".parquet") for f in os.listdir(analyzed_dir)):
        termstats_dir = os.path.join(index_dir, "termstats")
        os.makedirs(termstats_dir, exist_ok=True)
        if not man.phase_done("termstats"):
            man.mark_done("termstats", dir="termstats", n_terms=0, seconds=_took())
        if not man.phase_done("stats"):
            man.mark_done("stats", n_docs=0, total_dl=0, avgdl=0.0, seconds=_took())
        if not man.phase_done("head_terms"):
            man.mark_done("head_terms", seconds=_took(), min_df=0, terms=[], dfs={})
        if not man.phase_done("postings"):
            man.mark_done("postings", seconds=_took(), buckets={}, n_postings=0, bytes=0)
        if fielded and not man.phase_done("fieldstats"):
            man.mark_done("fieldstats", seconds=_took(), fields={})
        if not man.phase_done("docvalues"):
            os.makedirs(os.path.join(index_dir, "docvalues"), exist_ok=True)
            man.mark_done("docvalues", seconds=_took(), dir="docvalues", rows=0)
        return man

    termstats_dir = os.path.join(index_dir, "termstats")

    # --- Phase C: global doc stats (N from analyzed parquet row counts,
    # total tokens = Σ over the cheap uint32 dl column) --------------------
    if not man.phase_done("stats"):
        n_docs = sum(
            pq.read_metadata(os.path.join(analyzed_dir, f)).num_rows
            for f in os.listdir(analyzed_dir)
            if f.endswith(".parquet")
        )
        if n_docs:
            # distributed map-side reduce over the uint32 dl column — never
            # pull the per-doc column into the driver (at 10^12 docs that
            # column is terabytes); each batch ships ONE partial-sum row
            # (Dataset.sum's Aggregate operator pays an all-to-all it
            # doesn't need for a global scalar — measured 5.6 s fixed cost)
            def _dl_partial(t: pa.Table) -> pa.Table:
                return pa.table(
                    {"s": pa.array([int(pc.sum(t["dl"]).as_py() or 0)],
                                   pa.int64())})

            parts = (rd.read_parquet(analyzed_dir, columns=["dl"],
                                     override_num_blocks=nblocks)
                     .map_batches(_dl_partial, batch_format="pyarrow",
                                  batch_size=batch_size * 4)
                     .to_pandas())  # one int64 row per batch
            total_dl = int(parts["s"].sum())
        else:
            total_dl = 0
        avgdl = (total_dl / n_docs) if n_docs else 0.0
        man.mark_done("stats", n_docs=n_docs, total_dl=total_dl, avgdl=avgdl, seconds=_took())
    stats = man.phase("stats")
    avgdl = float(stats["avgdl"]) or 1.0

    # --- Phase C2 (fielded only): per-field n_docs / avgdl ---------------
    # BM25's length norm and idf are PER FIELD (Lucene per-field norms /
    # docCount); n_f counts docs with a non-empty field, avgdl_f = Σdl_f/n_f.
    avgdl_map: dict[str, float] | None = None
    if fielded:
        if not man.phase_done("fieldstats"):
            all_fields = sorted(set(fields or {}) | set(keyword_fields or {}))
            dl_names = ["dl__" + f for f in all_fields]

            def _field_partial(t: pa.Table) -> pa.Table:
                row: dict[str, list] = {}
                for name in dl_names:
                    v = t[name].to_numpy()
                    row["sum_" + name] = [int(v.sum())]
                    row["cnt_" + name] = [int((v > 0).sum())]
                return pa.table(row)

            pdf = (rd.read_parquet(analyzed_dir, columns=dl_names,
                                   override_num_blocks=nblocks)
                   .map_batches(_field_partial, batch_format="pyarrow",
                                batch_size=batch_size * 4)
                   .to_pandas())  # one tiny row per batch
            fstats = {}
            for f in all_fields:
                s = int(pdf["sum_dl__" + f].sum())
                c = int(pdf["cnt_dl__" + f].sum())
                fstats[f] = {"n_docs": c, "sum_dl": s,
                             "avgdl": (s / c) if c else 0.0}
            man.mark_done("fieldstats", seconds=_took(), fields=fstats)
        avgdl_map = {f: (float(v["avgdl"]) or 1.0)
                     for f, v in man.phase("fieldstats")["fields"].items()}

    # --- Phase B: head-term DETECTION (sampled df pre-pass) ---------------
    # Heads only need detection for shuffle routing, not exact counts: a
    # deterministic ~10% file sample bounds this pre-pass at a tenth of a
    # full token scan, with a 2x threshold margin absorbing sampling noise
    # (an over-detected head is merely salted — harmless; the EXACT term
    # dictionary is derived from the bucket outputs after the postings
    # phase, so no second full-corpus token scan exists anywhere).
    if not man.phase_done("head_terms"):
        min_df = head_min_df
        if min_df is None:
            min_df = max(64, int(stats["n_docs"] * head_df_ratio))
        files = sorted(f for f in os.listdir(analyzed_dir)
                       if f.endswith(".parquet"))
        # hash-picked ~10% sample, NOT a stride: analyzed files are written
        # in input order, and time-ordered corpora make files[::10] a biased
        # sample (a head term bursty in one era could miss every 10th file).
        # The pick hashes the file POSITION salted by the input tag — file
        # NAMES carry a per-run uuid and would break byte-identical resume
        # (sorted order is stable across runs; names are not)
        salt = str(man.doc.get("config", {}).get("input_tag", ""))
        sample = [f for i, f in enumerate(files)
                  if int.from_bytes(hashlib.blake2b(
                      f"{salt}:{i}".encode(), digest_size=4).digest(),
                      "big") % 10 == 0]
        sample = sample or files
        sample_paths = [os.path.join(analyzed_dir, f) for f in sample]
        sample_rows = sum(pq.read_metadata(p).num_rows for p in sample_paths)
        frac = (sample_rows / stats["n_docs"]) if stats["n_docs"] else 1.0
        thresh = max(1, int(min_df * frac * 0.5))
        heads_tbl = (
            rd.read_parquet(sample_paths, columns=["terms"],
                            override_num_blocks=max(len(sample_paths),
                                                    nblocks // 4))
            .map_batches(_df_partials, batch_format="pyarrow",
                         batch_size=batch_size * 4)
            .groupby("term", num_partitions=4)
            .aggregate(Sum("df", alias_name="df"))
            .filter(expr=f"df >= {int(thresh)}")
            .to_pandas()
        )
        if "term" not in heads_tbl.columns:  # empty result loses its schema
            heads_tbl = heads_tbl.reindex(columns=["term", "df"])
        heads = sorted(heads_tbl["term"])
        man.mark_done(
            "head_terms",
            seconds=_took(),
            min_df=int(min_df),
            sample_frac=round(frac, 4),
            sample_threshold=int(thresh),
            terms=heads,
            sample_dfs={t: int(d) for t, d in
                        zip(heads_tbl["term"], heads_tbl["df"])},
        )
    heads = list(man.phase("head_terms")["terms"])

    # --- Phase D: postings (SPIMI → salted shuffle → bucket write) -------
    if not man.phase_done("postings"):
        done = done_buckets(index_dir, num_buckets, man.hash) if resume else {}
        head_ref = ray.put(heads)
        emit_cols = ["doc_id", "dl", "terms", "tfs"] + (["tdls"] if fielded else []) \
            + (["tpos"] if store_positions else [])
        # the map fan-in to a B-partition shuffle tracks the REDUCE width
        # (data partitioning), never the worker count: map_blocks × B is the
        # exchange's object count, and letting map_blocks scale with CPUs
        # gives bigger clusters a strictly more expensive shuffle for the
        # same data — 2×B keeps the physical exchange identical at every
        # cluster size (workers stay busy: blocks queue across the pool)
        emit_blocks = 2 * num_buckets
        emit = rd.read_parquet(
            analyzed_dir, columns=emit_cols,
            override_num_blocks=emit_blocks,
        ).map_batches(
            _emit_partials_fn,
            fn_kwargs={
                "head_ref": head_ref,
                "num_buckets": num_buckets,
                "salt_shards": salt_shards,
                "skip_buckets": tuple(done.keys()),
            },
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        reduce_fn = functools.partial(
            build_bucket,
            index_dir=index_dir,
            cfg_hash=man.hash,
            avgdl=avgdl,
            k1=k1,
            b=b,
            block_size=block_size,
            avgdl_map=avgdl_map,
        )
        manifest_rows = (
            # pin the reduce partition count to the bucket count: the sort
            # shuffle's object count is map_blocks × partitions, and letting
            # partitions default to the (CPU-scaled) block count makes the
            # shuffle MORE expensive on bigger clusters
            emit.groupby("bucket", num_partitions=num_buckets)
            .map_groups(reduce_fn, batch_format="pyarrow")
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
            "postings",
            seconds=_took(),
            buckets={str(k): v for k, v in sorted(buckets.items())},
            n_postings=int(sum(v["n_postings"] for v in buckets.values())),
            bytes=int(sum(v["bytes"] for v in buckets.values())),
        )

    # --- Phase B2: exact term dictionary, DERIVED from the buckets --------
    # A non-head term lives in exactly ONE bucket with ONE (seg=0) row, so
    # its bucket-row df IS its exact df: the dictionary is a column-pruned
    # streaming map over the buckets' (term, df) columns — no shuffle, no
    # second token scan (the old pre-pass re-read every terms list: ~20% of
    # build wall). Head terms (few, listed in the manifest) are the only
    # rows needing a cross-bucket sum — merged driver-side from a
    # predicate-pushdown read.
    if not man.phase_done("termstats"):
        head_min = man.phase("head_terms").get("min_df") or 0
        n_terms = derive_termstats(index_dir, num_buckets, heads,
                                   termstats_dir,
                                   warn_df=(2 * head_min) if head_min else None)
        man.mark_done("termstats", dir="termstats", n_terms=int(n_terms),
                      seconds=_took())

    # --- Phase E: docvalues store (doc_id-sorted url/dl + typed columns) --
    # Replaces per-query scans of the analyzed checkpoint: url resolution is
    # a row-group binary search, range/geo filters a column-pruned scan —
    # the ES doc_values analogue. Sorted output = range-partitioned files,
    # so per-file/row-group doc_id stats prune lookups at 10^12 docs.
    if not man.phase_done("docvalues"):
        dv_dir = os.path.join(index_dir, "docvalues")
        # per-field lengths ride along so a tombstoned doc's exact stats
        # contribution is recoverable in O(deletes) at compaction
        # (multi.tombstone_docs / compact_generations)
        fdl_cols = (["dl__" + f for f in
                     sorted({**(fields or {}), **(keyword_fields or {})})]
                    if fielded else [])
        dv_cols = ["doc_id", "url", "dl"] + fdl_cols + \
            [n for n, _ in passthrough]
        # docvalue rows are tiny (~40 B/doc): a CPU-scaled block count makes
        # the sort exchange SLOWER (measured 0.6 s @8cpu → 1.1 s @32cpu on
        # 400k rows); cap the sort width instead of scaling it with the pool
        dv_blocks = min(nblocks, 16)
        dv = (rd.read_parquet(analyzed_dir, columns=dv_cols,
                              override_num_blocks=dv_blocks)
              .sort("doc_id"))
        tmp_dir = dv_dir + ".tmp"
        for d in (tmp_dir, dv_dir):
            if os.path.exists(d):
                shutil.rmtree(d)
        dv.write_parquet(tmp_dir, row_group_size=8192)
        os.makedirs(tmp_dir, exist_ok=True)
        os.replace(tmp_dir, dv_dir)
        n_rows = sum(
            pq.read_metadata(os.path.join(dv_dir, f)).num_rows
            for f in os.listdir(dv_dir) if f.endswith(".parquet"))
        man.mark_done("docvalues", seconds=_took(), dir="docvalues",
                      rows=int(n_rows))
    return man


def compact_head_segments(index_dir: str) -> int:
    """Hierarchical merge, final level: physically concatenate each head
    term's doc-range segments into a single row under ``head/part.parquet``.

    Optional — the reader already merges segments lazily (ordered concat);
    this pass trades a small job for faster head-term lookups. At 10^12 docs
    a head term's full postings exceed a single row, so this stays a
    small-index optimization; segments are the scale representation."""
    from .reader import IndexReader  # local import to avoid cycle

    man = Manifest.load(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest at {index_dir}")
    store_pos = bool(man.doc["config"].get("store_positions"))
    heads = list(man.phase("head_terms")["terms"])
    if not heads:
        man.mark_done("head_compact", terms=0)
        return 0
    reader = IndexReader(index_dir)
    cfg = man.doc["config"]
    stats = man.phase("stats")
    # fielded indexes: a head term's block-max weight must use ITS field's
    # avgdl, exactly as build_bucket did
    favg = {f: (float(v["avgdl"]) or 1.0)
            for f, v in reader.field_stats.items()}
    schema = bucket_schema(store_pos)
    rows: dict[str, list] = {name: [] for name in schema.names}
    for term in heads:
        if store_pos:
            # the reader's ordered segment concat keeps positions aligned
            # with the merged posting order — re-encode both streams
            docs, tfs, dls, flat_pos, _off = \
                reader.postings_with_positions(term)
        else:
            docs, tfs, dls = reader.postings(term)
        if len(docs) == 0:
            continue
        avgdl_t = favg.get(term.split(":", 1)[0], float(stats["avgdl"]) or 1.0)
        w = bm25_weight(tfs, dls, avgdl_t, cfg["k1"], cfg["b"])
        enc = encode_postings_blocks(docs, tfs, dls, w, block_size=cfg["block_size"])
        rows["term"].append(term)
        rows["seg"].append(-1)
        rows["df"].append(len(docs))
        rows["cf"].append(int(tfs.sum()))
        rows["n"].append(enc["n"])
        for k in ("doc_bytes", "tf_bytes", "dl_bytes", "blk_last", "blk_max_w",
                  "blk_count", "blk_off_doc", "blk_off_tf", "blk_off_dl"):
            rows[k].append(enc[k])
        if store_pos:
            lens = np.minimum(tfs, 255).astype(np.int64)
            rows["pos_bytes"].append(
                encode_positions(flat_pos.astype(np.uint32), lens))
    out = pa.table(
        {name: pa.array(rows[name], schema.field(name).type)
         for name in schema.names}
    ).sort_by([("term", "ascending")])
    hdir = os.path.join(index_dir, "head")
    os.makedirs(hdir, exist_ok=True)
    tmp = os.path.join(hdir, "part.parquet.tmp")
    pq.write_table(out, tmp, row_group_size=4096)
    os.replace(tmp, os.path.join(hdir, "part.parquet"))
    man.mark_done("head_compact", terms=out.num_rows)
    return out.num_rows
