"""Checkpoint manifest: per-partition lineage + metrics, resume support.

Replaces the reference's coarse idempotence machinery — the
``esdata_${DATAPREP_VERSION}_${data-tag}`` snapshot naming and ``full-check``
skip logic (`Makefile:3`, `Makefile:85-90`, `Makefile:177-181`) — with
fine-grained, per-partition checkpoints:

- ``config_hash`` plays the role of ``DATAPREP_VERSION`` (sha1 of the recipe
  files): any change to analyzer/codec/BM25/partitioning parameters produces a
  new hash, and a resume against a mismatched hash refuses to reuse partials.
- Each postings bucket writes its output atomically (tmp + rename) together
  with a ``_OK.json`` sidecar carrying rows / bytes / checksum / lineage. The
  sidecars are the source of truth for resume: a bucket with a valid sidecar
  is skipped on rerun even if the driver died before updating the manifest.
- ``manifest.json`` aggregates phase status, global stats and the bucket table
  so a finished index is self-describing and relocatable (the reference's
  restore path, `Makefile:206-220`, is "copy the directory" here).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

MANIFEST_NAME = "manifest.json"
OK_NAME = "_OK.json"


def config_hash(cfg: dict) -> str:
    blob = json.dumps(cfg, sort_keys=True, default=str).encode("utf-8")
    return hashlib.sha256(blob).hexdigest()[:16]


def atomic_write_json(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True, default=str)
    os.replace(tmp, path)


def read_json(path: str) -> Any | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class Manifest:
    def __init__(self, index_dir: str, cfg: dict):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, MANIFEST_NAME)
        self.cfg = cfg
        self.hash = config_hash(cfg)
        self.doc: dict = {
            "version": 1,
            "config": cfg,
            "config_hash": self.hash,
            "phases": {},
        }

    @classmethod
    def load(cls, index_dir: str) -> "Manifest | None":
        doc = read_json(os.path.join(index_dir, MANIFEST_NAME))
        if doc is None:
            return None
        m = cls(index_dir, doc["config"])
        m.doc = doc
        m.hash = doc["config_hash"]
        return m

    def compatible_with(self, cfg: dict) -> bool:
        return self.hash == config_hash(cfg)

    def phase(self, name: str) -> dict:
        return self.doc["phases"].setdefault(name, {"status": "pending"})

    def phase_done(self, name: str) -> bool:
        return self.doc["phases"].get(name, {}).get("status") == "done"

    def mark_done(self, name: str, **info: Any) -> None:
        self.doc["phases"][name] = {"status": "done", **info}
        self.save()

    def save(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        atomic_write_json(self.path, self.doc)


def bucket_dir(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, "postings", f"bucket={bucket:05d}")


def bucket_ok(index_dir: str, bucket: int, expected_hash: str) -> dict | None:
    """Return the bucket's sidecar if it exists and matches the config hash."""
    ok = read_json(os.path.join(bucket_dir(index_dir, bucket), OK_NAME))
    if ok is None or ok.get("config_hash") != expected_hash:
        return None
    part = os.path.join(bucket_dir(index_dir, bucket), "part.parquet")
    if not os.path.exists(part):
        return None
    if ok.get("bytes") != os.path.getsize(part):
        return None
    return ok


def done_buckets(index_dir: str, num_buckets: int, expected_hash: str) -> dict[int, dict]:
    out = {}
    for b in range(num_buckets):
        ok = bucket_ok(index_dir, b, expected_hash)
        if ok is not None:
            out[b] = ok
    return out
