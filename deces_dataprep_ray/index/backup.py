"""Index backup push / pull / verify — the snapshot distribution path.

The reference distributes its index as an ES snapshot pushed to object
storage and restored on serving nodes (`Makefile:225-254`:
``backup-push`` / ``backup-pull`` / ``elasticsearch-restore``). This index
is already relocatable (parquet + json — copy == restore, tested); what was
missing is the tooling: an integrity-verified push/pull with a signed
inventory, so a serving node can trust a pulled index without rebuilding.

- :func:`push_index` — copy the index to a destination (atomic: tmp +
  rename) and write ``BACKUP.json`` (per-file size + sha256).
- :func:`pull_index` — copy a backup into place, then :func:`verify_index`.
- :func:`verify_index` — recheck every file against ``BACKUP.json`` if
  present, and every bucket's ``part.parquet`` against its ``_OK.json``
  checksum (written at build time); returns a report dict.

A real deployment points ``dest`` at a mounted object store; the protocol
(inventory + checksums + atomic rename) is storage-agnostic.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from ..state.manifest import OK_NAME, Manifest

BACKUP_NAME = "BACKUP.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if n == BACKUP_NAME or n.endswith(".tmp"):
                continue
            out.append(os.path.relpath(os.path.join(dirpath, n), root))
    return sorted(out)


def push_index(index_dir: str, dest: str) -> dict:
    """Copy ``index_dir`` to ``dest`` with an integrity inventory. Atomic:
    the destination appears only after every file + BACKUP.json landed."""
    if Manifest.load(index_dir) is None:
        raise FileNotFoundError(f"no index manifest at {index_dir}")
    inventory = {}
    for rel in _walk_files(index_dir):
        p = os.path.join(index_dir, rel)
        inventory[rel] = {"bytes": os.path.getsize(p), "sha256": _sha256(p)}
    tmp = dest + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(index_dir, tmp,
                    ignore=shutil.ignore_patterns("*.tmp", BACKUP_NAME))
    doc = {"files": inventory, "n_files": len(inventory),
           "bytes": sum(v["bytes"] for v in inventory.values())}
    with open(os.path.join(tmp, BACKUP_NAME), "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.replace(tmp, dest)
    return doc


def pull_index(src: str, index_dir: str) -> dict:
    """Restore a pushed backup into ``index_dir``.

    The copy is verified IN THE STAGING DIRECTORY before anything replaces
    ``index_dir`` — restoring a corrupt backup must never destroy a healthy
    serving index (the tmp copy is removed, the original left untouched)."""
    if not os.path.exists(os.path.join(src, BACKUP_NAME)):
        raise FileNotFoundError(f"{src} is not a pushed backup "
                                f"(missing {BACKUP_NAME})")
    tmp = index_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    report = verify_index(tmp)
    if not report["ok"]:
        shutil.rmtree(tmp)
        raise RuntimeError(f"pulled index failed verification "
                           f"(existing index untouched): {report}")
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.replace(tmp, index_dir)
    return report


def verify_index(index_dir: str) -> dict:
    """Integrity report: BACKUP.json inventory (if present) + every bucket
    ``_OK.json`` checksum recheck + manifest presence."""
    errors: list[str] = []
    man = Manifest.load(index_dir)
    if man is None:
        errors.append("missing manifest")
    bpath = os.path.join(index_dir, BACKUP_NAME)
    n_checked = 0
    if os.path.exists(bpath):
        with open(bpath) as f:
            doc = json.load(f)
        for rel, want in sorted(doc["files"].items()):
            p = os.path.join(index_dir, rel)
            if not os.path.exists(p):
                errors.append(f"missing file {rel}")
            elif os.path.getsize(p) != want["bytes"]:
                errors.append(f"size mismatch {rel}")
            elif _sha256(p) != want["sha256"]:
                errors.append(f"checksum mismatch {rel}")
            n_checked += 1
    # bucket sidecars carry build-time checksums — recheck them regardless
    postings = os.path.join(index_dir, "postings")
    names = sorted(os.listdir(postings)) if os.path.isdir(postings) else []
    for name in names:
        bdir = os.path.join(postings, name)
        ok_path = os.path.join(bdir, OK_NAME)
        if not (name.startswith("bucket=") and os.path.exists(ok_path)):
            continue
        with open(ok_path) as f:
            ok = json.load(f)
        part = os.path.join(bdir, "part.parquet")
        if not os.path.exists(part):
            errors.append(f"{name}: missing part.parquet")
        elif _sha256(part) != ok["checksum"]:
            errors.append(f"{name}: bucket checksum mismatch")
        n_checked += 1
    return {"ok": not errors, "checked": n_checked, "errors": errors}
