"""Index aliases: atomic name → index-directory indirection.

The reference deploys blue/green: a new index is built/restored alongside
the live one and traffic cuts over atomically (ES alias swap; the
reference's `Makefile:206-220` snapshot-restore flow ends the same way).
Here an alias is a JSON pointer file updated with the classic
write-tmp + ``os.replace`` atomic rename — a reader opening the alias
mid-swap sees either the old or the new target, never a torn state.

Readers resolve aliases transparently: ``resolve_alias`` follows pointer
files (chains allowed, cycle-guarded) and returns a concrete index
directory for ``IndexReader`` / ``MultiReader``. Serving processes that
hold an open reader keep serving the OLD generation until they re-resolve
— exactly ES's searcher-refresh semantics."""

from __future__ import annotations

import json
import os
import time

ALIAS_SUFFIX = ".alias.json"


def _alias_path(aliases_dir: str, name: str) -> str:
    if os.sep in name or name.startswith("."):
        raise ValueError(f"invalid alias name {name!r}")
    return os.path.join(aliases_dir, name + ALIAS_SUFFIX)


def set_alias(aliases_dir: str, name: str, index_dir: str) -> None:
    """Point ``name`` at ``index_dir`` (atomic replace; creates or moves).
    The target must exist and carry an index manifest or another alias —
    a typo'd swap must fail loudly, not blackhole traffic."""
    os.makedirs(aliases_dir, exist_ok=True)
    target_ok = (
        os.path.exists(os.path.join(index_dir, "manifest.json"))
        or os.path.exists(index_dir + ALIAS_SUFFIX)
        or is_alias(index_dir)
    )
    if not target_ok:
        raise FileNotFoundError(
            f"alias target {index_dir!r} has no index manifest")
    path = _alias_path(aliases_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"target": os.path.abspath(index_dir),
                   "updated_at": time.time()}, f)
    os.replace(tmp, path)


def delete_alias(aliases_dir: str, name: str) -> bool:
    """Remove ``name``; True if it existed."""
    path = _alias_path(aliases_dir, name)
    try:
        os.remove(path)
        return True
    except FileNotFoundError:
        return False


def list_aliases(aliases_dir: str) -> dict[str, str]:
    """{name: target} for every alias in the directory."""
    if not os.path.isdir(aliases_dir):
        return {}
    out: dict[str, str] = {}
    for f in sorted(os.listdir(aliases_dir)):
        if f.endswith(ALIAS_SUFFIX):
            with open(os.path.join(aliases_dir, f), encoding="utf-8") as fh:
                out[f[: -len(ALIAS_SUFFIX)]] = json.load(fh)["target"]
    return out


def is_alias(path: str) -> bool:
    return os.path.isfile(path) and path.endswith(ALIAS_SUFFIX)


def resolve_alias(path: str, max_hops: int = 8) -> str:
    """Follow alias pointer files to a concrete index directory. Accepts a
    plain index dir (returned unchanged), an alias FILE path, or an
    ``aliases_dir/name`` pair spelled as ``.../name`` with the suffix
    elided. Chains are allowed; cycles/overlong chains raise."""
    seen: set[str] = set()
    for _ in range(max_hops):
        if os.path.isdir(path):
            return path
        cand = path if is_alias(path) else path + ALIAS_SUFFIX
        if not os.path.isfile(cand):
            raise FileNotFoundError(f"no index dir or alias at {path!r}")
        real = os.path.realpath(cand)
        if real in seen:
            raise RuntimeError(f"alias cycle through {cand!r}")
        seen.add(real)
        with open(cand, encoding="utf-8") as f:
            path = json.load(f)["target"]
    raise RuntimeError(f"alias chain longer than {max_hops} hops")
