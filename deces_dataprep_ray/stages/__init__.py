"""Typed dataprep stages — the reference's recipe DSL re-owned as Python.

The reference's extension surface is YAML: 7 step types interpreted by the
matchID backend over pandas chunks (SURVEY.md §2.1; semantics fixed by
`projects/deces-dataprep/recipes/deces_dataprep.yml`). Here each step type is
a typed Stage object applied to a ``ray.data.Dataset`` as a vectorized
``map_batches`` transform — no string ``exec`` eval, no per-row Python in hot
paths:

| reference step | stage                  | implementation |
|----------------|------------------------|----------------|
| ``normalize``  | :class:`Normalize`     | utf8 trim + whitespace collapse (pyarrow.compute) |
| ``exec``       | :class:`Exec`          | a named, typed batch function |
| ``replace``    | :class:`RegexReplace`  | ordered pc.replace_substring_regex cascade (RE2, \\1 backrefs) |
| ``map``        | :class:`MapColumns`    | zero-copy column alias/copy |
| ``join``       | :class:`BroadcastJoin` | broadcast small side via ray.put, arrow hash join per batch |
| (join+drop)    | anti=True              | left-anti semantics (`recipes/deces_dataprep.yml:37-52`) |
| ``parsedate``  | :class:`ParseDate`     | pc.strptime(error_is_null=True) |
| ``delete``     | :class:`DeleteColumns` | drop by column-name regex |

Column selectors are regexes over column names, like the reference's
``select:`` blocks. A :class:`Pipeline` is an ordered list of stages —
the recipe analogue.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


class Stage:
    """Base: a dataset → dataset transform with a vectorized batch body."""

    batch_format = "pyarrow"

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(self, batch_format=self.batch_format)

    def __call__(self, batch):  # pragma: no cover - abstract
        raise NotImplementedError


def _select_cols(batch: pa.Table, pattern: str) -> list[str]:
    rx = re.compile(pattern)
    return [c for c in batch.column_names if rx.fullmatch(c)]


def _set_col(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(name), name, arr)
    return batch.append_column(name, arr)


@dataclass
class Normalize(Stage):
    """Whitespace/unicode normalization of selected columns
    (`recipes/deces_dataprep.yml:10-11`): trim + collapse internal runs."""

    select: str

    def __call__(self, batch: pa.Table) -> pa.Table:
        for c in _select_cols(batch, self.select):
            arr = pc.utf8_trim_whitespace(batch[c])
            arr = pc.replace_substring_regex(arr, r"\s+", " ")
            batch = _set_col(batch, c, arr)
        return batch


@dataclass
class RegexReplace(Stage):
    """Ordered regex → replacement cascade on selected columns
    (`recipes/deces_dataprep.yml:18-22,80-94`: order matters). Patterns are
    RE2; backreferences ``\\1``–``\\9`` are supported in replacements."""

    select: str
    rules: list[tuple[str, str]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        for c in _select_cols(batch, self.select):
            arr = batch[c]
            for pat, repl in self.rules:
                # RE2 rewrites take \1..\9 only; accept Python's \g<N> too
                repl = re.sub(r"\\g<(\d)>", r"\\\1", repl)
                arr = pc.replace_substring_regex(arr, pat, repl)
            batch = _set_col(batch, c, arr)
        return batch


@dataclass
class MapColumns(Stage):
    """Column copy/alias: NEW := OLD (`recipes/deces_dataprep.yml:32-35`).
    Zero-copy — appends references to existing Arrow columns."""

    mapping: dict[str, str]

    def __call__(self, batch: pa.Table) -> pa.Table:
        for new, old in self.mapping.items():
            batch = _set_col(batch, new, batch[old])
        return batch


@dataclass
class DeleteColumns(Stage):
    """Drop columns matching a regex (`recipes/deces_dataprep.yml:66-67`)."""

    select: str

    def __call__(self, batch: pa.Table) -> pa.Table:
        drop = _select_cols(batch, self.select)
        return batch.drop_columns(drop) if drop else batch


@dataclass
class ParseDate(Stage):
    """Parse string columns to timestamps; unparseable → null
    (`recipes/deces_dataprep.yml:95-97`)."""

    select: str
    format: str = "%Y%m%d"
    unit: str = "us"

    def __call__(self, batch: pa.Table) -> pa.Table:
        for c in _select_cols(batch, self.select):
            arr = pc.strptime(batch[c], format=self.format, unit=self.unit,
                              error_is_null=True)
            batch = _set_col(batch, c, arr)
        return batch


@dataclass
class Exec(Stage):
    """A named, typed batch transform — replaces the reference's arbitrary
    YAML-embedded ``exec:`` pandas statements (`recipes/deces_dataprep.yml:12-17`)
    with a real function (no string eval)."""

    fn: Callable[[pa.Table], pa.Table]
    name: str = "exec"
    batch_format: str = "pyarrow"

    def __call__(self, batch):
        return self.fn(batch)


@dataclass
class Filter(Stage):
    """Vectorized row filter: fn(batch) → boolean mask array."""

    predicate: Callable[[pa.Table], pa.Array]

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.filter(self.predicate(batch))


class BroadcastJoin(Stage):
    """In-memory broadcast left join — the reference's ``type: in_memory``
    join (`recipes/deces_dataprep.yml:37-45,135-141`): the small side is
    ``ray.put`` once on the driver and hash-joined per batch inside the
    workers (arrow join kernel). Never a shuffle.

    ``on``: {left_col: right_col}; ``select``: {new_left_col: right_col}
    projects right columns in. ``anti=True`` keeps only left rows with NO
    match (the oppositions anti-join, `recipes/deces_dataprep.yml:37-52`).
    """

    batch_format = "pyarrow"

    def __init__(
        self,
        right: pa.Table,
        on: dict[str, str],
        select: dict[str, str] | None = None,
        anti: bool = False,
    ):
        self.on = on
        self.select = select or {}
        self.anti = anti
        sel_cols = list(dict.fromkeys(list(on.values()) + list(self.select.values())))
        right = right.select(sel_cols)
        # pre-rename right cols to avoid collisions: __r_<col>
        right = right.rename_columns([f"__r_{c}" for c in right.column_names])
        self._right_ref = ray.put(right)
        self._right_local: pa.Table | None = None

    def _right(self) -> pa.Table:
        if self._right_local is None:
            self._right_local = ray.get(self._right_ref)
        return self._right_local

    def __call__(self, batch: pa.Table) -> pa.Table:
        right = self._right()
        right_keys = [f"__r_{c}" for c in self.on.values()]
        left_keys = list(self.on.keys())
        # an all-null column degrades to Arrow `null` type (e.g. a previous
        # lookup with zero matches); acero rejects null-typed non-key fields
        for i, f in enumerate(batch.schema):
            if pa.types.is_null(f.type):
                batch = batch.set_column(
                    i, f.name, batch[f.name].cast(pa.string()))
        if self.anti:
            return batch.join(
                right, keys=left_keys, right_keys=right_keys,
                join_type="left anti",
            )
        joined = batch.join(
            right, keys=left_keys, right_keys=right_keys,
            join_type="left outer",
        )
        out_names = []
        keep = []
        inv_select = {f"__r_{rc}": new for new, rc in self.select.items()}
        for name in joined.column_names:
            if name.startswith("__r_"):
                if name in inv_select:
                    keep.append(name)
                    out_names.append(inv_select[name])
            else:
                keep.append(name)
                out_names.append(name)
        return joined.select(keep).rename_columns(out_names)


@dataclass
class Pipeline:
    """An ordered stage list — the recipe analogue
    (`recipes/deces_dataprep.yml` is one 42-step instance)."""

    stages: list[Stage] = field(default_factory=list)

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        for s in self.stages:
            ds = s.apply(ds)
        return ds
