"""Fixed-width gzip source — parity with the reference's ``deces_src`` reader.

Reference (`projects/deces-dataprep/datasets/deces_src.yml:5-22`): headerless
fixed-width files, gzip-compressed, latin-1, widths
``[80, 1, 8, 5, 30, 30, 8, 5, 10]`` with nine named columns, selected by a
filename regex over the bucket listing (`Makefile:42`).

Ray-Data-native: ``read_binary_files(include_paths=True)`` → one map task per
file decompresses and slices the byte matrix vectorized (every line is
``sum(widths)`` bytes + newline, so the file reshapes to (rows, width+1)
without per-line Python). Each row carries (source_file, row_offset) lineage —
the explicit replacement for the reference's ``SOURCE``/``SOURCE_LINE``
columns (`recipes/deces_dataprep.yml:16-17`).
"""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa
import ray.data as rd

DECES_WIDTHS = [80, 1, 8, 5, 30, 30, 8, 5, 10]
DECES_NAMES = [
    "NOM_PRENOMS", "SEXE", "DATE_NAISSANCE", "CODE_INSEE_NAISSANCE",
    "COMMUNE_NAISSANCE", "PAYS_NAISSANCE", "DATE_DECES", "CODE_INSEE_DECES",
    "NUM_DECES",
]


def parse_fwf_bytes(
    data: bytes,
    widths: list[int],
    names: list[str],
    encoding: str = "latin-1",
    source: str = "",
) -> pa.Table:
    """Vectorized fixed-width parse of one decompressed file."""
    total = sum(widths)
    if not data:
        cols = {n: pa.array([], pa.string()) for n in names}
        cols["source_file"] = pa.array([], pa.string())
        cols["row_offset"] = pa.array([], pa.int64())
        return pa.table(cols)
    # tolerate a missing trailing newline
    if not data.endswith(b"\n"):
        data += b"\n"
    stride = total + 1
    n = len(data) // stride
    if len(data) % stride:
        raise ValueError(
            f"{source}: byte length {len(data)} not a multiple of row stride "
            f"{stride} (fixed-width {total} + newline)"
        )
    mat = np.frombuffer(data, dtype="S1").reshape(n, stride)
    cols: dict[str, pa.Array] = {}
    off = 0
    for w, name in zip(widths, names):
        view = np.ascontiguousarray(mat[:, off: off + w]).view(f"S{w}")[:, 0]
        # C-speed decode + strip: np.char kernels instead of a per-cell loop
        vals = np.char.rstrip(np.char.decode(view, encoding))
        cols[name] = pa.array(vals, pa.string())
        off += w
    cols["source_file"] = pa.array([source] * n, pa.string())
    cols["row_offset"] = pa.array(np.arange(1, n + 1), pa.int64())
    return pa.table(cols)


def read_fwf_gzip(
    paths: list[str] | str,
    widths: list[int] = DECES_WIDTHS,
    names: list[str] = DECES_NAMES,
    encoding: str = "latin-1",
) -> rd.Dataset:
    """Dataset over gzip fixed-width files (one parse task per file)."""

    def parse(batch: pa.Table) -> pa.Table:
        out = []
        for path, payload in zip(batch["path"].to_pylist(),
                                 batch["bytes"].to_pylist()):
            # Ray/Arrow auto-decompresses .gz at read; handle raw gzip too
            # (e.g. files without the extension) by sniffing the magic bytes
            raw = gzip.decompress(payload) if payload[:2] == b"\x1f\x8b" else payload
            out.append(parse_fwf_bytes(raw, widths, names, encoding, path))
        return pa.concat_tables(out) if out else parse_fwf_bytes(
            b"", widths, names, encoding, "")

    return rd.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )
