"""CSV source/sink parity with the reference's csv datasets.

- ``oppositions_rgpd`` reader: gzip CSV, utf-8, ``;``-separated
  (`datasets/oppositions_rgpd.yml:5-10`)
- ``deces_csv`` writer: single gzip CSV with ``;`` separator — the alternate
  prep output consumed by sibling projects (`datasets/deces_csv.yml:2-7`).
  Here the writer emits a DIRECTORY of gzip csv parts (resumable,
  parallel) — a single giant file is an anti-pattern at scale; pass
  ``single_file=True`` only for small exports needing byte-level parity.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import pyarrow.csv as pa_csv
import ray.data as rd


def read_csv_semicolon(
    paths: list[str] | str,
    encoding: str = "utf-8",
    gzip_compressed: bool | None = None,
) -> rd.Dataset:
    """Reader for ;-separated (optionally gzip) CSV — the oppositions shape.
    Compression is inferred from the ``.gz`` extension unless forced."""
    if gzip_compressed is None:
        first = paths if isinstance(paths, str) else paths[0]
        gzip_compressed = str(first).endswith(".gz")
    kwargs = {}
    if gzip_compressed:
        kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
    return rd.read_csv(
        paths,
        parse_options=pa_csv.ParseOptions(delimiter=";"),
        read_options=pa_csv.ReadOptions(encoding=encoding),
        **kwargs,
    )


def write_csv_semicolon(
    ds: rd.Dataset, out_dir: str, single_file: bool = False
) -> str:
    """Writer for the deces_csv shape: ';'-separated, utf-8, gzip."""
    if not single_file:
        from ray.data.datasource import FilenameProvider

        class _GzNames(FilenameProvider):
            def get_filename_for_block(self, block, write_uuid, task_index,
                                       block_index) -> str:
                return f"part-{task_index:05d}-{block_index:05d}.csv.gz"

        ds.write_csv(
            out_dir,
            arrow_csv_args_fn=lambda: {
                "write_options": pa_csv.WriteOptions(delimiter=";")
            },
            arrow_open_stream_args={"compression": "gzip"},
            filename_provider=_GzNames(),
        )
        return out_dir
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    tmp = out_dir + ".tmp"
    first = True
    with gzip.open(tmp, "wb") as f:
        for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            opts = pa_csv.WriteOptions(delimiter=";", include_header=first)
            buf = pa.BufferOutputStream()
            pa_csv.write_csv(batch, buf, opts)
            f.write(buf.getvalue().to_pybytes())
            first = False
    os.replace(tmp, out_dir)
    return out_dir
