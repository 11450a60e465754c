"""CSV source/sink parity (oppositions reader, deces_csv writer shapes)."""

import glob
import gzip
import os

import ray.data as rd

from deces_dataprep_ray.sources.csv import read_csv_semicolon, write_csv_semicolon


def test_parts_roundtrip(tmp_path):
    ds = rd.read_parquet("/root/testdata/sf0.001/nation.parquet")
    out = write_csv_semicolon(ds, str(tmp_path / "parts"))
    files = sorted(glob.glob(os.path.join(out, "*.csv.gz")))
    assert files
    back = read_csv_semicolon(files).to_pandas().sort_values("n_nationkey")
    orig = ds.to_pandas().sort_values("n_nationkey")
    assert back["n_name"].tolist() == orig["n_name"].tolist()


def test_single_file_roundtrip(tmp_path):
    ds = rd.read_parquet("/root/testdata/sf0.001/region.parquet")
    single = write_csv_semicolon(ds, str(tmp_path / "region.csv.gz"),
                                 single_file=True)
    with gzip.open(single, "rt") as f:
        header = f.readline().strip()
    assert header == '"r_regionkey";"r_name"'
    back = read_csv_semicolon([single]).to_pandas()
    assert len(back) == 5


def test_plain_uncompressed(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a;b\n1;x\n2;y\n")
    df = read_csv_semicolon([str(p)]).to_pandas()
    assert df["a"].tolist() == [1, 2]
