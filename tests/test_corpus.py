"""Corpus determinism + the per-url byte-identical extraction invariant."""

import numpy as np

from deces_dataprep_ray.corpus import (
    ExtractText,
    extract_text,
    generate_rows,
    rows_to_table,
)


def test_generation_independent_of_batching():
    whole = generate_rows(np.arange(0, 120))
    parts = generate_rows(np.arange(0, 40)), generate_rows(np.arange(40, 120))
    assert whole["text"] == parts[0]["text"] + parts[1]["text"]
    assert whole["url"] == parts[0]["url"] + parts[1]["url"]
    assert whole["html"] == parts[0]["html"] + parts[1]["html"]


def test_extraction_byte_identical_per_url():
    rows = generate_rows(np.arange(0, 200))
    for h, t in zip(rows["html"], rows["text"]):
        assert extract_text(h) == t


def test_extract_stage_drops_html():
    tbl = rows_to_table(generate_rows(np.arange(0, 20)))
    out = ExtractText()(tbl)
    assert "html" not in out.column_names
    assert out["text"].to_pylist() == tbl["text"].to_pylist()


def test_entities_roundtrip():
    html = b"<html><body><p>caf&eacute; cr&egrave;me</p></body></html>"
    assert extract_text(html) == "café crème"


def test_nested_tags_and_whitespace():
    html = b"<html><body><p>a <b>bold</b>\n\n  move</p><p>two</p></body></html>"
    assert extract_text(html) == "a bold move two"
