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


def test_vectorized_extraction_byte_identical_to_oracle():
    """The hot path (extract_text_vectorized) must equal the frozen scalar
    oracle byte-for-byte — adversarial structures, the full Python-\\s
    whitespace battery, entities with/without semicolons, sentinel-byte
    collisions, and the fixture corpus."""
    import re

    import numpy as np
    import pyarrow as pa

    from deces_dataprep_ray.corpus import (
        extract_text,
        extract_text_vectorized,
        generate_rows,
    )

    ws_chars = [chr(c) for c in range(0x11000) if re.match(r"\s", chr(c))]
    cases = [
        b"<html><p>hello world</p></html>", b"<p>a</p>x<p>b</p>",
        b"<p>a<p>b</p>", b"no blocks here", b"<p>unclosed",
        b"x</p>y<p>a</p>z",
        b"<p>&amp;lt; &eacute; &egrave &nbsp; &unknown; &#233; &#x21;</p>",
        b"<p>a&ampb</p>", b"<p>tabs\tand\nnews\r\nlines  </p>",
        b"<p>unicode\xe2\x80\x83space</p>", b"<p>nbsp\xc2\xa0inside</p>",
        b"<p><b>bold</b> <i>it</i></p><!-- c -->", b"<p></p>", b"",
        b"<p>only close later</p><p>unclosed tail", b"<p>a</p>x</p>",
        b"<p>a</p>x</p>y<p>b</p>", b"<p>x<p>y", b"<p>a</p><p>b",
        b"<p>z</p>" * 50, "<p>café crème łódź</p>".encode(),
        b"  <p> lead trail </p>  ", b"\x01sentinel<p>in doc</p>\x02",
        b"<p>has \x01 inside</p>",
        ("<p>allws:" + "".join(ws_chars) + "x</p>").encode(),
        ("<p>a" + "".join(f"{c}b{c}" for c in ws_chars[:8]) + "</p>").encode(),
    ]
    out = extract_text_vectorized(pa.array(cases, pa.binary()))
    for c, got in zip(cases, out.to_pylist()):
        assert got == extract_text(c), c[:60]

    # invalid utf-8 → None, callers fall back to the scalar oracle
    bad = pa.array([b"<p>ok</p>", b"<p>\xff\xfe</p>"], pa.binary())
    assert extract_text_vectorized(bad) is None

    rows = generate_rows(np.arange(3000))
    vec = extract_text_vectorized(pa.array(rows["html"], pa.binary()))
    assert vec.to_pylist() == [extract_text(h) for h in rows["html"]]
    assert vec.to_pylist() == rows["text"]
