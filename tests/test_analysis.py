"""Analyzer conformance (FIXTURES.md F3): the norm chain, golden-locked."""

import json
import os

from deces_dataprep_ray.functions.analysis import (
    fold_many,
    normalize_keyword,
    tokenize,
    tokenize_many,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "analyzer.jsonl")


def test_golden_fixtures():
    with open(GOLDEN) as f:
        for line in f:
            case = json.loads(line)
            assert tokenize(case["input"]) == case["tokens"], case["input"]


def test_batch_matches_scalar():
    with open(GOLDEN) as f:
        inputs = [json.loads(line)["input"] for line in f]
    assert tokenize_many(inputs) == [tokenize(s) for s in inputs]


def test_keyword_normalizer():
    assert normalize_keyword("  Sèvres (92) ") == "sevres 92"
    assert normalize_keyword("ŒUVRE") == "oeuvre"
    assert normalize_keyword("!!!") == ""


def test_fold_many_handles_separator_injection():
    # a rogue record separator in input must not merge/split records
    out = fold_many(["a\x1eb", "c"])
    assert len(out) == 2
    assert out[0] == "a b"


def test_nulls_and_empties():
    assert tokenize("") == []
    assert fold_many(["", None, "x"]) == ["", "", "x"]


def test_mixed_scripts_kept():
    # non-latin scripts survive folding (not dropped by an ascii round-trip)
    toks = tokenize("北京 hello café")
    assert "hello" in toks and "cafe" in toks
    assert any("北" in t for t in toks)
