"""Text-analysis stages + multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from deces_dataprep_ray.functions.analysis import tokenize
from deces_dataprep_ray.stages.multimodal import (
    DecodeImage,
    ResizeImage,
    SampleFrames,
    synth_media_table,
)
from deces_dataprep_ray.stages.text import (
    Fingerprint,
    LangId,
    QualityScore,
    TokenCount,
)


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick brown fox is here",
            "le chat est sur la table et il dort",
            "der hund ist nicht zu hause und die katze",
            "",
        ],
    }))


def test_token_count_matches_tokenize():
    out = TokenCount().apply(_docs()).to_pandas().sort_values("doc_id")
    texts = _docs().to_pandas().sort_values("doc_id")["text"]
    assert out["n_tokens"].tolist() == [len(tokenize(t)) for t in texts]


def test_quality_features():
    out = QualityScore().apply(_docs()).to_pandas().sort_values("doc_id")
    assert out["q_n_chars"].iloc[0] == len("the quick brown fox is here")
    assert out["q_n_tokens"].iloc[3] == 0
    assert out["q_stop_ratio"].iloc[3] == 0.0
    assert 0 < out["q_stop_ratio"].iloc[0] <= 1.0


def test_langid_heuristic():
    out = LangId().apply(_docs()).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].iloc[0] == "en"
    assert out["lang_pred"].iloc[1] == "fr"
    assert out["lang_pred"].iloc[2] == "de"
    assert out["lang_pred"].iloc[3] == "und"


def test_fingerprint_deterministic():
    a = Fingerprint().apply(_docs()).to_pandas().sort_values("doc_id")
    b = Fingerprint().apply(_docs()).to_pandas().sort_values("doc_id")
    assert a["fp_md5"].tolist() == b["fp_md5"].tolist()
    assert a["fp_sketch"].tolist() == b["fp_sketch"].tolist()
    assert len(set(a["fp_md5"])) == 4  # all texts distinct


def test_media_decode_plumbing():
    tbl = synth_media_table(12)
    ds = rd.from_arrow(tbl)
    feats = ds.map_batches(DecodeImage, fn_constructor_kwargs={"dim": 16},
                           batch_format="pyarrow", batch_size=4,
                           concurrency=2).to_pandas()
    assert len(feats) == 12
    assert all(len(f) == 16 for f in feats["feature"])
    # deterministic: same payload -> same feature
    feats2 = ds.map_batches(DecodeImage, fn_constructor_kwargs={"dim": 16},
                            batch_format="pyarrow", batch_size=6,
                            concurrency=1).to_pandas()
    f1 = {m: tuple(v) for m, v in zip(feats["media_id"], feats["feature"])}
    f2 = {m: tuple(v) for m, v in zip(feats2["media_id"], feats2["feature"])}
    assert f1 == f2


def test_media_resize_and_frames():
    tbl = synth_media_table(6)
    out = ResizeImage(width=128, height=64)(tbl)
    assert out["width"].to_pylist() == [128] * 6
    assert out["height"].to_pylist() == [64] * 6

    frames = SampleFrames(every_ms=1000, max_frames=4)(tbl)
    assert frames.num_rows >= 6
    assert set(frames.column_names) == {"media_id", "frame_no", "frame"}


def test_media_decode_real_path_raises():
    tbl = synth_media_table(2)
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(tbl)
