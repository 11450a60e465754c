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


def test_ppm_roundtrip_and_bmp_decode():
    from deces_dataprep_ray.stages.multimodal import (
        decode_bmp,
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.int64).astype(np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # comments + whitespace in header
    p = b"P6\n# a comment\n7   5\n255\n" + img.tobytes()
    assert (decode_ppm(p) == img).all()

    # hand-built 24-bit BMP (bottom-up, padded rows)
    import struct
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        bgr = img[y][:, ::-1].tobytes()
        rows.append(bgr + b"\x00" * (stride - len(bgr)))
    pix = b"".join(rows)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                            2835, 2835, 0, 0))
    assert (decode_bmp(header + pix) == img).all()


def test_wav_decode_and_audio_stage():
    from deces_dataprep_ray.stages.multimodal import DecodeAudio, decode_wav

    tbl = synth_media_table(12)
    audio = tbl.filter(pa.compute.equal(tbl["kind"], "audio"))
    x, rate = decode_wav(audio["payload"][0].as_py())
    # first audio row is media_id 1 → 2-second clip
    assert rate == 8000 and len(x) == 16000
    # pure sine at amplitude .5: rms ~ .354
    assert abs(float(np.sqrt(np.mean(x ** 2))) - 0.3536) < 0.01

    out = DecodeAudio(dim=8)(audio)
    assert out.num_rows == audio.num_rows
    assert all(abs(r - 0.3536) < 0.01 for r in out["rms"].to_pylist())
    assert all(len(e) == 8 for e in out["envelope"].to_pylist())


def test_raw_video_frame_sampling_exact():
    from deces_dataprep_ray.stages.multimodal import (
        decode_ppm,
        decode_raw_video,
        encode_raw_video,
    )

    rng = np.random.default_rng(3)
    vid = rng.integers(0, 256, (25, 6, 8, 3), dtype=np.int64).astype(np.uint8)
    payload = encode_raw_video(vid, fps=10)
    back, fps = decode_raw_video(payload)
    assert fps == 10 and (back == vid).all()

    tbl = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([payload], pa.large_binary()),
        "mime": pa.array(["video/x-raw"], pa.string()),
        "width": pa.array([8], pa.int32()),
        "height": pa.array([6], pa.int32()),
        "duration_ms": pa.array([2500], pa.int32()),
    })
    frames = SampleFrames(every_ms=1000, max_frames=4)(tbl)
    # fps 10 x 1000ms -> every 10th frame: indices 0, 10, 20
    assert frames.num_rows == 3
    got = decode_ppm(frames["frame"][1].as_py())
    assert (got == vid[10]).all()


def test_resize_real_image():
    from deces_dataprep_ray.stages.multimodal import decode_ppm

    tbl = synth_media_table(3)
    img_rows = tbl.filter(pa.compute.equal(tbl["kind"], "image"))
    out = ResizeImage(width=10, height=6, fake=False)  # no compressed rows
    res = out(img_rows)
    img = decode_ppm(res["payload"][0].as_py())
    assert img.shape == (6, 10, 3)


def test_real_image_features_from_pixels():
    # PPM decode path: feature equals the grayscale thumbnail, not a hash
    from deces_dataprep_ray.stages.multimodal import (
        _image_features,
        decode_ppm,
    )

    tbl = synth_media_table(3)
    img_rows = tbl.filter(pa.compute.equal(tbl["kind"], "image"))
    out = DecodeImage(dim=16)(img_rows)
    want = _image_features(decode_ppm(img_rows["payload"][0].as_py()), 16)
    assert np.allclose(np.asarray(out["feature"][0].as_py()), want)


def test_repetition_stats():
    """Vectorized repetition signals == naive per-doc recomputation."""
    from collections import Counter

    from deces_dataprep_ray.stages.text import RepetitionStats

    texts = [
        "a b c d e",                    # all unique
        "a a a b",                      # heavy unigram repetition
        "x y x y x y",                  # bigram repetition
        "w",                            # single token (no bigrams)
        "",                             # empty
        "dog cat dog cat dog bird",
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = RepetitionStats()(batch)
    for i, t in enumerate(texts):
        ts = tokenize(t)
        n = len(ts)
        uni = Counter(ts)
        bigr = Counter(zip(ts, ts[1:]))
        top1 = max(uni.values()) / n if n else 0.0
        dupf = sum(c for c in uni.values() if c > 1) / n if n else 0.0
        top2 = (max(bigr.values()) / (n - 1)) if n >= 2 else 0.0
        assert out["top_unigram_frac"][i].as_py() == pytest.approx(top1), t
        assert out["dup_word_frac"][i].as_py() == pytest.approx(dupf), t
        assert out["top_bigram_frac"][i].as_py() == pytest.approx(top2), t


def test_punct_re2_matches_python_class():
    """_PUNCT_RE2 (Arrow/RE2) must classify every BMP char exactly like the
    Python [^\\w\\s] class the scalar implementation used (RE2's \\w/\\s are
    ASCII-only — the spelled-out Unicode classes are the contract)."""
    import pyarrow.compute as pc

    from deces_dataprep_ray.stages.text import _PUNCT_RE, _PUNCT_RE2

    chars = [chr(c) for c in range(32, 0x3000)]
    got = pc.count_substring_regex(pa.array(chars), _PUNCT_RE2).to_pylist()
    want = [1 if _PUNCT_RE.match(ch) else 0 for ch in chars]
    assert got == want


def test_quality_unicode_and_edge_cases():
    """Vectorized QualityScore vs the scalar formulas on unicode + edges."""
    import re as _re

    texts = ["", "   ", "the quick, brown fox!", "é!é?é", "a\x0bb",
             "C'est l'été — déjà!", "123 _x_ ..."]
    out = QualityScore()(pa.table({"text": texts})).to_pandas()
    ws = _re.compile(r"\s+")
    punct = _re.compile(r"[^\w\s]", _re.UNICODE)
    for i, t in enumerate(texts):
        toks = [w for w in ws.split(t.lower()) if w]
        assert out["q_n_chars"][i] == len(t)
        assert out["q_n_tokens"][i] == len(toks)
        want_p = (len(punct.findall(t)) / len(t)) if t else 0.0
        assert abs(out["q_punct_ratio"][i] - want_p) < 1e-12
        want_m = (sum(len(w) for w in toks) / len(toks)) if toks else 0.0
        assert abs(out["q_mean_tok_len"][i] - want_m) < 1e-12
