"""Error budget (ERR_MAX analogue) + index backup push/pull/verify."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from deces_dataprep_ray.index.backup import (
    BACKUP_NAME,
    pull_index,
    push_index,
    verify_index,
)
from deces_dataprep_ray.stages.errors import (
    ErrorBudget,
    ErrorBudgetExceeded,
    with_error_budget,
)


def _make_flaky():
    # defined via factory so cloudpickle ships it by value to workers
    def flaky_fn(batch: pa.Table) -> pa.Table:
        vals = batch["x"].to_numpy()
        if (vals < 0).any():
            raise ValueError("negative input")
        return pa.table({"x": batch["x"], "y": pa.array(np.sqrt(vals))})
    return flaky_fn


def test_bad_rows_dropped_within_budget():
    x = np.arange(-3, 97).astype(np.float64)  # 3 poison rows
    ds = rd.from_pandas(pd.DataFrame({"x": x}))
    budget = ErrorBudget.remote(max_errors=20)
    out = with_error_budget(ds, _make_flaky(), budget).to_pandas()
    assert len(out) == 97
    assert ray.get(budget.total.remote()) == 3
    samples = ray.get(budget.errors.remote())
    assert samples and "negative input" in samples[0]


def test_budget_exceeded_aborts():
    x = -np.arange(1, 101).astype(np.float64)  # all 100 rows poison
    ds = rd.from_pandas(pd.DataFrame({"x": x}))
    budget = ErrorBudget.remote(max_errors=20)
    with pytest.raises(Exception) as ei:
        with_error_budget(ds, _make_flaky(), budget).to_pandas()
    assert "error budget exceeded" in str(ei.value)


def test_clean_input_untouched():
    x = np.arange(50).astype(np.float64)
    ds = rd.from_pandas(pd.DataFrame({"x": x}))
    budget = ErrorBudget.remote(max_errors=5)
    out = with_error_budget(ds, _make_flaky(), budget).to_pandas()
    assert len(out) == 50 and ray.get(budget.total.remote()) == 0


def test_push_pull_verify_roundtrip(built_index, tmp_path):
    idx, _ = built_index
    dest = str(tmp_path / "backup")
    doc = push_index(idx, dest)
    assert doc["n_files"] > 0
    assert os.path.exists(os.path.join(dest, BACKUP_NAME))

    restored = str(tmp_path / "restored")
    report = pull_index(dest, restored)
    assert report["ok"] and report["checked"] > 0

    # the restored index answers identically
    from deces_dataprep_ray.index.query import search_exact
    from deces_dataprep_ray.index.reader import IndexReader

    r1, r2 = IndexReader(idx), IndexReader(restored)
    assert search_exact(r1, "term1 term2", 10) == \
           search_exact(r2, "term1 term2", 10)


def test_verify_detects_corruption(built_index, tmp_path):
    idx, _ = built_index
    dest = str(tmp_path / "backup2")
    push_index(idx, dest)
    # corrupt one bucket payload byte
    victim = None
    postings = os.path.join(dest, "postings")
    for name in sorted(os.listdir(postings)):
        p = os.path.join(postings, name, "part.parquet")
        if name.startswith("bucket=") and os.path.exists(p):
            victim = p
            break
    assert victim
    data = bytearray(open(victim, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(data))
    report = verify_index(dest)
    assert not report["ok"]
    assert any("mismatch" in e for e in report["errors"])
    with pytest.raises(RuntimeError):
        pull_index(dest, str(tmp_path / "restored2"))


def test_docvalues_phase_resumes(built_index):
    # a build interrupted after postings (docvalues phase pending) must
    # complete ONLY the missing phase on resume, rebuilding the docstore
    import shutil

    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.reader import IndexReader
    from deces_dataprep_ray.state.manifest import Manifest

    idx, _ = built_index
    r = IndexReader(idx)
    some = r.resolve_urls(list(r.postings("term1")[0][:3].tolist()))
    assert some

    man = Manifest.load(idx)
    postings_stamp = man.phase("postings").get("seconds")
    del man.doc["phases"]["docvalues"]
    man.save()
    shutil.rmtree(os.path.join(idx, "docvalues"))

    # resume needs only the analyzed checkpoint (still on disk) and the same
    # config; the input list is irrelevant because every earlier phase is
    # already marked done under the matching input_tag
    man2 = Manifest.load(idx)
    assert not man2.phase_done("docvalues")
    build_index([], idx, num_buckets=8, salt_shards=4, head_min_df=60,
                batch_size=256,
                input_tag=man2.doc["config"]["input_tag"])
    man3 = Manifest.load(idx)
    assert man3.phase_done("docvalues")
    # postings untouched (not rebuilt)
    assert man3.phase("postings").get("seconds") == postings_stamp
    r2 = IndexReader(idx)
    assert r2.resolve_urls(list(some.keys())) == some


def test_pull_corrupt_backup_preserves_existing_index(built_index, tmp_path):
    # restoring a corrupt backup must leave a healthy serving index intact
    idx, _ = built_index
    good = str(tmp_path / "serving")
    dest = str(tmp_path / "backup3")
    push_index(idx, dest)
    pull_index(dest, good)  # healthy restore

    # corrupt the backup, then try to pull over the healthy index
    postings = os.path.join(dest, "postings")
    victim = next(os.path.join(postings, n, "part.parquet")
                  for n in sorted(os.listdir(postings))
                  if n.startswith("bucket="))
    data = bytearray(open(victim, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(data))
    with pytest.raises(RuntimeError):
        pull_index(dest, good)
    # the original index still verifies and still answers
    assert verify_index(good)["ok"]
    from deces_dataprep_ray.index.query import search_exact
    from deces_dataprep_ray.index.reader import IndexReader

    assert search_exact(IndexReader(good), "term1", 5)


def test_shared_budget_cap_enforced_actor_side():
    # the cap lives on the actor: a stage cannot silently run with a looser
    # one (round-2 review finding)
    x = -np.arange(1, 31).astype(np.float64)
    ds = rd.from_pandas(pd.DataFrame({"x": x}))
    budget = ErrorBudget.remote(max_errors=5)
    with pytest.raises(Exception) as ei:
        with_error_budget(ds, _make_flaky(), budget).to_pandas()
    assert "> 5" in str(ei.value)


def test_docvalues_only_single_field_build(tmp_path):
    # docvalue_fields WITHOUT fields/keyword_fields must carry the typed
    # columns through the single-field analyzer into the docstore
    import pandas as pd

    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.reader import IndexReader

    src = str(tmp_path / "src.parquet")
    pd.DataFrame({
        "url": [f"doc://{i}" for i in range(20)],
        "text": [f"alpha beta gamma {i}" for i in range(20)],
        "nval": np.arange(20, dtype=np.int64) * 3,
    }).to_parquet(src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, docvalue_fields={"nval": "nval"},
                num_buckets=4, salt_shards=2, head_min_df=1000, batch_size=8)
    r = IndexReader(idx)
    from deces_dataprep_ray.index.fielded import RangeFilter

    docs = RangeFilter("nval", 9, 30).doc_ids(r)
    assert len(docs) == 8  # nval in {9,...,30} step 3
