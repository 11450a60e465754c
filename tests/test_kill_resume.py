"""True kill-mid-build resume (FIXTURES.md F5): SIGKILL the build process
once the first postings bucket lands, rerun, assert byte-identical output."""

import os
import signal
import subprocess
import sys
import time

import pytest

BUILD_SNIPPET = """
import sys, glob
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from deces_dataprep_ray.index.build import build_index
build_index(sorted(glob.glob({corpus!r} + "/*.parquet")), {index!r},
            num_buckets=8, salt_shards=2, head_min_df=60, batch_size=128)
print("BUILD_DONE")
"""


def _run_build(corpus: str, index: str, kill_after_first_bucket: bool):
    code = BUILD_SNIPPET.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        corpus=corpus, index=index)
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    if not kill_after_first_bucket:
        out, _ = proc.communicate(timeout=300)
        assert "BUILD_DONE" in out
        return True
    # wait until at least one bucket sidecar exists, then SIGKILL the driver
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — fine, still a valid run
        oks = [
            f for b in range(8)
            for f in [os.path.join(index, "postings", f"bucket={b:05d}", "_OK.json")]
            if os.path.exists(f)
        ]
        if oks:
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.2)
    proc.wait(timeout=60)
    return killed


@pytest.mark.slow
def test_sigkill_mid_postings_then_resume(corpus_dir, tmp_path):
    full = str(tmp_path / "full")
    assert _run_build(corpus_dir, full, kill_after_first_bucket=False)

    broken = str(tmp_path / "broken")
    _run_build(corpus_dir, broken, kill_after_first_bucket=True)
    # resume in another fresh process
    assert _run_build(corpus_dir, broken, kill_after_first_bucket=False)

    for b in range(8):
        p1 = os.path.join(full, "postings", f"bucket={b:05d}", "part.parquet")
        p2 = os.path.join(broken, "postings", f"bucket={b:05d}", "part.parquet")
        assert os.path.exists(p1) == os.path.exists(p2), f"bucket {b}"
        if os.path.exists(p1):
            with open(p1, "rb") as f1, open(p2, "rb") as f2:
                assert f1.read() == f2.read(), f"bucket {b} differs after kill+resume"
