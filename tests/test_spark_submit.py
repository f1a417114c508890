"""The north rule's deployment shape, executed for real: spark-submit
--py-files libgeodesk_spark.zip jobs/spatial_join_job.py, from a cwd where
the package is NOT importable — every module must come from the zip, on
the driver and the executors alike."""

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    subprocess.run(["sh", os.path.join(REPO, "tools", "make_pyfiles.sh")],
                   check=True, capture_output=True)
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", os.path.join(REPO, "libgeodesk_spark.zip"),
         os.path.join(REPO, "jobs", "spatial_join_job.py"),
         "--sf-dir", "/root/testdata/sf0.001",
         "--out", str(tmp_path / "job")],
        cwd=str(tmp_path),          # package not importable from here
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    # pinned against the oracle-gated within counts at sf0.001
    assert out["n_images"] == 4599
    assert out["join_counts"] == {"comb": 1025, "holed": 1837,
                                  "convex": 1843}
    assert out["tiles"] > 0 and out["tiles_psnr_ok"] == out["tiles"]
    assert out["tile_buckets"]["skipped"] == []
