"""Multi-process distributed BA: N real OS processes under jax.distributed
(the fake cluster of SURVEY §4) must reproduce the single-process result.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_camera_sharded_ba(tmp_path):
    out = tmp_path / "dist.json"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        _SLAM_TESTS_REEXEC="1",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dist_fake_cluster.py"),
         "--sizes", "2", "--json", str(out)],
        env=env, timeout=1200, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(out))
    run = summary["runs"][0]
    assert run["procs"] == 2
    assert run["ok"], run
    assert run["median_pt_err_vs_single"] < 5e-3


@pytest.mark.slow
def test_two_process_edge_sharded_pose_graph(tmp_path):
    out = tmp_path / "dist_pg.json"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        _SLAM_TESTS_REEXEC="1",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dist_fake_cluster.py"),
         "--sizes", "2", "--kind", "pg", "--kfs", "128", "--json", str(out)],
        env=env, timeout=1200, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(out))
    run = summary["runs"][0]
    assert run["kind"] == "pg" and run["procs"] == 2
    assert run["ok"], run
    assert run["rel_err_vs_single"] < 1e-3
