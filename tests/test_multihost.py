"""Multi-host runtime test: two REAL processes with jax.distributed over
the Gloo-backed CPU backend (2 procs x 2 virtual devices = 4-device
global mesh) running the actual train step with per-process data shards.

This is the CI-checkable stand-in for an N-host TPU pod (SURVEY.md §2.15;
BASELINE.md names the N>=2-hosts target): the same code path —
parallel.distributed bootstrap, global_batch placement, XLA gradient
psum, metric/object gathers, main-only checkpointing — runs unmodified
on real multi-host meshes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(a).save(data / f"i{i}.png")
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "LBIC_COORDINATOR": f"127.0.0.1:{port}",
        "LBIC_NUM_PROCESSES": "2",
        "LBIC_TEST_DATA": str(data),
        "LBIC_TEST_CKPT": str(tmp_path),
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    procs = []
    for rank in range(2):
        e = dict(env, LBIC_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py")],
            env=e, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-4000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda o: o["rank"])
    assert r0["world"] == r1["world"] == 2
    assert r0["n_devices"] == 4  # global device view on every process
    # equal-length lockstep shards over DISJOINT data
    assert r0["n_batches"] == r1["n_batches"] > 0
    assert r0["batch_digest"] != r1["batch_digest"]
    # one global program: identical loss and identical params everywhere
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    np.testing.assert_allclose(r0["params_psum"], r1["params_psum"],
                               rtol=1e-6)
    # gathers see both processes
    assert r0["gathered"] == r1["gathered"] == [1.0, 2.0]
    assert r0["objects"] == [0, 1]
    # main-only checkpoint readable by both after the barrier
    np.testing.assert_allclose(r0["ckpt_psum"], r0["params_psum"],
                               rtol=1e-6)
    np.testing.assert_allclose(r1["ckpt_psum"], r1["params_psum"],
                               rtol=1e-6)
