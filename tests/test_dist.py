"""Multi-process ("multi-host without a cluster", SURVEY §4.5) tests: N
separate JAX processes with virtual CPU devices initialize jax.distributed
against a localhost coordinator and run the sharded scoring program over the
GLOBAL mesh.  The reference has no analog (single-process TBB); this is the
TPU build's own multi-host story (SURVEY §5.8)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("nprocs,devs", [(2, 4)])
def test_multiprocess_sharded_scoring(nprocs, devs):
    """2 processes x 4 virtual CPU devices: the global-mesh sharded placement
    scoring program must match an independent f64 oracle in every process
    (see tools/dist_smoke.py)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dist_smoke.py"),
         str(nprocs), str(devs)],
        capture_output=True, text=True, timeout=280, cwd=REPO)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert r.stdout.count("OK") == nprocs, r.stdout


def test_dist_scaffolding_noop_without_flags():
    """maybe_initialize is a no-op (returns False) without flags/env — the
    single-process path must never touch jax.distributed."""
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-c",
         "from panmap_tpu.parallel.dist import maybe_initialize, "
         "process_read_shard\n"
         "assert maybe_initialize() is False\n"
         "assert process_read_shard(10) == slice(0, 10)\n"
         "print('NOOP-OK')"],
        capture_output=True, text=True, timeout=120, cwd=REPO, env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "NOOP-OK" in r.stdout
