"""Real two-process multihost (DCN) test: spawns two coordinated CPU
processes (2 virtual devices each), builds the 4-device global mesh, ships
per-host local batches into a global batch-sharded array, and runs one
data-parallel GAN train step — the code path --multihost uses in train_cli
(reference has nothing comparable: SURVEY.md §2.3/§5.8)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")

# Gloo/coordination rendezvous inside XLA has fixed ~30 s deadlines; on a
# loaded host the two workers' import phases (jax + flax + torch) can skew
# by more than that, making startup OR a mid-step cross-host fetch time out
# (one full-suite run on a load-6 single-core box died fetching a metric
# value, with no recognizable marker in the deadline message).  Those are
# test-infra races, not product failures — retry once on ANY first-attempt
# failure; a real regression fails both attempts and both reports surface.


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    return procs, outs


@pytest.mark.slow
def test_two_process_dcn_train_step():
    procs, outs = _run_pair()
    first_report = ""
    if any(p.returncode != 0 for p in procs):
        first_report = "\n".join(
            f"===== attempt 1 proc {i} rc={p.returncode} =====\n{out[-2500:]}"
            for i, (p, out) in enumerate(zip(procs, outs))
        )
        procs, outs = _run_pair()  # contention flake: one retry
        if all(p.returncode == 0 for p in procs):
            # The retry passed — but a genuinely intermittent product
            # regression (e.g. a racy cross-host collective) would look
            # exactly like this.  Keep every swallowed first failure
            # visible in the pytest warnings summary so a ~50%-flaky bug
            # cannot pass silently forever.
            import warnings

            warnings.warn(
                "multihost attempt 1 failed and the retry passed — "
                "treating as host-contention flake. Attempt-1 report:\n"
                + first_report,
                RuntimeWarning,
            )
    if any(p.returncode != 0 for p in procs):
        report = "\n".join(
            f"===== proc {i} rc={p.returncode} =====\n{out[-2500:]}"
            for i, (p, out) in enumerate(zip(procs, outs))
        )
        raise AssertionError(
            f"worker pair failed twice:\n{report}\n{first_report}")
    for i, out in enumerate(outs):
        assert f"proc {i} OK:" in out
