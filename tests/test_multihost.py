"""2-process jax.distributed smoke test (component C27, DCN side).

Validates parallel/multihost.py against a real coordinator: two CPU
processes (4 virtual devices each) form one 8-device mesh and run a dp train
step whose gradient all-reduce crosses the process boundary.  See
tests/multihost_worker.py for the worker body.
"""
import os
import re
import socket
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # multi-minute; inner loop runs -m 'not slow'

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_agrees():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = {}
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=(\d) errD=([\d.eE+-]+) errG=([\d.eE+-]+)", out)
        assert m, out
        losses[int(m.group(1))] = (m.group(2), m.group(3))
    assert set(losses) == {0, 1}
    # replicated metrics after the cross-process all-reduce must match exactly
    assert losses[0] == losses[1], losses

    # Trainer-level run (per-process staging, real epoch driver): identical
    # losses AND identical strain masks across both processes
    trainer = {}
    for out in outs:
        m = re.search(
            r"MULTIHOST_TRAINER_OK pid=(\d) errD=([\d.eE+-]+) "
            r"errG=([\d.eE+-]+) mask_crc=(\d+) active=(\d+)", out
        )
        assert m, out
        trainer[int(m.group(1))] = m.groups()[1:]
    assert set(trainer) == {0, 1}
    assert trainer[0] == trainer[1], trainer
    # the strain actually removed something (non-vacuous mask agreement);
    # the `final` mixture is 2*max_synth samples (primary + contaminants)
    assert 0 < int(trainer[0][3]) < 256, trainer
