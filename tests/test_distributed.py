"""True multi-process coverage for parallel/distributed.py (VERDICT r4
task 5): two localhost CPU processes, jax.distributed.initialize with a
real gRPC coordinator, one sharded train step whose gradient psum crosses
the process boundary, loss parity asserted against a single-process run.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tsr_tpu import configs
from tsr_tpu.models import SimpleUNet
from tsr_tpu.train import common

WORKER = Path(__file__).parent / "_dist_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_loss() -> float:
    """The identical step on the identical data, unsharded, in-process."""
    rng = np.random.default_rng(0)
    bad = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    clean = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    model = SimpleUNet(widths=(4, 8))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = common.TrainState.create(
        model.apply, v,
        common.restoration_optimizer(configs.RestorationTrainConfig()))
    step = common.make_restoration_train_step(pixel="mse")
    _, aux = step(state, jnp.asarray(bad), jnp.asarray(clean))
    return float(aux["loss"])


def test_two_process_loss_parity():
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover - sandboxed CI
        pytest.skip(f"no localhost sockets: {e}")
    coordinator = f"127.0.0.1:{port}"
    # prepend (not replace) PYTHONPATH: /root/.axon_site must survive or
    # the sitecustomize this environment relies on fails to load
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO), env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:  # pragma: no cover
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")

    losses = []
    for rc, out, err in outs:
        if rc != 0 and ("UNAVAILABLE" in err or "collectives" in err
                        or "gloo" in err.lower()):
            pytest.skip(f"CPU collectives unavailable here: {err[-400:]}")
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("DIST_LOSS")]
        assert line, out
        losses.append(float(line[0].split()[1]))

    # both processes observe the same replicated loss
    assert losses[0] == losses[1], losses
    # and it matches the single-process run of the same step/data
    ref = _single_process_loss()
    assert np.isclose(losses[0], ref, rtol=1e-5), (losses[0], ref)
