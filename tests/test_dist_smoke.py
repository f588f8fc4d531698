"""Two-process jax.distributed CPU smoke (VERDICT.md r2 item 10).

`parallel.dist_trainer.initialize_distributed` was previously exercised
by nothing; here two REAL OS processes form a jax.distributed group
(Gloo collectives on CPU), each contributing 2 virtual devices to one
global 2x2 ('data','model') mesh, and run the same sharded MTAM
optimizer step.  Both processes must report the identical loss, and it
must match the single-process virtual-mesh value computed in-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_step(devices):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "dist_smoke_worker.py")
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": repo + os.pathsep
           + os.environ.get("PYTHONPATH", "")}
    env.pop("XLA_FLAGS", None)   # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("DIST_LOSS")]
        assert lines, out[-3000:]
        losses.append(float(lines[-1].split()[1]))
    assert losses[0] == losses[1], losses

    # single-process reference on the in-process 2x2 virtual mesh
    import jax
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.models.base import compute_loss
    from mtamrecommender_tpu.models.registry import get_model
    from helpers import make_batch, make_meta

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM", "model.num_units": 8,
        "model.num_blocks": 1, "model.dropout": 0.0,
        "model.vocab_pad_multiple": 16})
    meta = make_meta(item_count=30, max_seq_len=6)
    mdef = get_model("MTAM")
    params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
    ref = compute_loss(mdef, params, cfg.model, make_batch(meta, 8, seed=0),
                       True, jax.random.PRNGKey(3), meta.item_vocab)
    np.testing.assert_allclose(losses[0], float(ref["loss"]), atol=2e-5)


def test_two_process_superstep_resume_parity(devices, tmp_path):
    """Multi-host elastic recovery (VERDICT r4 item 6): two REAL
    processes run 6 sharded optimizer steps with an orbax save after
    step 3, restore that checkpoint across both processes, and replay
    steps 4-6 — the resumed loss trajectory must be BIT-IDENTICAL to the
    uninterrupted one, in both processes."""
    import ast
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "dist_smoke_worker.py")
    port = _free_port()
    ckpt_dir = str(tmp_path / "dist_ckpt")
    env = {**os.environ, "PYTHONPATH": repo + os.pathsep
           + os.environ.get("PYTHONPATH", "")}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed resume smoke timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    parsed = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("RESUME_LOSSES")]
        assert lines, out[-3000:]
        a = ast.literal_eval(lines[-1].split("a=", 1)[1].split(" b=")[0])
        b = ast.literal_eval(lines[-1].split("b=", 1)[1])
        parsed.append((a, b))
    for a, b in parsed:
        assert len(a) == 6 and len(b) == 3
        assert a[3:] == b, (a, b)          # resume == uninterrupted, exactly
    assert parsed[0] == parsed[1], parsed  # both processes agree
