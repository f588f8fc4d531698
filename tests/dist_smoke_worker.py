"""Worker for the two-process jax.distributed CPU smoke
(tests/test_dist_smoke.py; VERDICT.md r2 item 10 + r4 item 6).

Each process brings up the process group via
parallel.dist_trainer.initialize_distributed (Gloo collectives on CPU),
contributes 2 virtual local devices to a global 2x2 ('data','model')
mesh spanning both processes, and runs ONE sharded MTAM optimizer step
with row-sharded (EP) tables.  Prints `DIST_LOSS <value>` for the parent
test to compare across processes and against the single-process value.

With a 4th argument (a shared checkpoint dir) the worker instead runs
the multi-host elastic-recovery drill: SIX sharded optimizer steps with
an orbax save after step 3, then a restore of that checkpoint ACROSS
BOTH PROCESSES into the (by then step-6) state and a re-run of steps
4-6 — the resumed losses must be bit-identical to the uninterrupted
trajectory.  Prints `RESUME_LOSSES a=[...] b=[...]`.

Usage: python dist_smoke_worker.py <process_id> <num_processes> <port> \
           [ckpt_dir]
"""

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mtamrecommender_tpu.parallel.dist_trainer import (  # noqa: E402
    initialize_distributed, make_sharded_train_step)

initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=nproc, process_id=proc_id)

import numpy as np  # noqa: E402

from mtamrecommender_tpu.config import ExperimentConfig  # noqa: E402
from mtamrecommender_tpu.models.registry import get_model  # noqa: E402
from mtamrecommender_tpu.parallel import sharding as shard_lib  # noqa: E402
from mtamrecommender_tpu.parallel.mesh import build_mesh  # noqa: E402
from mtamrecommender_tpu.train.trainer import make_optimizer  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from helpers import make_batch, make_meta  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

cfg = ExperimentConfig().with_overrides(**{
    "model.experiment_type": "MTAM", "model.num_units": 8,
    "model.num_blocks": 1, "model.dropout": 0.0,
    "model.vocab_pad_multiple": 16,
    "mesh.model_axis_size": 2, "mesh.shard_embeddings": True})
mesh = build_mesh(cfg.mesh)          # 2x2 across the two processes
meta = make_meta(item_count=30, max_seq_len=6)
mdef = get_model("MTAM")
params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
opt = make_optimizer(cfg.train)

# host values are identical in every process (same seeds), so device_put
# onto the global shardings is well-defined
placed = shard_lib.place_params(mesh, cfg.mesh, jax.device_get(params))
o_pl = jax.device_put(opt.init(params),
                      shard_lib.replicated_tree(mesh, opt.init(params)))
batch = shard_lib.place_batch(mesh, cfg.mesh, make_batch(meta, 8, seed=0))

step = make_sharded_train_step(mdef, cfg, opt, mesh, placed, meta.item_vocab)

if ckpt_dir is None:
    new_p, _, metrics = step(placed, o_pl, batch, jax.random.PRNGKey(3))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    print(f"DIST_LOSS {loss:.6f}", flush=True)
else:
    # ---- multi-step + save-in-the-middle + cross-process exact resume
    from mtamrecommender_tpu.train.checkpoint import Checkpointer
    from mtamrecommender_tpu.train.trainer import TrainState

    def batches(i):
        return shard_lib.place_batch(mesh, cfg.mesh,
                                     make_batch(meta, 8, seed=100 + i))

    def run(p, o, lo, hi):
        losses = []
        for i in range(lo, hi):
            p, o, m = step(p, o, batches(i), jax.random.PRNGKey(10 + i))
            losses.append(float(np.asarray(jax.device_get(m["loss"]))))
        return p, o, losses

    # uninterrupted trajectory, saving at the step-3 boundary
    p, o, losses_a = run(placed, o_pl, 0, 3)
    ckpt = Checkpointer(ckpt_dir)
    ckpt.save(TrainState(params=p, opt_state=o, step=3), wait=True)
    p6, o6, tail_a = run(p, o, 3, 6)
    losses_a += tail_a

    # restore the step-3 checkpoint across both processes INTO the
    # step-6 state's buffers (template supplies shardings; values come
    # from disk) and replay steps 4-6
    restored = ckpt.restore(TrainState(params=p6, opt_state=o6, step=0))
    ckpt.close()
    assert restored.step == 3, restored.step
    _, _, tail_b = run(restored.params, restored.opt_state, 3, 6)
    print(f"RESUME_LOSSES a={losses_a!r} b={tail_b!r}", flush=True)
