"""Long-history training demo (VERDICT r3 item 6; SURVEY.md §5.7).

The reference's time-aware attention parameterizes its decay gate as
position-indexed [Tq,Tk] matrices
(`/root/reference/Model/Modules/time_aware_attention.py:295-312`), which
structurally pins the model to the configured L (=50) — histories of
thousands of events cannot even be REPRESENTED.  This framework's
scalar-Δt gate (`model.time_gate_mode='scalar'`) removes that cap; this
script proves the capability end-to-end with a real TRAINING run at
L >= 1024:

  * a Markov-chain synthetic long-history log (next item predictable
    from the current item, so the loss must genuinely fall);
  * MTAM with the scalar gate over the full history, superstep
    execution; loss at start vs end + throughput reported;
  * optionally (--cp N, on a multi-device backend) the same step with
    the attention KEY axis sharded over N devices — per-device attention
    memory is O(L/N) (parallel/context_parallel.py).

Usage:  python benchmarks/long_history_bench.py [--seq_len 2048] [--steps 300]
Writes: benchmarks/results/long_history_{tag}.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def markov_long_batchset(n_rows: int, L: int, items: int, cats: int,
                         seed: int = 0):
    """Rows of a long-history log with learnable structure: items follow
    a sparse random walk (next ~ one of 3 successors of current), times
    advance by item-dependent gaps.  Targets = the walk's next step."""
    rng = np.random.RandomState(seed)
    succ = rng.randint(1, items + 1, size=(items + 1, 3))
    gaps = rng.randint(1, 48, size=items + 1).astype(np.float32)  # hours
    item_cat = rng.randint(1, cats + 1, size=items + 2).astype(np.int32)

    seq = np.zeros((n_rows, L), np.int32)
    times = np.zeros((n_rows, L), np.float32)
    target = np.zeros((n_rows,), np.int32)
    seq_len = np.full((n_rows,), L, np.int32)
    for r in range(n_rows):
        cur = rng.randint(1, items + 1)
        t = float(rng.randint(0, 1000))
        hist_n = L - 1                       # last slot = mask token
        for i in range(hist_n):
            seq[r, i] = cur
            times[r, i] = t
            cur = succ[cur, rng.randint(3)]
            t += gaps[seq[r, i]]
        target[r] = cur
        seq[r, hist_n] = items + 1           # mask token
        times[r, hist_n] = t
    cats_arr = item_cat[seq]
    cats_arr[:, L - 1] = cats + 1
    tl = np.zeros_like(times)
    tl[:, 1:] = times[:, 1:] - times[:, :-1]
    tn = times[:, -1:] - times
    pos = np.tile(np.arange(L, dtype=np.int32), (n_rows, 1))
    return dict(user_id=rng.randint(1, 100, n_rows).astype(np.int32),
                items=seq, cats=cats_arr, times=times,
                time_last=tl, time_now=tn, positions=pos,
                target_id=target, target_cat=item_cat[target],
                target_time=times[:, -1].astype(np.float32),
                seq_len=seq_len)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq_len", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--items", type=int, default=2000)
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--model", default="MTAM",
                    help="any registry model; SASrec at L>=256 exercises "
                         "the dropout-mode attention kernel end-to-end "
                         "(VERDICT r4 item 3)")
    ap.add_argument("--dropout", type=float, default=None,
                    help="override ModelConfig.dropout (default: preset)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--use_pallas", action="store_true",
                    help="enable the kernels (readout kernel routes at "
                         "seq_len >= 256; GRU kernel where supported)")
    ap.add_argument("--pallas_scope", default="all")
    ap.add_argument("--cp", type=int, default=0,
                    help="shard the attention key axis over N devices "
                         "(requires N devices, e.g. the virtual CPU mesh)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.device_data import DeviceDataset
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import make_optimizer, make_superstep
    from mtamrecommender_tpu.types import DatasetMeta

    L = args.seq_len
    spc = max(1, min(50, args.steps // 2))   # >=2 calls so timing can
                                             # exclude the compile call
    meta = DatasetMeta(user_count=100, item_count=args.items,
                       category_count=18, max_seq_len=L)
    over_drop = {} if args.dropout is None else {
        "model.dropout": args.dropout}
    cfg = ExperimentConfig().with_overrides(**over_drop, **{
        "model.experiment_type": args.model, "model.num_units": 128,
        "model.num_blocks": 3, "model.vocab_pad_multiple": 128,
        "model.compute_dtype": "bfloat16",
        # the point of the run: the length-free gate
        "model.time_gate_mode": "scalar",
        "model.use_pallas": args.use_pallas,
        "model.pallas_scope": args.pallas_scope,
        "train.steps_per_call": spc})
    raw = markov_long_batchset(args.rows, L, args.items, 18)
    data = DeviceDataset(**{k: jnp.asarray(v) for k, v in raw.items()})

    model = get_model(args.model)
    result = {"model": args.model, "seq_len": L, "batch": args.batch,
              "steps": args.steps, "items": args.items, "gate": "scalar",
              "dropout": args.dropout,
              "backend": jax.default_backend()}

    if args.cp:
        from mtamrecommender_tpu.config import MeshConfig
        from mtamrecommender_tpu.parallel import sharding as shard_lib
        from mtamrecommender_tpu.parallel.dist_trainer import \
            make_sharded_superstep
        from mtamrecommender_tpu.parallel.mesh import build_mesh
        cfg = cfg.with_overrides(**{
            "mesh.model_axis_size": args.cp, "mesh.context_parallel": True,
            "model.vocab_pad_multiple": 128 * args.cp,
            "mesh.shard_embeddings": True})
        mesh = build_mesh(cfg.mesh)
        params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
        params = shard_lib.place_params(mesh, cfg.mesh, params)
        opt = make_optimizer(cfg.train)
        opt_state0 = opt.init(params)
        opt_state = jax.device_put(
            opt_state0, shard_lib.replicated_tree(mesh, opt_state0))
        data = jax.device_put(data, shard_lib.replicated_tree(mesh, data))
        template = jax.eval_shape(
            lambda r: model.init(r, cfg.model, meta), jax.random.PRNGKey(0))
        fn = make_sharded_superstep(model, cfg, opt, mesh, template,
                                    meta.item_vocab, args.batch)(
                                        cfg.train.steps_per_call)
        result["cp_shards"] = args.cp
        result["keys_per_device"] = L // args.cp
    else:
        mesh = None
        params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
        opt = make_optimizer(cfg.train)
        opt_state = opt.init(params)
        fn = make_superstep(model, cfg, opt, meta.item_vocab, args.batch)(
            cfg.train.steps_per_call)

    order_np = np.random.RandomState(1).randint(
        0, args.rows, size=(args.steps * args.batch + args.batch,)
    ).astype(np.int32)
    if mesh is not None:
        from mtamrecommender_tpu.parallel import sharding as shard_lib2
        order = jax.device_put(order_np,
                               shard_lib2.replicated_tree(mesh, 0))
    else:
        order = jax.device_put(order_np)

    rng = jax.random.PRNGKey(2 + args.seed)
    losses = []
    t0 = None
    n_calls = args.steps // cfg.train.steps_per_call
    for c in range(n_calls):
        params, opt_state, stacked, rng = fn(
            params, opt_state, data, order, c * cfg.train.steps_per_call, rng)
        host = np.asarray(stacked["loss"])
        losses.extend(host.tolist())
        if c == 0:
            t0 = time.perf_counter()   # timing excludes the compile call
    dt = time.perf_counter() - t0 if n_calls > 1 else float("nan")
    timed_steps = (n_calls - 1) * cfg.train.steps_per_call

    result.update({
        "loss_first5": round(float(np.mean(losses[:5])), 4),
        "loss_last5": round(float(np.mean(losses[-5:])), 4),
        "improved": bool(np.mean(losses[-5:]) < 0.8 * np.mean(losses[:5])),
        "finite": bool(np.all(np.isfinite(losses))),
        "examples_per_s": round(args.batch * timed_steps / dt, 1)
        if timed_steps else None,
        "ms_per_step": round(dt / timed_steps * 1000, 2) if timed_steps else None,
    })
    path = os.path.join("benchmarks", "results",
                        f"long_history_{args.tag}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
