"""Ablation decomposition of the STAMP framework floor (VERDICT r4 item 1).

The r4 step-budget decomposition pinned STAMP — embedding gathers +
[256,128]x[128,3840] logits/CE + adam + small matmuls — at 61.9 ms per
100-step superstep call (~0.62 ms/step) against ~0.1 ms of physical
FLOP/HBM time.  This bench times the SAME superstep executable with one
suspect removed (or replaced) per variant, in ONE process so every
variant is a fresh-but-comparable remote compile:

  base        the shipped configuration (bf16, vocab_pad 128)
  base2       base re-timed at the end (run-to-run drift guard)
  fixed_batch no in-jit gather_batch: one prebuilt batch reused
  sg_emb      stop_gradient on all 4 embedding lookups (no scatter bwd)
  sg_item     stop_gradient on the item lookup only
  onehot_sm   one-hot-matmul backward for the SMALL tables (cat/pos/user)
  onehot_all  one-hot-matmul backward for all 4 tables (item: [12.8k,3840])
  no_l2       l2_of_lookups == 0 (drops the 4 big fp32 reductions + bwd)
  sgd         optimizer = bare -lr*g (isolates clip+adam op chains)
  loss_only   stack only the loss metric (1 scalar/step, not 3)

Variants are wired by monkeypatching the library inside this script —
they are DIAGNOSTIC ONLY; winners get promoted to real (parity-tested)
code paths.  Timing methodology: every window ends with a host fetch of
the last step's loss (docs/PERFORMANCE.md — block_until_ready returns
early on this backend).

Usage:  python benchmarks/floor_bench.py [--calls 3] [--variants ...]
Writes: benchmarks/results/floor_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
STEPS_PER_CALL = 100
N_ROWS = 4096


def _onehot_gather(max_vocab):
    """Route vocab<=max_vocab tables through the SHIPPED one-hot backward
    (ops/embedding._take_onehot_bwd — incl. its f32 Precision.HIGHEST),
    larger ones through plain jnp.take; used to ablate the routing
    threshold itself."""
    import jax.numpy as jnp

    from mtamrecommender_tpu.ops import embedding as emb_ops

    def route(table, ids):
        if table.shape[0] <= max_vocab:
            return emb_ops._take_onehot_bwd(table, ids)
        return jnp.take(table, ids, axis=0)

    return route


def _stopgrad_gather(only_big: bool):
    import jax
    import jax.numpy as jnp

    def route(table, ids):
        out = jnp.take(table, ids, axis=0)
        if only_big and table.shape[0] < 1024:
            return out
        return jax.lax.stop_gradient(out)

    return route


def _patch_gather(gather_fn):
    """Route behavior_embedding's lookups through gather_fn."""
    from mtamrecommender_tpu.ops import embedding as emb_ops
    orig = emb_ops.behavior_embedding.__wrapped__ if hasattr(
        emb_ops.behavior_embedding, "__wrapped__") \
        else emb_ops.behavior_embedding

    def patched(params, batch, gather=None, use_pallas=False):
        return orig(params, batch, gather=gather_fn, use_pallas=use_pallas)

    patched.__wrapped__ = orig
    emb_ops.behavior_embedding = patched
    from mtamrecommender_tpu.models import base as base_mod
    return orig


def time_variant(variant: str, calls: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _make_batch
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.device_data import DeviceDataset
    from mtamrecommender_tpu.models import base as base_mod
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.ops import embedding as emb_ops
    from mtamrecommender_tpu.train import trainer as trainer_mod
    from mtamrecommender_tpu.types import DatasetMeta

    # ---- restore any previous variant's patches
    if hasattr(emb_ops.behavior_embedding, "__wrapped__"):
        emb_ops.behavior_embedding = emb_ops.behavior_embedding.__wrapped__
    if hasattr(base_mod.l2_of_lookups, "__wrapped__"):
        base_mod.l2_of_lookups = base_mod.l2_of_lookups.__wrapped__

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "STAMP", "model.num_units": 128,
        "model.num_blocks": 3, "model.vocab_pad_multiple": 128,
        "model.compute_dtype": "bfloat16", "model.scan_unroll": 10,
        "train.steps_per_call": STEPS_PER_CALL})
    meta = DatasetMeta(user_count=4832, item_count=3706, category_count=18,
                       max_seq_len=50)
    model = get_model("STAMP")

    if variant in ("sg_emb", "sg_item"):
        _patch_gather(_stopgrad_gather(only_big=(variant == "sg_item")))
    elif variant == "onehot_sm":
        _patch_gather(_onehot_gather(max_vocab=1024))
    elif variant == "onehot_all":
        _patch_gather(_onehot_gather(max_vocab=1 << 30))
    elif variant == "dtable_kernel":
        # force the pallas tiled-one-hot backward for every table
        from mtamrecommender_tpu.ops.pallas import embedding_kernel as ek
        _patch_gather(ek.take_dtable)
    elif variant == "dtable_item":
        from mtamrecommender_tpu.ops.pallas import embedding_kernel as ek

        def route(table, ids):
            if table.shape[0] >= 1024:
                return ek.take_dtable(table, ids)
            return _onehot_gather(max_vocab=1 << 30)(table, ids)

        _patch_gather(route)
    elif variant == "no_l2":
        orig_l2 = base_mod.l2_of_lookups

        def zero_l2(embedded, valid):
            return jnp.zeros((), jnp.float32)

        zero_l2.__wrapped__ = orig_l2
        base_mod.l2_of_lookups = zero_l2

    if variant == "sg_pred":
        # stop-grad on the model's prediction: removes the model-tower
        # backward (attention/MLP chains) while keeping CE fwd+bwd wrt
        # the logits table and the embedding backward — isolates how
        # much of the residual floor is the tower's backward op count
        orig_apply = model.apply

        def apply_sg(params, cfg_m, batch, *, train, rng):
            o = orig_apply(params, cfg_m, batch, train=train, rng=rng)
            return base_mod.ModelOutput(
                jax.lax.stop_gradient(o.predict_emb), o.embedded)

        model = model._replace(apply=apply_sg)

    params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
    if variant == "sgd":
        sched = trainer_mod.make_lr_schedule(cfg.train)
        opt = optax.scale_by_schedule(lambda c: -sched(c))
    else:
        opt = trainer_mod.make_optimizer(cfg.train)
    opt_state = opt.init(params)

    big = _make_batch(meta, N_ROWS)
    data = DeviceDataset(
        user_id=big.user_id, items=big.items, cats=big.cats, times=big.times,
        time_last=big.time_last, time_now=big.time_now,
        positions=big.positions, target_id=big.target_id,
        target_cat=big.target_cat, target_time=big.target_time,
        seq_len=big.seq_len)
    order = jax.device_put(np.random.RandomState(0).randint(
        0, N_ROWS, size=(STEPS_PER_CALL * (calls + 1) * BATCH,)
    ).astype(np.int32))

    valid_vocab = meta.item_vocab

    if variant == "fixed_batch":
        fixed = _make_batch(meta, BATCH)

        @jax.jit
        def fn(params, opt_state, data, order, start, rng):
            def body(carry, k):
                params, opt_state, rng = carry
                keys = jax.random.split(rng)
                step_rng, rng = keys[0], keys[1]

                def loss_fn(p):
                    m = base_mod.compute_loss(model, p, cfg.model, fixed,
                                              True, step_rng, valid_vocab)
                    return m["loss"], m

                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state2 = opt.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state2,
                        rng), metrics

            (params, opt_state, rng), stacked = jax.lax.scan(
                body, (params, opt_state, rng),
                jnp.arange(STEPS_PER_CALL, dtype=jnp.int32))
            return params, opt_state, stacked, rng
    elif variant == "loss_only":
        from mtamrecommender_tpu.data.device_data import gather_batch

        @jax.jit
        def fn(params, opt_state, data, order, start, rng):
            def body(carry, k):
                params, opt_state, rng = carry
                keys = jax.random.split(rng)
                step_rng, rng = keys[0], keys[1]
                batch = gather_batch(data, order, start + k, BATCH)

                def loss_fn(p):
                    m = base_mod.compute_loss(model, p, cfg.model, batch,
                                              True, step_rng, valid_vocab)
                    return m["loss"], m["loss"]

                (_, loss), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state2 = opt.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state2,
                        rng), {"loss": loss}

            (params, opt_state, rng), stacked = jax.lax.scan(
                body, (params, opt_state, rng),
                jnp.arange(STEPS_PER_CALL, dtype=jnp.int32))
            return params, opt_state, stacked, rng
    else:
        fn = trainer_mod.make_superstep(model, cfg, opt, valid_vocab,
                                        BATCH)(STEPS_PER_CALL)

    rng = jax.random.PRNGKey(1)
    t_c = time.perf_counter()
    params, opt_state, stacked, rng = fn(params, opt_state, data, order,
                                         0, rng)
    assert np.isfinite(float(np.asarray(stacked["loss"])[-1]))
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for c in range(calls):
        params, opt_state, stacked, rng = fn(
            params, opt_state, data, order, (c + 1) * STEPS_PER_CALL, rng)
    last_loss = float(np.asarray(stacked["loss"])[-1])
    assert np.isfinite(last_loss)
    dt = time.perf_counter() - t0
    return {"variant": variant,
            "ms_per_100_steps": round(dt / calls * 1000, 1),
            "examples_per_s": round(BATCH * STEPS_PER_CALL * calls / dt, 1),
            "compile_s": round(compile_s, 1),
            "last_loss": round(last_loss, 4)}


DEFAULT_VARIANTS = ["base", "fixed_batch", "sg_emb", "sg_item", "onehot_sm",
                    "onehot_all", "no_l2", "sgd", "loss_only", "base2"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--variants", nargs="+", default=DEFAULT_VARIANTS)
    ap.add_argument("--tag", default="r5")
    args = ap.parse_args()

    import jax
    if os.environ.get("FLOOR_CPU"):          # smoke-test without the TPU
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    rows = []
    out = os.path.join("benchmarks", "results", f"floor_{args.tag}.json")
    for v in args.variants:
        name = "base" if v == "base2" else v
        row = time_variant(name, args.calls)
        row["variant"] = v
        print(json.dumps(row), flush=True)
        rows.append(row)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump({"batch": BATCH, "steps_per_call": STEPS_PER_CALL,
                       "model": "STAMP", "rows": rows}, f, indent=1)
    print("written", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
