"""Per-model train-step timing across pallas scopes (honest, fetch-synced).

Times one 100-step superstep call (the production executor) for a model
under each compute configuration — the instrument behind the
docs/PERFORMANCE.md variant table and VERDICT r2 item 4's proof
("scope=all <= scope=gru on MTAM and SASrec").  Every timed window ends
with a host fetch of the last step's loss (block_until_ready is
unreliable on this backend; docs/PERFORMANCE.md methodology).

Usage:  python benchmarks/step_bench.py --models MTAM SASrec \
            --scopes none gru all [--calls 3]
Writes: benchmarks/results/steps_{tag}.json
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


def time_model(name: str, scope: str, calls: int) -> dict:
    import jax
    import numpy as np

    from __graft_entry__ import _make_batch
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.device_data import DeviceDataset
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import (make_optimizer,
                                                   make_superstep)
    from mtamrecommender_tpu.types import DatasetMeta

    over = {
        "model.experiment_type": name, "model.num_units": 128,
        "model.num_blocks": 3, "model.vocab_pad_multiple": 128,
        "model.compute_dtype": "bfloat16", "model.scan_unroll": 10,
        "train.steps_per_call": STEPS_PER_CALL}
    if os.environ.get("FLAT_OPT"):
        over["train.flatten_optimizer"] = True
    if os.environ.get("PACK_SMALL"):
        over["train.pack_small_leaves"] = True
    if os.environ.get("SCAN_UNROLL"):
        over["model.scan_unroll"] = int(os.environ["SCAN_UNROLL"])
    if scope != "none":
        over["model.use_pallas"] = True
        over["model.pallas_scope"] = scope
    cfg = ExperimentConfig().with_overrides(**over)
    meta = DatasetMeta(user_count=4832, item_count=3706, category_count=18,
                       max_seq_len=50)
    model = get_model(name)
    params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
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
    fn = make_superstep(model, cfg, opt, meta.item_vocab, BATCH)(
        STEPS_PER_CALL)
    rng = jax.random.PRNGKey(1)
    t_c = time.perf_counter()
    params, opt_state, stacked, rng = fn(params, opt_state, data, order,
                                         0, rng)                  # compile
    assert np.isfinite(float(np.asarray(stacked["loss"])[-1]))
    compile_s = time.perf_counter() - t_c   # compile + one warm call
    t0 = time.perf_counter()
    for c in range(calls):
        params, opt_state, stacked, rng = fn(
            params, opt_state, data, order, (c + 1) * STEPS_PER_CALL, rng)
    assert np.isfinite(float(np.asarray(stacked["loss"])[-1]))    # fetch-sync
    dt = time.perf_counter() - t0
    ms_per_call = dt / calls * 1000
    return {"model": name, "scope": scope,
            "ms_per_100_steps": round(ms_per_call, 1),
            "examples_per_s": round(BATCH * STEPS_PER_CALL * calls / dt, 1),
            "compile_s": round(compile_s, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["MTAM", "SASrec"])
    ap.add_argument("--scopes", nargs="+", default=["none", "gru", "all"])
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--tag", default="r3")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    rows = []
    for name in args.models:
        for scope in args.scopes:
            row = time_model(name, scope, args.calls)
            print(json.dumps(row), flush=True)
            rows.append(row)
            out = os.path.join("benchmarks", "results",
                               f"steps_{args.tag}.json")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                json.dump({"batch": BATCH, "steps_per_call": STEPS_PER_CALL,
                           "rows": rows}, f, indent=1)
    print("written", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
