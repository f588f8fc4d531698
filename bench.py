"""Headline benchmark: MTAM train-step throughput (examples/s) at the
reference's comparison hyperparameters (SURVEY.md section 6: B=256, L=50,
d=128, 3 blocks, ml-1m-sized catalog).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the framework's fastest real training path: bf16 compute +
device-resident dataset + superstep (lax.scan of K optimizer steps per
jit call, train/trainer.make_superstep) — the configuration a production
run would use.  Falls back to the per-step jit path if the superstep is
unavailable.

vs_baseline: the reference repo publishes no throughput (BASELINE.md), so
the denominator is MEASURED, not estimated: the deliberately
reference-shaped slow path (per-step host collation + one dispatch per
step + per-step loss fetch, fp32, jnp paths — the execution shape of
train_process.py:326-336 + Embedding/...make_feed_dic_new) run on THIS
SAME chip by benchmarks/ref_shaped_bench.py.  Measured 2026-08-21:
6017.1 examples/s (benchmarks/results/ref_shaped.json).  The multiplier
is therefore pure framework architecture (device-resident data +
superstep + kernels + bf16), not hardware.
"""

from __future__ import annotations

import json
import sys
import time

# fallback if benchmarks/results/ref_shaped.json is absent (measured
# 2026-08-21 on the same chip; rerun ref_shaped_bench.py to refresh)
REFERENCE_SHAPED_EXAMPLES_PER_SEC = 6017.1


def _baseline_examples_per_s() -> float:
    """The measured denominator travels with the repo
    (benchmarks/results/ref_shaped.json) so reruns of ref_shaped_bench.py
    on other chips / after perf changes update vs_baseline without a code
    edit (ADVICE r4)."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "results", "ref_shaped.json")
    try:
        with open(path) as f:
            return float(json.load(f)["examples_per_s"])
    except Exception:
        return REFERENCE_SHAPED_EXAMPLES_PER_SEC

BATCH = 256
STEPS_PER_CALL = 400   # one jit call = one lax.scan of 400 optimizer steps
                       # (r4 measured 200 ~= 400 at the old 106.7 ms/100
                       # floor; with the round-5 scatter-free backward the
                       # per-call overhead fraction doubled, and 400 now
                       # wins: 302.0k ex/s vs 290.9-296.8k at 200)
CALLS = 3              # timed superstep calls (1200 steps total)
N_ROWS = 4096          # synthetic dataset rows resident in HBM


def _setup():
    import os

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from __graft_entry__ import _make_batch
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import make_optimizer
    from mtamrecommender_tpu.types import DatasetMeta

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM", "model.num_units": 128,
        "model.num_blocks": 3, "model.vocab_pad_multiple": 128,
        "model.compute_dtype": "bfloat16",
        # fused GRU fwd+bwd kernel wins for training; the attention and
        # readout kernels are routed by measured length thresholds and do
        # not engage at L=50 — per-family timings in docs/PERFORMANCE.md
        "model.use_pallas": True, "model.pallas_scope": "gru",
        "model.scan_unroll": 10,
        "train.steps_per_call": STEPS_PER_CALL})
    meta = DatasetMeta(user_count=4832, item_count=3706, category_count=18,
                       max_seq_len=50)
    model = get_model("MTAM")
    params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    return jax, _make_batch, cfg, meta, model, params, opt, opt_state


def _run_superstep(jax, _make_batch, cfg, meta, model, params, opt,
                   opt_state) -> float:
    import numpy as np

    from mtamrecommender_tpu.data.device_data import DeviceDataset
    from mtamrecommender_tpu.train.trainer import make_superstep

    # HBM-resident synthetic dataset at headline shapes
    big = _make_batch(meta, N_ROWS)
    data = DeviceDataset(
        user_id=big.user_id, items=big.items, cats=big.cats, times=big.times,
        time_last=big.time_last, time_now=big.time_now,
        positions=big.positions, target_id=big.target_id,
        target_cat=big.target_cat, target_time=big.target_time,
        seq_len=big.seq_len)
    order = jax.device_put(np.random.RandomState(0).randint(
        0, N_ROWS, size=(STEPS_PER_CALL * (CALLS + 1) * BATCH,)
    ).astype(np.int32))

    fn = make_superstep(model, cfg, opt, meta.item_vocab, BATCH)(
        STEPS_PER_CALL)
    rng = jax.random.PRNGKey(1)

    # warmup call: compile + one full scan.  IMPORTANT: end every timed
    # window with a VALUE FETCH that data-depends on all steps — on this
    # remote TPU backend jax.block_until_ready can return before the
    # computation finishes, silently inflating throughput.
    params, opt_state, stacked, rng = fn(params, opt_state, data, order,
                                         0, rng)
    assert np.isfinite(float(np.asarray(stacked["loss"])[-1]))

    t0 = time.perf_counter()
    for c in range(CALLS):
        params, opt_state, stacked, rng = fn(
            params, opt_state, data, order, (c + 1) * STEPS_PER_CALL, rng)
    assert np.isfinite(float(np.asarray(stacked["loss"])[-1]))
    dt = time.perf_counter() - t0
    return BATCH * STEPS_PER_CALL * CALLS / dt


def _run_per_step(jax, _make_batch, cfg, meta, model, params, opt,
                  opt_state) -> float:
    from mtamrecommender_tpu.train.trainer import make_train_step

    step = make_train_step(model, cfg, opt, meta.item_vocab)
    batch = _make_batch(meta, BATCH)
    import numpy as np
    steps, warmup = 100, 10
    rngs = [jax.random.PRNGKey(i) for i in range(steps + warmup)]
    for i in range(warmup):
        params, opt_state, m = step(params, opt_state, batch, rngs[i])
    assert np.isfinite(float(np.asarray(m["loss"])))   # fetch-synced
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, m = step(params, opt_state, batch,
                                    rngs[warmup + i])
    assert np.isfinite(float(np.asarray(m["loss"])))
    return BATCH * steps / (time.perf_counter() - t0)


def main() -> None:
    args = _setup()
    try:
        throughput = _run_superstep(*args)
    except Exception as exc:  # keep the driver contract alive no matter what
        print(f"superstep path failed ({exc!r}); per-step fallback",
              file=sys.stderr)
        throughput = _run_per_step(*args)
    print(json.dumps({
        "metric": "mtam_train_throughput",
        "value": round(throughput, 1),
        "unit": "examples/s",
        "vs_baseline": round(throughput / _baseline_examples_per_s(), 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
