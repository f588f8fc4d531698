"""Measure the REFERENCE-SHAPED slow path — the denominator for
bench.py's vs_baseline.

The reference repo publishes no throughput and its TF-1.14 stack cannot
run here, so the honest denominator is a deliberately reference-faithful
execution shape of OUR model on the SAME chip (every speedup reported is
then framework-architecture, not hardware):

  * per-step HOST collation — each batch is padded/packed from the raw
    python example tuples on the host, exactly what
    `Embedding/Behavior_embedding_time_aware_attention.make_feed_dic_new`
    (:146-192) does per step with python loops;
  * one dispatch per optimizer step (feed_dict + sess.run round trip,
    `/root/reference/train_process.py:326-336`) — host->device transfer
    of the batch every step, no device-resident data, no superstep;
  * fp32 end to end (TF 1.14 default), jnp paths (no Pallas), B=256,
    MTAM at the comparison hyperparameters (SURVEY.md section 6).

Every timed window ends with a host fetch of the step loss, which both
matches the reference (sess.run returns the loss to python every step)
and gives honest timing on this backend (docs/PERFORMANCE.md).

Usage:  python benchmarks/ref_shaped_bench.py [--steps 200]
Writes: benchmarks/results/ref_shaped.json  (examples/s to paste into
        bench.py's REFERENCE_SHAPED_EXAMPLES_PER_SEC)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=20)
    args = ap.parse_args()

    import jax
    import numpy as np

    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.ingest import load_synthetic
    from mtamrecommender_tpu.data.pipeline import pack_examples
    from mtamrecommender_tpu.data.prepare import prepare_examples
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import make_optimizer, make_train_step

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM", "model.num_units": 128,
        "model.num_blocks": 3,
        # reference shape: fp32, no kernels, no vocab padding tricks
        "model.compute_dtype": "float32", "model.use_pallas": False,
        "train.steps_per_call": 1})
    dcfg = cfg.data.__class__(
        dataset="synthetic", synth_users=6040, synth_items=3706,
        synth_categories=18, synth_events_per_user=40, max_seq_len=50,
        user_count_limit=10_000_000)
    prepared = prepare_examples(load_synthetic(dcfg), dcfg)
    examples = prepared.train_set
    meta = prepared.meta
    model = get_model("MTAM")
    params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    step = make_train_step(model, cfg, opt, meta.item_vocab)

    rng = np.random.RandomState(0)
    order = rng.permutation(len(examples))

    from mtamrecommender_tpu.data.pipeline import batch_iterator

    def batch_at(i: int):
        """The make_feed_dic_new analogue: python padding/packing of one
        batch of raw example tuples into fixed-shape arrays, every step."""
        lo = (i * BATCH) % max(len(examples) - BATCH, 1)
        packed = pack_examples([examples[j] for j in order[lo:lo + BATCH]],
                               meta)
        _, batch = next(batch_iterator(packed, BATCH))
        return batch

    key = jax.random.PRNGKey(1)
    for i in range(args.warmup):
        key, sub = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch_at(i), sub)
        loss = float(np.asarray(m["loss"]))   # per-step fetch, like sess.run
    assert np.isfinite(loss)

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, m = step(params, opt_state,
                                    batch_at(args.warmup + i), sub)
        loss = float(np.asarray(m["loss"]))   # per-step fetch
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)

    ex_s = BATCH * args.steps / dt
    out = {"metric": "ref_shaped_train_throughput",
           "examples_per_s": round(ex_s, 1),
           "ms_per_step": round(dt / args.steps * 1000, 3),
           "batch": BATCH, "steps": args.steps,
           "shape": "per-step host collation + per-step dispatch + "
                    "per-step loss fetch, fp32, jnp paths",
           "backend": jax.default_backend()}
    path = os.path.join("benchmarks", "results", "ref_shaped.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
