"""Headline benchmark: MTAM train-step throughput (examples/s) at the
reference's comparison hyperparameters (SURVEY.md section 6: B=256, L=50,
d=128, 3 blocks, ml-1m-sized catalog).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no throughput (BASELINE.md) —
the denominator is an engineering estimate of the TF-1.14 single-GPU
feed-dict pipeline (~2000 examples/s at these shapes: per-step Python
collation + sess.run dispatch, train_process.py:326-336 +
Embedding/...make_feed_dic_new).  >1.0 means faster than that estimate.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_ESTIMATE_EXAMPLES_PER_SEC = 2000.0

BATCH = 256
STEPS = 100
WARMUP = 10


def main() -> None:
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
    from mtamrecommender_tpu.train.trainer import make_optimizer, make_train_step
    from mtamrecommender_tpu.types import DatasetMeta

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM", "model.num_units": 128,
        "model.num_blocks": 3, "model.vocab_pad_multiple": 128,
        "model.compute_dtype": "bfloat16"})
    meta = DatasetMeta(user_count=4832, item_count=3706, category_count=18,
                       max_seq_len=50)
    model = get_model("MTAM")
    params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    step = make_train_step(model, cfg, opt, meta.item_vocab)

    batch = _make_batch(meta, BATCH)
    rngs = [jax.random.PRNGKey(i) for i in range(STEPS + WARMUP)]

    for i in range(WARMUP):
        params, opt_state, m = step(params, opt_state, batch, rngs[i])
    jax.block_until_ready((params, m))

    t0 = time.perf_counter()
    for i in range(STEPS):
        params, opt_state, m = step(params, opt_state, batch, rngs[WARMUP + i])
    jax.block_until_ready((params, m))
    dt = time.perf_counter() - t0

    throughput = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "mtam_train_throughput",
        "value": round(throughput, 1),
        "unit": "examples/s",
        "vs_baseline": round(throughput / REFERENCE_ESTIMATE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
