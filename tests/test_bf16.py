"""bfloat16 mixed-precision path: fp32 master params, bf16 apply,
fp32 loss (TPU-native addition; the reference is fp32-only TF 1.14)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtamrecommender_tpu.config import ExperimentConfig
from mtamrecommender_tpu.models import base as base_m
from mtamrecommender_tpu.models.registry import get_model

from helpers import make_batch, make_meta

BASE = {"model.num_units": 16, "model.num_blocks": 2, "model.dropout": 0.0}


@pytest.mark.parametrize("name", ["MTAM", "SASrec", "NARM", "bpr"])
def test_bf16_loss_close_to_f32_and_grads_f32(name):
    meta = make_meta(item_count=50, max_seq_len=10)
    batch = make_batch(meta, batch_size=4, seed=0)
    cfg32 = ExperimentConfig().with_overrides(**BASE).model
    cfg16 = ExperimentConfig().with_overrides(
        **{**BASE, "model.compute_dtype": "bfloat16"}).model
    mdef = get_model(name)
    params = mdef.init(jax.random.PRNGKey(0), cfg32, meta)
    r = jax.random.PRNGKey(1)
    l32 = float(base_m.compute_loss(mdef, params, cfg32, batch, True, r)["loss"])
    l16 = float(base_m.compute_loss(mdef, params, cfg16, batch, True, r)["loss"])
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.05

    grads = jax.grad(lambda p: base_m.compute_loss(
        mdef, p, cfg16, batch, True, r)["loss"])(params)
    for g in jax.tree.leaves(grads):
        assert g.dtype == jnp.float32  # master grads stay fp32
    gnorm = float(jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0

    scores = base_m.scores_for_eval(mdef, params, cfg16, batch,
                                    meta.item_vocab)
    assert scores.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(scores)))


def test_bf16_with_pallas_kernels():
    meta = make_meta(item_count=50, max_seq_len=10)
    batch = make_batch(meta, batch_size=4, seed=0)
    cfg = ExperimentConfig().with_overrides(
        **{**BASE, "model.compute_dtype": "bfloat16",
           "model.use_pallas": True}).model
    mdef = get_model("MTAM")
    params = mdef.init(jax.random.PRNGKey(0), cfg, meta)
    loss = float(base_m.compute_loss(mdef, params, cfg, batch, True,
                                     jax.random.PRNGKey(1))["loss"])
    assert np.isfinite(loss)


def test_bf16_pallas_grads_finite():
    """bf16 + pallas kernels: the custom-VJP cotangent dtypes must line up
    (kernel emits f32, reference twin emits bf16)."""
    meta = make_meta(item_count=50, max_seq_len=10)
    batch = make_batch(meta, batch_size=4, seed=0)
    cfg = ExperimentConfig().with_overrides(
        **{**BASE, "model.compute_dtype": "bfloat16",
           "model.use_pallas": True}).model
    mdef = get_model("MTAM")
    params = mdef.init(jax.random.PRNGKey(0), cfg, meta)
    grads = jax.grad(lambda p: base_m.compute_loss(
        mdef, p, cfg, batch, True, jax.random.PRNGKey(1))["loss"])(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
