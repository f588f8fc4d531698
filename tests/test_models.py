"""Model-zoo tests: every registry entry builds, runs forward+grad with a
finite loss, scores the full catalog, and ignores padded filler rows.

Mirrors the zoo dispatched at /root/reference/train_process.py:164-218.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtamrecommender_tpu.config import ExperimentConfig
from mtamrecommender_tpu.models import base as base_m
from mtamrecommender_tpu.models.registry import MODEL_REGISTRY, get_model

from helpers import make_batch, make_meta

ALL_MODELS = sorted(MODEL_REGISTRY)


@pytest.fixture(scope="module")
def meta():
    return make_meta(item_count=50, user_count=20, category_count=5,
                     max_seq_len=10)


@pytest.fixture(scope="module")
def batch(meta):
    return make_batch(meta, batch_size=4, seed=0, seq_lens=[5, 8, 10, 3])


@pytest.fixture(scope="module")
def cfg():
    return ExperimentConfig().with_overrides(
        **{"model.num_units": 16, "model.num_blocks": 2}).model


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_grad_eval(name, cfg, meta, batch):
    mdef = get_model(name)
    params = mdef.init(jax.random.PRNGKey(0), cfg, meta)
    rng = jax.random.PRNGKey(1)
    metrics = base_m.compute_loss(mdef, params, cfg, batch, True, rng)
    assert np.isfinite(float(metrics["loss"]))

    grads = jax.grad(lambda p: base_m.compute_loss(
        mdef, p, cfg, batch, True, rng)["loss"])(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(x * x)
                               for x in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0.0

    scores = base_m.scores_for_eval(mdef, params, cfg, batch)
    assert scores.shape == (batch.batch_size, meta.item_vocab)
    assert np.all(np.isfinite(np.asarray(scores)))


@pytest.mark.parametrize("name", ["MTAM", "SASrec", "NARM", "Gru4Rec",
                                  "STAMP", "Ti_Self_Attention_Model"])
def test_padding_row_invariance(name, cfg, meta):
    """Clobbering a padded filler row (valid=0) must not change the loss:
    the jit step processes fixed-shape batches where the tail of the last
    batch is garbage by construction (data/pipeline.py:_slice_to_batch)."""
    mdef = get_model(name)
    params = mdef.init(jax.random.PRNGKey(0), cfg, meta)
    rng = jax.random.PRNGKey(1)
    b1 = make_batch(meta, batch_size=4, seed=0, seq_lens=[5, 8, 10, 3])
    b1 = b1._replace(valid=jnp.asarray([1.0, 1.0, 1.0, 0.0]))
    loss1 = float(base_m.compute_loss(mdef, params, cfg, b1, False, rng)["loss"])
    # rewrite row 3 entirely (different items/times/target)
    alt = make_batch(meta, batch_size=4, seed=99, seq_lens=[5, 8, 10, 7])
    b2 = b1._replace(
        items=b1.items.at[3].set(alt.items[3]),
        cats=b1.cats.at[3].set(alt.cats[3]),
        times=b1.times.at[3].set(alt.times[3]),
        time_last=b1.time_last.at[3].set(alt.time_last[3]),
        time_now=b1.time_now.at[3].set(alt.time_now[3]),
        positions=b1.positions.at[3].set(alt.positions[3]),
        seq_len=b1.seq_len.at[3].set(alt.seq_len[3]),
        target_id=b1.target_id.at[3].set(alt.target_id[3]))
    loss2 = float(base_m.compute_loss(mdef, params, cfg, b2, False, rng)["loss"])
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)


def test_concat_models_emit_2d_predict_emb(cfg, meta, batch):
    for name in ("NARM", "MTAM_hybird"):
        mdef = get_model(name)
        params = mdef.init(jax.random.PRNGKey(0), cfg, meta)
        out = mdef.apply(params, cfg, batch, train=False, rng=None)
        assert out.predict_emb.shape == (batch.batch_size, 2 * cfg.num_units)
        assert "output_w" in params and \
            params["output_w"].shape == (2 * cfg.num_units, cfg.num_units)


def test_dropout_changes_train_loss_not_eval(cfg, meta, batch):
    mdef = get_model("SASrec")
    params = mdef.init(jax.random.PRNGKey(0), cfg, meta)
    r1, r2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    l_tr1 = float(base_m.compute_loss(mdef, params, cfg, batch, True, r1)["loss"])
    l_tr2 = float(base_m.compute_loss(mdef, params, cfg, batch, True, r2)["loss"])
    assert l_tr1 != l_tr2  # dropout active under train=True
    l_ev1 = float(base_m.compute_loss(mdef, params, cfg, batch, False, r1)["loss"])
    l_ev2 = float(base_m.compute_loss(mdef, params, cfg, batch, False, r2)["loss"])
    np.testing.assert_allclose(l_ev1, l_ev2, rtol=1e-6)


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        get_model("nope")


def test_mtam_jit_compiles_once(cfg, meta):
    """The train step must not recompile across batches of the same shape."""
    mdef = get_model("MTAM")
    params = mdef.init(jax.random.PRNGKey(0), cfg, meta)

    @jax.jit
    def step(p, b, r):
        return base_m.compute_loss(mdef, p, cfg, b, True, r)["loss"]

    b1 = make_batch(meta, batch_size=4, seed=0)
    b2 = make_batch(meta, batch_size=4, seed=5)
    step(params, b1, jax.random.PRNGKey(0))
    n_before = step._cache_size()
    step(params, b2, jax.random.PRNGKey(1))
    assert step._cache_size() == n_before
