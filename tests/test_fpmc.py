"""FPMC tests (reference Model/FPMC.py: standalone SBPR-SGD factorized
personalized Markov chain)."""

import numpy as np

from mtamrecommender_tpu.models import fpmc


def _toy_data(n_user=20, n_item=15, seed=0):
    """Users deterministically transition i -> (i+1) % n_item."""
    rng = np.random.RandomState(seed)
    tr, te = [], []
    for u in range(n_user):
        start = rng.randint(0, n_item)
        chain = [(start + k) % n_item for k in range(6)]
        for k in range(1, 5):
            tr.append((u, chain[k], [chain[k - 1]]))
        te.append((u, chain[5], [chain[4]]))
    return tr, te


def test_fpmc_learns_markov_transitions():
    tr, te = _toy_data()
    cfg = fpmc.FPMCConfig(n_user=20, n_item=15, n_factor=16,
                          learn_rate=0.05, regular=0.001)
    params, (acc, mrr) = fpmc.train_fpmc(cfg, tr, te, n_epoch=30,
                                         neg_batch_size=5, batch_size=64)
    # successor structure is fully deterministic: must beat chance by far
    assert acc > 0.5, acc
    assert mrr > 0.6, mrr


def test_fpmc_score_all_shape():
    import jax
    import jax.numpy as jnp
    cfg = fpmc.FPMCConfig(n_user=5, n_item=8, n_factor=4)
    params = fpmc.init_fpmc(jax.random.PRNGKey(0), cfg)
    u = jnp.asarray([0, 1])
    basket = jnp.asarray([[1, 2, 0], [3, 0, 0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    scores = fpmc.score_all(params, u, basket, mask)
    assert scores.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(scores)))
