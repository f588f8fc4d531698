"""FPMC: factorized personalized Markov chain.

Port of the standalone numpy implementation at
`/root/reference/Model/FPMC.py` to JAX.  Scoring keeps the reference math
exactly (compute_x, FPMC.py:36-40):

    x(u, i | basket) = VUI[u] . VIU[i] + mean_{l in basket} VIL[i] . VLI[l]

The reference trains it with per-example SBPR-SGD (learn_epoch:70-98);
here the same SBPR objective is optimized as a batched, jit-compiled BPR
step over (user, pos, negs, basket) tuples — identical gradient direction
in expectation, but it runs on the MXU instead of a python loop.
Evaluation reproduces `evaluation` (FPMC.py:47-68): top-1 accuracy + MRR.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


class FPMCConfig(NamedTuple):
    n_user: int
    n_item: int
    n_factor: int = 32
    learn_rate: float = 0.01
    regular: float = 0.001
    init_std: float = 0.01


def init_fpmc(rng: jax.Array, cfg: FPMCConfig) -> Params:
    ks = jax.random.split(rng, 4)
    std = cfg.init_std
    return {
        "VUI": std * jax.random.normal(ks[0], (cfg.n_user, cfg.n_factor)),
        "VIU": std * jax.random.normal(ks[1], (cfg.n_item, cfg.n_factor)),
        "VIL": std * jax.random.normal(ks[2], (cfg.n_item, cfg.n_factor)),
        "VLI": std * jax.random.normal(ks[3], (cfg.n_item, cfg.n_factor)),
    }


def score_all(params: Params, u: jax.Array, basket: jax.Array,
              basket_mask: jax.Array) -> jax.Array:
    """compute_x_batch (FPMC.py:42-45) for all items: [B, n_item]."""
    former = jnp.matmul(jnp.take(params["VUI"], u, axis=0), params["VIU"].T)
    vli = jnp.take(params["VLI"], basket, axis=0)          # [B, K, f]
    denom = jnp.maximum(jnp.sum(basket_mask, axis=1, keepdims=True), 1.0)
    mean_vli = jnp.sum(vli * basket_mask[:, :, None], axis=1) / denom
    latter = jnp.matmul(mean_vli, params["VIL"].T)
    return former + latter


def _sbpr_loss(params: Params, u, i, j, basket, basket_mask, regular):
    def x(item):
        vui = jnp.take(params["VUI"], u, axis=0)
        viu = jnp.take(params["VIU"], item, axis=0)
        vil = jnp.take(params["VIL"], item, axis=0)
        vli = jnp.take(params["VLI"], basket, axis=0)
        denom = jnp.maximum(jnp.sum(basket_mask, axis=1), 1.0)
        acc = jnp.sum(jnp.einsum("bf,bkf->bk", vil, vli) * basket_mask,
                      axis=1) / denom
        return jnp.sum(vui * viu, axis=1) + acc

    diff = x(i) - x(j)
    rank_loss = -jnp.mean(jnp.log(jax.nn.sigmoid(diff)))
    reg = regular * sum(jnp.sum(jnp.square(p)) for p in params.values())
    return rank_loss + reg


@partial(jax.jit, static_argnames=("learn_rate", "regular"))
def sbpr_step(params: Params, u, i, j, basket, basket_mask, *,
              learn_rate: float, regular: float) -> Tuple[Params, jax.Array]:
    loss, grads = jax.value_and_grad(_sbpr_loss)(params, u, i, j, basket,
                                                 basket_mask, regular)
    new_params = jax.tree_util.tree_map(
        lambda p, g: p - learn_rate * g, params, grads)
    return new_params, loss


def evaluate(params: Params, data: list) -> Tuple[float, float]:
    """FPMC.evaluation (FPMC.py:47-68): top-1 accuracy + MRR over
    (u, i, basket) tuples."""
    correct, rr = 0, []
    vui_viu = np.asarray(jnp.matmul(params["VUI"], params["VIU"].T))
    vil_vli = np.asarray(jnp.matmul(params["VIL"], params["VLI"].T))
    for (u, i, b_tm1) in data:
        scores = vui_viu[u] + np.mean(vil_vli[:, b_tm1], axis=1)
        if i == int(scores.argmax()):
            correct += 1
        rank = int(np.sum(scores > scores[i])) + 1
        rr.append(1.0 / rank)
    if not rr:
        return 0.0, 0.0
    return correct / len(rr), float(sum(rr) / len(rr))


def train_fpmc(cfg: FPMCConfig, tr_data: list, te_data=None, *,
               n_epoch: int = 10, neg_batch_size: int = 10,
               batch_size: int = 256, basket_cap: int = 50,
               seed: int = 1234) -> Tuple[Params, Tuple[float, float]]:
    """learnSBPR_FPMC (FPMC.py:100-127) with batched jit steps.

    tr_data: list of (u, i, basket) tuples like the reference's.
    """
    rng = np.random.RandomState(seed)
    params = init_fpmc(jax.random.PRNGKey(seed), cfg)
    n = len(tr_data)
    for _ in range(n_epoch):
        order = rng.randint(0, n, size=n)  # random.choice with replacement
        for lo in range(0, n, batch_size):
            sel = order[lo:lo + batch_size]
            if len(sel) == 0:
                continue
            u = np.array([tr_data[k][0] for k in sel], np.int32)
            i = np.array([tr_data[k][1] for k in sel], np.int32)
            basket = np.zeros((len(sel), basket_cap), np.int32)
            mask = np.zeros((len(sel), basket_cap), np.float32)
            for r, k in enumerate(sel):
                b = tr_data[k][2][:basket_cap]
                basket[r, :len(b)] = b
                mask[r, :len(b)] = 1.0
            for _neg in range(neg_batch_size):
                j = rng.randint(0, cfg.n_item, size=len(sel)).astype(np.int32)
                params, _ = sbpr_step(params, u, i, j, basket, mask,
                                      learn_rate=cfg.learn_rate,
                                      regular=cfg.regular)
    result = evaluate(params, te_data) if te_data is not None else (0.0, 0.0)
    return params, result
