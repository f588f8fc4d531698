"""Shared test fixtures: tiny synthetic batches with valid invariants.

The batch layout matches the reference's wire format (SURVEY.md "canonical
example tuple", Prepare/prepare_data_base.py:299-314): the last valid slot
of each row holds the mask token (item_count+1), times are hours, timelast
is the delta to the previous event and timenow is target_time - t_i.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mtamrecommender_tpu.types import Batch, DatasetMeta


def make_meta(item_count=50, user_count=20, category_count=5, max_seq_len=10):
    return DatasetMeta(user_count=user_count, item_count=item_count,
                       category_count=category_count, max_seq_len=max_seq_len)


def make_batch(meta: DatasetMeta, batch_size=4, seed=0,
               seq_lens=None) -> Batch:
    rng = np.random.RandomState(seed)
    B, L = batch_size, meta.max_seq_len
    if seq_lens is None:
        seq_lens = rng.randint(2, L + 1, B)
    seq_len = np.asarray(seq_lens, np.int32)
    items = np.zeros((B, L), np.int32)
    cats = np.zeros((B, L), np.int32)
    times = np.zeros((B, L), np.float32)
    for b in range(B):
        n = int(seq_len[b])
        items[b, :n] = rng.randint(1, meta.item_count + 1, n)
        items[b, n - 1] = meta.item_count + 1          # mask token
        cats[b, :n] = rng.randint(1, meta.category_count + 1, n)
        cats[b, n - 1] = meta.category_count + 1
        times[b, :n] = np.sort(rng.rand(n).astype(np.float32) * 100)
    tl = np.zeros((B, L), np.float32)
    tn = np.zeros((B, L), np.float32)
    pos = np.zeros((B, L), np.int32)
    for b in range(B):
        n = int(seq_len[b])
        tl[b, 1:n] = times[b, 1:n] - times[b, :n - 1]
        tn[b, :n] = times[b, n - 1] - times[b, :n]
        pos[b, :n] = np.arange(n)
    return Batch(
        user_id=jnp.asarray(rng.randint(1, meta.user_count + 1, B)
                            .astype(np.int32)),
        items=jnp.asarray(items), cats=jnp.asarray(cats),
        times=jnp.asarray(times), time_last=jnp.asarray(tl),
        time_now=jnp.asarray(tn), positions=jnp.asarray(pos),
        target_id=jnp.asarray(rng.randint(1, meta.item_count + 1, B)
                              .astype(np.int32)),
        target_cat=jnp.asarray(rng.randint(1, meta.category_count + 1, B)
                               .astype(np.int32)),
        target_time=jnp.asarray((times.max(1) + 1).astype(np.float32)),
        seq_len=jnp.asarray(seq_len),
        valid=jnp.ones((B,), jnp.float32))
