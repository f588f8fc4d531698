"""Core data contracts.

The reference's wire format is a per-example 9-tuple
(`/root/reference/Prepare/prepare_data_base.py:299-314`, README.md:17-21):

  (user_id, item_list, category_list, time_list, timelast_list,
   timenow_list, position_list, [target_id, target_category, target_time],
   seq_length)

padded per-batch on the host into a feed_dict
(`Embedding/Behavior_embedding_time_aware_attention.py:146-192`).  The
TPU-native contract is the same information as a fixed-shape struct of
arrays (`Batch`), built once on the host and shipped to the device whole —
no per-step Python collation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Batch(NamedTuple):
    """A fixed-shape packed batch.  L == DataConfig.max_seq_len.

    The final valid position of every row (index ``seq_len-1``) holds the
    mask token (item_count+1 / category_count+1), exactly like the
    reference's appended mask ids (prepare_data_base.py:283-285).
    """

    user_id: jax.Array      # [B]   int32
    items: jax.Array        # [B,L] int32, zero-padded past seq_len
    cats: jax.Array         # [B,L] int32
    times: jax.Array        # [B,L] float32 (hours)
    time_last: jax.Array    # [B,L] float32  Δt to previous event
    time_now: jax.Array     # [B,L] float32  target_time - t_i
    positions: jax.Array    # [B,L] int32
    target_id: jax.Array    # [B]   int32
    target_cat: jax.Array   # [B]   int32
    target_time: jax.Array  # [B]   float32 (hours)
    seq_len: jax.Array      # [B]   int32 (includes the mask-token slot)
    valid: jax.Array        # [B]   float32 1.0 for real rows, 0.0 for padding rows

    @property
    def batch_size(self) -> int:
        return self.user_id.shape[0]

    @property
    def max_len(self) -> int:
        return self.items.shape[1]


class DatasetMeta(NamedTuple):
    """Vocabulary sizes (label-encoded); mirrors parameters.pkl
    (prepare_data_base.py:204-211)."""

    user_count: int
    item_count: int
    category_count: int
    max_seq_len: int

    @property
    def item_vocab(self) -> int:
        # +3 vocab slack rows for padding/mask/reserved ids, matching the
        # reference tables (Embedding/...:62-91) and the one-hot depth
        # item_count+3 (Model/base_model.py:319-320).
        return self.item_count + 3

    @property
    def user_vocab(self) -> int:
        return self.user_count + 3

    @property
    def category_vocab(self) -> int:
        return self.category_count + 3

    @property
    def position_vocab(self) -> int:
        return self.max_seq_len + 3


def batch_from_numpy(arrays: dict) -> Batch:
    return Batch(
        user_id=jnp.asarray(arrays["user_id"], jnp.int32),
        items=jnp.asarray(arrays["items"], jnp.int32),
        cats=jnp.asarray(arrays["cats"], jnp.int32),
        times=jnp.asarray(arrays["times"], jnp.float32),
        time_last=jnp.asarray(arrays["time_last"], jnp.float32),
        time_now=jnp.asarray(arrays["time_now"], jnp.float32),
        positions=jnp.asarray(arrays["positions"], jnp.int32),
        target_id=jnp.asarray(arrays["target_id"], jnp.int32),
        target_cat=jnp.asarray(arrays["target_cat"], jnp.int32),
        target_time=jnp.asarray(arrays["target_time"], jnp.float32),
        seq_len=jnp.asarray(arrays["seq_len"], jnp.int32),
        valid=jnp.asarray(arrays["valid"], jnp.float32),
    )


def zeros_batch(batch_size: int, max_len: int) -> Batch:
    """An all-padding batch, useful for shape probing and compile warmup."""
    z_i = np.zeros((batch_size, max_len), np.int32)
    z_f = np.zeros((batch_size, max_len), np.float32)
    return Batch(
        user_id=jnp.zeros((batch_size,), jnp.int32),
        items=jnp.asarray(z_i), cats=jnp.asarray(z_i),
        times=jnp.asarray(z_f), time_last=jnp.asarray(z_f),
        time_now=jnp.asarray(z_f), positions=jnp.asarray(z_i),
        target_id=jnp.zeros((batch_size,), jnp.int32),
        target_cat=jnp.zeros((batch_size,), jnp.int32),
        target_time=jnp.zeros((batch_size,), jnp.float32),
        seq_len=jnp.ones((batch_size,), jnp.int32) * 2,
        valid=jnp.zeros((batch_size,), jnp.float32),
    )
