"""Device-resident dataset: the whole packed example set lives in HBM and
each train step assembles its batch INSIDE the jit region.

The reference pays per-step Python collation + feed_dict transfer
(`/root/reference/Embedding/Behavior_embedding_time_aware_attention.py:146-192`,
`train_process.py:326-336`).  The host-side `data/pipeline.batch_iterator`
already removes the collation; this path also removes the per-step
host->device transfer and host involvement entirely: the only per-epoch
host work is drawing one `[N]` shuffle permutation.

Trajectory parity (pinned by tests/test_train.py::
test_device_resident_path_matches_host_path): `epoch_order` consumes the
same `np.random.RandomState` stream as the host iterator's shuffle, and
`gather_batch` reproduces `pipeline._slice_to_batch`'s padding semantics
bit-exactly — padded tail rows are all-zero with ``seq_len=2`` (gather
indices stay in range) and ``valid=0`` so they carry no loss or gradient.

At ml-1m scale the packed train set is ~80 MB — negligible against v5e
HBM; for catalogs that outgrow HBM, fall back to the host pipeline
(`Trainer(device_resident=False)`) or shard the dataset over the `data`
mesh axis.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtamrecommender_tpu.data.pipeline import PackedDataset
from mtamrecommender_tpu.types import Batch


class DeviceDataset(NamedTuple):
    """HBM-resident struct-of-arrays form of a PackedDataset (a pytree, so
    it can be a jit argument without retracing)."""

    user_id: jax.Array      # [N]   int32
    items: jax.Array        # [N,L] int32
    cats: jax.Array         # [N,L] int32
    times: jax.Array        # [N,L] float32
    time_last: jax.Array    # [N,L] float32
    time_now: jax.Array     # [N,L] float32
    positions: jax.Array    # [N,L] int32
    target_id: jax.Array    # [N]   int32
    target_cat: jax.Array   # [N]   int32
    target_time: jax.Array  # [N]   float32
    seq_len: jax.Array      # [N]   int32


def to_device(ds: PackedDataset) -> DeviceDataset:
    """One-time bulk transfer of the whole packed dataset to HBM."""
    return DeviceDataset(
        user_id=jnp.asarray(ds.user_id, jnp.int32),
        items=jnp.asarray(ds.items, jnp.int32),
        cats=jnp.asarray(ds.cats, jnp.int32),
        times=jnp.asarray(ds.times, jnp.float32),
        time_last=jnp.asarray(ds.time_last, jnp.float32),
        time_now=jnp.asarray(ds.time_now, jnp.float32),
        positions=jnp.asarray(ds.positions, jnp.int32),
        target_id=jnp.asarray(ds.target_id, jnp.int32),
        target_cat=jnp.asarray(ds.target_cat, jnp.int32),
        target_time=jnp.asarray(ds.target_time, jnp.float32),
        seq_len=jnp.asarray(ds.seq_len, jnp.int32))


def epoch_order(n: int, batch_size: int,
                np_rng: np.random.RandomState) -> Tuple[np.ndarray, int]:
    """One epoch's shuffled row order, padded to a whole number of steps.

    Consumes the SAME RandomState stream as the host iterator
    (`pipeline.batch_iterator(shuffle=True, rng=...)`: one `shuffle` of
    `arange(n)` per epoch).  Pad slots are -1 sentinels; `gather_batch`
    turns them into the host path's all-zero ``valid=0`` filler rows.
    """
    order = np.arange(n)
    np_rng.shuffle(order)
    n_steps = -(-n // batch_size)
    padded = np.full((n_steps * batch_size,), -1, np.int32)
    padded[:n] = order
    return padded, n_steps


def gather_batch(data: DeviceDataset, order: jax.Array, step_index,
                 batch_size: int) -> Batch:
    """Assemble step `step_index`'s batch on device.

    Reproduces `pipeline._slice_to_batch` exactly: real rows are gathered
    by the shuffled index, pad slots (order == -1) become all-zero rows
    with ``seq_len=2`` and ``valid=0``.
    """
    lo = jnp.asarray(step_index, jnp.int32) * batch_size
    raw = jax.lax.dynamic_slice_in_dim(order, lo, batch_size)
    valid = raw >= 0
    idx = jnp.where(valid, raw, 0)

    def row(a: jax.Array) -> jax.Array:
        g = jnp.take(a, idx, axis=0)
        mask = valid.reshape((-1,) + (1,) * (g.ndim - 1))
        return jnp.where(mask, g, jnp.zeros((), g.dtype))

    seq_len = jnp.where(valid, jnp.take(data.seq_len, idx, axis=0), 2)
    return Batch(
        user_id=row(data.user_id), items=row(data.items),
        cats=row(data.cats), times=row(data.times),
        time_last=row(data.time_last), time_now=row(data.time_now),
        positions=row(data.positions), target_id=row(data.target_id),
        target_cat=row(data.target_cat), target_time=row(data.target_time),
        seq_len=seq_len.astype(jnp.int32),
        valid=valid.astype(jnp.float32))
