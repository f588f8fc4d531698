"""Device-mesh construction for pjit/GSPMD.

The reference has no parallelism at all — one tf.Session pinned to one
GPU (`/root/reference/train_process.py:136-152`) and process-level fan-out
(`run_server.py:46-100`).  The TPU-native replacement is a 2-D
`jax.sharding.Mesh`:

  * ``data`` axis — batch sharding (DP); gradients are all-reduced by XLA
    over ICI.
  * ``model`` axis — row-sharded embedding tables (EP) and vocab-parallel
    logits (TP for the output projection `emb @ item_table^T`).

Axis order puts ``model`` innermost so its collectives ride the
fastest ICI links on real slices (scaling-book recipe: mesh-axis order ==
physical-ring order).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtamrecommender_tpu.config import MeshConfig


def build_mesh(cfg: MeshConfig,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    model = max(1, cfg.model_axis_size)
    if n % model != 0:
        raise ValueError(f"model_axis_size {model} does not divide "
                         f"device count {n}")
    data = cfg.data_axis_size if cfg.data_axis_size > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != device count {n}")
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, (cfg.data_axis_name, cfg.model_axis_name))


def data_sharding(mesh: Mesh, cfg: MeshConfig) -> NamedSharding:
    """Batch arrays: leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(cfg.data_axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh, cfg: MeshConfig) -> NamedSharding:
    """Embedding tables: rows over the model axis (EP).  XLA turns
    lookups into gather + collective traffic and the output projection
    into vocab-parallel matmul + psum — the GSPMD equivalent of the
    north star's all-to-all ID exchange."""
    if cfg.shard_embeddings and mesh.shape[cfg.model_axis_name] > 1:
        return NamedSharding(mesh, P(cfg.model_axis_name, None))
    return replicated(mesh)
