"""Sharding rules: map parameter / batch pytrees to NamedShardings.

GSPMD style: we annotate the placement of inputs and outputs and let
XLA:TPU insert the collectives (all-gather for sharded-table lookups,
psum for DP gradient reduction, reduce-scatter under vocab-parallel
logits).  This replaces nothing in the reference — it had no multi-device
path (SURVEY.md section 2.6) — and implements the north star's sharded
embedding engine + DP dense towers.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtamrecommender_tpu.config import MeshConfig
from mtamrecommender_tpu.parallel import mesh as mesh_lib
from mtamrecommender_tpu.types import Batch

# parameter-name suffixes that hold per-row vocabulary state
_TABLE_KEYS = ("user_table", "item_table", "cat_table", "pos_table",
               "item_bias")


def param_shardings(mesh: Mesh, cfg: MeshConfig, params: Any) -> Any:
    """Embedding tables row-sharded over the model axis; every dense-tower
    parameter replicated (they are tiny at d=128 — DP is the right call,
    SURVEY.md section 2.6 'TP not needed')."""
    table = mesh_lib.table_sharding(mesh, cfg)
    rep = mesh_lib.replicated(mesh)

    def rule(path, leaf):
        name = path[-1].key if path else ""
        if name in _TABLE_KEYS and getattr(leaf, "ndim", 0) >= 1:
            return table
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_shardings(mesh: Mesh, cfg: MeshConfig) -> Batch:
    """Every Batch field is batch-major: shard dim 0 over the data axis."""
    ds = mesh_lib.data_sharding(mesh, cfg)
    return jax.tree.map(lambda _: ds, Batch(*([0] * len(Batch._fields))))


def replicated_tree(mesh: Mesh, tree: Any) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: rep, tree)


def place_params(mesh: Mesh, cfg: MeshConfig, params: Any) -> Any:
    """Device-put a host-initialized param tree onto its shardings."""
    shardings = param_shardings(mesh, cfg, params)
    return jax.tree.map(jax.device_put, params, shardings)


def place_batch(mesh: Mesh, cfg: MeshConfig, batch: Batch) -> Batch:
    shardings = batch_shardings(mesh, cfg)
    return jax.tree.map(jax.device_put, batch, shardings)
