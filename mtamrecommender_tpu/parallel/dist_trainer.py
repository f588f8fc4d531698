"""Mesh-aware train/eval steps: one jit region, explicit shardings.

The single-device trainer (train/trainer.py) composes with these by
passing ``mesh``-annotated params/batches; XLA's SPMD partitioner emits
the DP psum for gradients and the EP/TP collectives for sharded tables.
Multi-host entry is `jax.distributed.initialize` (initialize_distributed)
— the XLA collective runtime over ICI/DCN is the "NCCL" here
(SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import optax

from mtamrecommender_tpu.config import ExperimentConfig
from mtamrecommender_tpu.models.base import ModelDef, compute_loss
from mtamrecommender_tpu.parallel import embedding_shard as engine_lib
from mtamrecommender_tpu.parallel import sharding as shard_lib
from mtamrecommender_tpu.train import evaluate as eval_lib
from mtamrecommender_tpu.types import Batch


def _engine_scope(mesh, cfg: ExperimentConfig):
    """The trace-time routing scopes for this experiment, entered while
    TRACING each sharded step below:

      * embedding-lookup engine ('a2a'/'psum', MeshConfig.embedding_engine)
        routes the behavior-embedding table lookups through an explicit
        shard_map exchange; 'gspmd' leaves them to the partitioner;
      * key-axis context parallelism (MeshConfig.context_parallel) shards
        the time-aware attention's key axis over the model axis
        (parallel/context_parallel.py; scalar gate required)."""
    from contextlib import ExitStack

    from mtamrecommender_tpu.parallel import context_parallel as cp_lib

    engine = cfg.mesh.embedding_engine if cfg.mesh.shard_embeddings \
        else "gspmd"
    stack = ExitStack()
    stack.enter_context(
        engine_lib.engine_scope(mesh, engine, cfg.mesh.model_axis_name,
                                cfg.mesh.data_axis_name))
    if cfg.mesh.context_parallel:
        stack.enter_context(
            cp_lib.cp_scope(mesh, cfg.mesh.model_axis_name,
                            cfg.mesh.data_axis_name))
    return stack


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host process-group bring-up (no-op on a single host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_sharded_train_step(model: ModelDef, cfg: ExperimentConfig,
                            optimizer: optax.GradientTransformation,
                            mesh, params_template: Any,
                            valid_vocab: int = None):
    """jit-compiled (params, opt_state, batch, rng) -> (params', opt', metrics)
    with input/output shardings fixed so the compiled executable is pure
    SPMD — no host-driven resharding between steps."""
    p_shard = shard_lib.param_shardings(mesh, cfg.mesh, params_template)
    o_shard = shard_lib.replicated_tree(
        mesh, jax.eval_shape(optimizer.init, params_template))
    b_shard = shard_lib.batch_shardings(mesh, cfg.mesh)
    rep = shard_lib.replicated_tree(mesh, 0)

    def step(params, opt_state, batch: Batch, rng):
        def loss_fn(p):
            m = compute_loss(model, p, cfg.model, batch, True, rng,
                             valid_vocab)
            return m["loss"], m

        with _engine_scope(mesh, cfg):   # trace-time routing
            (_, metrics), grads = jax.value_and_grad(loss_fn,
                                                     has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, metrics

    metrics_shape = {"loss": rep, "ce": rep, "l2": rep}
    return jax.jit(
        step,
        in_shardings=(p_shard, o_shard, b_shard, rep),
        out_shardings=(p_shard, o_shard, metrics_shape),
        donate_argnums=(0, 1),
    )


def make_sharded_superstep(model: ModelDef, cfg: ExperimentConfig,
                           optimizer: optax.GradientTransformation,
                           mesh, params_template: Any, valid_vocab: int,
                           batch_size: int):
    """Sharded twin of train/trainer.make_superstep: `lax.scan` of K
    optimizer steps per jit call over a mesh-replicated device-resident
    dataset, with the per-step gathered batch constrained to the DP
    sharding so XLA partitions every step SPMD (grad psum over 'data',
    EP/TP collectives for sharded tables).  Same rng split chain and
    gather as the single-device superstep — trajectory parity pinned by
    tests/test_parallel.py."""
    import jax.numpy as jnp

    from mtamrecommender_tpu.data.device_data import gather_batch

    p_shard = shard_lib.param_shardings(mesh, cfg.mesh, params_template)
    o_shard = shard_lib.replicated_tree(
        mesh, jax.eval_shape(optimizer.init, params_template))
    b_shard = shard_lib.batch_shardings(mesh, cfg.mesh)
    rep = shard_lib.replicated_tree(mesh, 0)

    def build(n_sub: int):
        def superstep(params, opt_state, data, order, start_step, rng):
            def body(carry, k):
                params, opt_state, rng = carry
                keys = jax.random.split(rng)
                step_rng, rng = keys[0], keys[1]
                batch = gather_batch(data, order, start_step + k, batch_size)
                batch = jax.lax.with_sharding_constraint(batch, b_shard)

                def loss_fn(p):
                    m = compute_loss(model, p, cfg.model, batch, True,
                                     step_rng, valid_vocab)
                    return m["loss"], m

                with _engine_scope(mesh, cfg):   # trace-time routing
                    (_, metrics), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params)
                updates, new_opt = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                return (new_params, new_opt, rng), metrics

            (params, opt_state, rng), stacked = jax.lax.scan(
                body, (params, opt_state, rng),
                jnp.arange(n_sub, dtype=jnp.int32))
            return params, opt_state, stacked, rng

        metrics_shard = {"loss": rep, "ce": rep, "l2": rep}
        return jax.jit(
            superstep,
            in_shardings=(p_shard, o_shard, None, rep, None, rep),
            out_shardings=(p_shard, o_shard, metrics_shard, rep),
            donate_argnums=(0, 1),
        )

    return build


def make_sharded_eval_step(model: ModelDef, cfg: ExperimentConfig, mesh,
                           params_template: Any,
                           ks: Sequence[int] = eval_lib.TOPK,
                           valid_vocab: int = None):
    """Full-catalog eval under the mesh: scores come out vocab-parallel
    when tables are sharded; the rank reduction psums across the model
    axis inside the same jit region."""
    p_shard = shard_lib.param_shardings(mesh, cfg.mesh, params_template)
    b_shard = shard_lib.batch_shardings(mesh, cfg.mesh)
    rep = shard_lib.replicated_tree(mesh, 0)

    def step(params, batch: Batch) -> Dict[str, jax.Array]:
        from mtamrecommender_tpu.models.base import scores_for_eval
        with _engine_scope(mesh, cfg):   # trace-time routing
            scores = scores_for_eval(model, params, cfg.model, batch,
                                     valid_vocab)
        return eval_lib.topk_metrics(scores, batch.target_id, batch.valid, ks)

    out_shard = {f"{m}@{k}": rep for k in ks for m in ("hr", "ndcg")}
    return jax.jit(step, in_shardings=(p_shard, b_shard),
                   out_shardings=out_shard)
