"""Scalar-Δt gate mode + key-axis context parallelism (SURVEY.md §5.7,
VERDICT.md r2 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtamrecommender_tpu.config import ExperimentConfig, MeshConfig
from mtamrecommender_tpu.models.base import compute_loss
from mtamrecommender_tpu.models.registry import get_model
from mtamrecommender_tpu.ops import attention as att
from mtamrecommender_tpu.parallel import context_parallel as cp
from mtamrecommender_tpu.parallel import sharding as shard_lib
from mtamrecommender_tpu.parallel.mesh import build_mesh

from helpers import make_batch, make_meta


def _inputs(B, Tq, Tk, C, seed=0):
    r = np.random.RandomState(seed)
    return (jnp.asarray(r.randn(B, Tq, C).astype(np.float32)),
            jnp.asarray(r.randn(B, Tk, C).astype(np.float32)),
            jnp.asarray(r.randint(1, Tk + 1, B).astype(np.int32)),
            jnp.asarray(np.ones(B, np.int32) * Tq),
            jnp.asarray((r.rand(B, Tq) * 400).astype(np.float32)),
            jnp.asarray((r.rand(B, Tk) * 400).astype(np.float32)))


def test_scalar_gate_generalizes_over_length():
    """Scalar gate params are length-free: one init serves any [Tq,Tk];
    the positional init is pinned to its configured shape."""
    C = 8
    p_scalar = att.init_time_mha_block(jax.random.PRNGKey(0), C, 1, 10,
                                       gate_mode="scalar")
    assert p_scalar["time_input_w1"].shape == ()
    for Tk in (10, 37, 128):
        q, k, kl, ql, tq, tk = _inputs(4, 1, Tk, C, seed=Tk)
        out, _ = att.time_aware_multihead_attention(
            p_scalar, q, k, kl, ql, tq, tk, num_heads=1, train=False)
        assert out.shape == (4, 1, C)
        assert np.all(np.isfinite(np.asarray(out)))
    with pytest.raises(ValueError, match="unknown time_gate_mode"):
        att.init_time_mha_block(jax.random.PRNGKey(0), C, 1, 10,
                                gate_mode="bogus")


def test_scalar_gate_modulates_by_interval():
    """The scalar gate still reads Δt: forcing a large decay weight
    changes scores when intervals change (same content)."""
    C = 8
    p = att.init_time_mha_block(jax.random.PRNGKey(1), C, 1, 6,
                                gate_mode="scalar")
    p = dict(p)
    p["time_output_w1"] = jnp.asarray(4.0)   # lean on the interval term
    q, k, kl, ql, tq, _ = _inputs(3, 1, 6, C, seed=2)
    near = jnp.zeros((3, 6)) + tq[:, :1]             # Δt = 0
    far = near - 500.0                               # Δt = 500h
    out_near, _ = att.time_aware_multihead_attention(
        p, q, k, kl, ql, tq, near, num_heads=1, train=False)
    out_far, _ = att.time_aware_multihead_attention(
        p, q, k, kl, ql, tq, far, num_heads=1, train=False)
    assert not np.allclose(np.asarray(out_near), np.asarray(out_far))


def test_scalar_gate_convergence_parity_l50():
    """MTAM with the scalar gate trains to the same ballpark as the
    faithful positional gate at the reference length (L=50 semantics,
    scaled down): both must clearly beat their init."""
    from mtamrecommender_tpu.data.ingest import load_synthetic_sessions
    from mtamrecommender_tpu.data.pipeline import batch_iterator, pack_examples
    from mtamrecommender_tpu.data.prepare import prepare_examples
    from mtamrecommender_tpu.config import DataConfig
    from mtamrecommender_tpu.train.trainer import Trainer

    dcfg = DataConfig(dataset="synthetic_sessions", synth_users=80,
                      synth_items=50, synth_categories=5,
                      synth_events_per_user=14, max_seq_len=12,
                      user_count_limit=10_000)
    prepared = prepare_examples(load_synthetic_sessions(dcfg), dcfg)
    train = pack_examples(prepared.train_set, prepared.meta)
    test = pack_examples(prepared.test_set, prepared.meta)
    finals = {}
    for mode in ("positional", "scalar"):
        cfg = ExperimentConfig().with_overrides(**{
            "model.experiment_type": "MTAM", "model.num_units": 16,
            "model.num_blocks": 2, "model.dropout": 0.0,
            "model.time_gate_mode": mode,
            "train.train_batch_size": 32, "train.test_batch_size": 64,
            "train.eval_freq": 10_000, "train.display_freq": 10_000,
            "data.max_seq_len": 12})
        trainer = Trainer(cfg=cfg, model=get_model("MTAM"),
                          train_data=train, test_data=test,
                          run_dir=f"/tmp/gate_{mode}")
        state = trainer.init_state()
        losses = []
        rng = np.random.RandomState(0)
        for _ in range(3):
            for _, b in batch_iterator(train, 32, shuffle=True, rng=rng):
                step_rng = jax.random.PRNGKey(state.step)
                state.params, state.opt_state, m = trainer.train_step(
                    state.params, state.opt_state, b, step_rng)
                state.step += 1
                losses.append(float(m["loss"]))
        finals[mode] = (np.mean(losses[:5]), np.mean(losses[-5:]),
                        trainer.evaluate(state)["hr@10"])
    for mode, (first, last, hr) in finals.items():
        assert last < first * 0.8, (mode, finals)
    # same ballpark: scalar within 15% of positional's final loss
    assert finals["scalar"][1] < finals["positional"][1] * 1.15, finals


# ------------------------------------------------------------ CP engine

def test_cp_exactness_vs_jnp(devices):
    """Key-axis-sharded attention == the unsharded jnp path (4x2 mesh)."""
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    C = 8
    params = att.init_time_mha_block(jax.random.PRNGKey(0), C, 1, 16,
                                     gate_mode="scalar")
    q, k, kl, ql, tq, tk = _inputs(8, 1, 16, C)
    ref, _ = att.time_aware_multihead_attention(
        params, q, k, kl, ql, tq, tk, num_heads=2, train=False)
    with cp.cp_scope(mesh):
        got, _ = att.time_aware_multihead_attention(
            params, q, k, kl, ql, tq, tk, num_heads=2, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cp_long_history_flat_memory(devices):
    """L=1024 over an 8-way key axis: 128 keys per device, exact vs the
    full-length jnp reference — the length the positional gate cannot
    even represent (its params are pinned to the configured [Tq,Tk])."""
    mesh = build_mesh(MeshConfig(model_axis_size=8))
    C, L = 8, 1024
    params = att.init_time_mha_block(jax.random.PRNGKey(0), C, 1, 50,
                                     gate_mode="scalar")
    q, k, kl, ql, tq, tk = _inputs(2, 1, L, C, seed=5)
    ref, _ = att.time_aware_multihead_attention(
        params, q, k, kl, ql, tq, tk, num_heads=1, train=False)
    with cp.cp_scope(mesh):
        got, _ = att.time_aware_multihead_attention(
            params, q, k, kl, ql, tq, tk, num_heads=1, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cp_gradient_parity_vs_jnp(devices):
    """Direct jax.grad through the CP engine's pmax+stop_gradient online
    softmax (context_parallel.py:98-107): cotangents wrt the gate/projection
    params AND the inputs must equal the unsharded jnp path's.  The pmax'd
    global max is a pure shift of a shift-invariant softmax, so hiding it
    from AD must be gradient-neutral — this pins that identity (VERDICT r3
    weak-4)."""
    mesh = build_mesh(MeshConfig(model_axis_size=4))
    C = 8
    params = att.init_time_mha_block(jax.random.PRNGKey(2), C, 1, 16,
                                     gate_mode="scalar")
    q, k, kl, ql, tq, tk = _inputs(4, 1, 16, C, seed=9)
    probe = jnp.cos(jnp.arange(C, dtype=jnp.float32))

    def loss(pp, qq, kk, use_cp):
        def run():
            out, _ = att.time_aware_multihead_attention(
                pp, qq, kk, kl, ql, tq, tk, num_heads=2, train=False)
            return jnp.sum(out * probe)
        if use_cp:
            with cp.cp_scope(mesh):
                return run()
        return run()

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(params, q, k, False)
    g_cp = jax.grad(loss, argnums=(0, 1, 2))(params, q, k, True)
    for a, b in zip(jax.tree.leaves(g_cp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_cp_requires_scalar_gate(devices):
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    C = 8
    params = att.init_time_mha_block(jax.random.PRNGKey(0), C, 1, 16,
                                     gate_mode="positional")
    q, k, kl, ql, tq, tk = _inputs(8, 1, 16, C)
    with cp.cp_scope(mesh):
        with pytest.raises(ValueError, match="scalar"):
            att.time_aware_multihead_attention(
                params, q, k, kl, ql, tq, tk, num_heads=1, train=False)


def test_cp_through_sharded_train_step(devices):
    """MeshConfig.context_parallel through the full SPMD optimizer step:
    loss parity with the single-device path and a working update."""
    from mtamrecommender_tpu.parallel.dist_trainer import \
        make_sharded_train_step
    from mtamrecommender_tpu.train.trainer import make_optimizer

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM",
        "model.num_units": 8, "model.num_blocks": 1, "model.dropout": 0.0,
        "model.vocab_pad_multiple": 16, "model.time_gate_mode": "scalar",
        "mesh.model_axis_size": 2, "mesh.shard_embeddings": True,
        "mesh.context_parallel": True})
    mesh = build_mesh(cfg.mesh)
    meta = make_meta(item_count=30, max_seq_len=8)
    mdef = get_model("MTAM")
    params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
    p_host = jax.device_get(params)

    placed = shard_lib.place_params(mesh, cfg.mesh, params)
    o_pl = jax.device_put(opt.init(params),
                          shard_lib.replicated_tree(mesh, opt.init(params)))
    step = make_sharded_train_step(mdef, cfg, opt, mesh, placed,
                                   meta.item_vocab)
    batch = make_batch(meta, batch_size=8, seed=0)
    b_pl = shard_lib.place_batch(mesh, cfg.mesh, batch)
    rng = jax.random.PRNGKey(3)
    new_p, _, metrics = step(placed, o_pl, b_pl, rng)
    ref = compute_loss(mdef, p_host, cfg.model, batch, True, rng,
                       meta.item_vocab)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref["loss"]),
                               rtol=1e-5)
    # the sharded UPDATE equals the single-device update (VERDICT r3
    # weak-4: loss parity alone does not pin the CP backward)
    from mtamrecommender_tpu.train.trainer import make_train_step
    ref_step = make_train_step(mdef, cfg, opt, meta.item_vocab)
    ref_p, _, _ = ref_step(p_host, opt.init(p_host), batch, rng)
    flat_cp, tree_cp = jax.tree_util.tree_flatten_with_path(
        jax.device_get(new_p))
    flat_ref = jax.tree_util.tree_leaves(jax.device_get(ref_p))
    assert len(flat_cp) == len(flat_ref)
    for (path, a), b in zip(flat_cp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))
    # and the update is real (params actually moved)
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(jax.device_get(new_p)),
                                jax.tree.leaves(p_host)))
    assert moved
