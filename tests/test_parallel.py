"""Mesh/sharding tests on 8 virtual CPU devices (SURVEY.md section 4:
the standard JAX substitute for a fake collective backend).

Checks shard-vs-replicated numerical parity — the GSPMD partitioning of
the train/eval step must not change the math — and vocab padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mtamrecommender_tpu.config import ExperimentConfig, MeshConfig
from mtamrecommender_tpu.models.base import compute_loss
from mtamrecommender_tpu.models.registry import get_model
from mtamrecommender_tpu.ops.embedding import pad_vocab
from mtamrecommender_tpu.parallel import sharding as shard_lib
from mtamrecommender_tpu.parallel.dist_trainer import (make_sharded_eval_step,
                                                       make_sharded_train_step)
from mtamrecommender_tpu.parallel.mesh import build_mesh
from mtamrecommender_tpu.train.trainer import make_optimizer

from helpers import make_batch, make_meta


def test_pad_vocab():
    assert pad_vocab(53, 1) == 53
    assert pad_vocab(53, 16) == 64
    assert pad_vocab(64, 16) == 64
    assert pad_vocab(1, 128) == 128


def test_build_mesh_shapes(devices):
    mesh = build_mesh(MeshConfig())
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(model_axis_size=3))
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data_axis_size=3, model_axis_size=2))


def test_padded_vocab_never_wins_rank():
    """Padded table rows must be invisible to CE loss and ranking."""
    from mtamrecommender_tpu.models.base import item_logits
    meta = make_meta(item_count=50, max_seq_len=8)
    mdef = get_model("Gru4Rec")
    cfg = ExperimentConfig().with_overrides(**{
        "model.num_units": 8, "model.vocab_pad_multiple": 64}).model
    params = mdef.init(jax.random.PRNGKey(0), cfg, meta)
    assert params["embedding"]["item_table"].shape[0] == 64
    emb = jnp.ones((3, 8))
    logits = item_logits(params, emb, "plain", valid_vocab=meta.item_vocab)
    assert logits.shape == (3, 64)
    assert np.all(np.asarray(logits)[:, meta.item_vocab:] < -1e9)


@pytest.mark.parametrize("name", ["MTAM", "SASrec", "bpr"])
def test_sharded_step_parity(name, devices):
    """4x2 mesh, row-sharded padded tables: the sharded jit step must
    produce the same loss as the single-device path bit-for-bit (fp32
    tolerance)."""
    cfg = ExperimentConfig().with_overrides(**{
        "model.num_units": 16, "model.num_blocks": 2, "model.dropout": 0.0,
        "model.vocab_pad_multiple": 16,
        "mesh.model_axis_size": 2, "mesh.shard_embeddings": True})
    mesh = build_mesh(cfg.mesh)
    meta = make_meta(item_count=50, max_seq_len=10)
    mdef = get_model(name)
    params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)

    params_host = jax.device_get(params)
    placed = shard_lib.place_params(mesh, cfg.mesh, params)
    spec = placed["embedding"]["item_table"].sharding.spec
    assert spec == P("model", None)
    opt_placed = jax.device_put(opt_state,
                                shard_lib.replicated_tree(mesh, opt_state))

    batch = make_batch(meta, batch_size=8, seed=0)
    batch_placed = shard_lib.place_batch(mesh, cfg.mesh, batch)

    step = make_sharded_train_step(mdef, cfg, opt, mesh, placed,
                                   meta.item_vocab)
    rng = jax.random.PRNGKey(3)
    new_p, new_o, metrics = step(placed, opt_placed, batch_placed, rng)
    # params keep their shardings across steps
    assert new_p["embedding"]["item_table"].sharding.spec == P("model", None)

    ref = compute_loss(mdef, params_host, cfg.model, batch, True, rng,
                       meta.item_vocab)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref["loss"]),
                               rtol=1e-5)

    ev = make_sharded_eval_step(mdef, cfg, mesh, new_p,
                                valid_vocab=meta.item_vocab)
    m = ev(new_p, batch_placed)
    assert 0.0 <= float(m["hr@10"]) <= 1.0


def test_sharded_matches_unsharded_training_trajectory(devices):
    """Three optimizer steps sharded vs. replicated: same params out."""
    cfg = ExperimentConfig().with_overrides(**{
        "model.num_units": 8, "model.num_blocks": 1, "model.dropout": 0.0,
        "model.vocab_pad_multiple": 16,
        "mesh.model_axis_size": 2, "mesh.shard_embeddings": True})
    mesh = build_mesh(cfg.mesh)
    meta = make_meta(item_count=30, max_seq_len=6)
    mdef = get_model("Gru4Rec")
    params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)

    # replicated single-device reference
    import optax
    p_ref = jax.device_get(params)
    o_ref = opt.init(p_ref)
    for i in range(3):
        b = make_batch(meta, batch_size=8, seed=i)
        g = jax.grad(lambda p: compute_loss(
            mdef, p, cfg.model, b, True, jax.random.PRNGKey(i),
            meta.item_vocab)["loss"])(p_ref)
        up, o_ref = opt.update(g, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, up)

    placed = shard_lib.place_params(mesh, cfg.mesh, params)
    o_pl = jax.device_put(opt.init(params),
                          shard_lib.replicated_tree(mesh, opt.init(params)))
    step = make_sharded_train_step(mdef, cfg, opt, mesh, placed,
                                   meta.item_vocab)
    for i in range(3):
        b = shard_lib.place_batch(mesh, cfg.mesh, make_batch(meta, 8, seed=i))
        placed, o_pl, _ = step(placed, o_pl, b, jax.random.PRNGKey(i))

    for a, b in zip(jax.tree.leaves(jax.device_get(placed)),
                    jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_superstep_matches_sharded_per_step(devices):
    """K SPMD optimizer steps scanned in one jit call must reproduce the
    per-step sharded path exactly (same rng split chain, same gathers,
    EP tables sharded over the model axis)."""
    from mtamrecommender_tpu.data.device_data import (DeviceDataset,
                                                      epoch_order, to_device)
    from mtamrecommender_tpu.data.pipeline import pack_examples
    from mtamrecommender_tpu.parallel.dist_trainer import \
        make_sharded_superstep

    cfg = ExperimentConfig().with_overrides(**{
        "model.num_units": 8, "model.num_blocks": 1, "model.dropout": 0.0,
        "model.vocab_pad_multiple": 16,
        "mesh.model_axis_size": 2, "mesh.shard_embeddings": True})
    mesh = build_mesh(cfg.mesh)
    meta = make_meta(item_count=30, max_seq_len=6)
    mdef = get_model("Gru4Rec")
    params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
    B, K = 8, 4

    # device-resident data: N rows from a batch helper
    big = make_batch(meta, batch_size=32, seed=7)
    data = DeviceDataset(
        user_id=big.user_id, items=big.items, cats=big.cats, times=big.times,
        time_last=big.time_last, time_now=big.time_now,
        positions=big.positions, target_id=big.target_id,
        target_cat=big.target_cat, target_time=big.target_time,
        seq_len=big.seq_len)
    data = jax.device_put(data, shard_lib.replicated_tree(mesh, data))
    order_np, n_steps = epoch_order(32, B, np.random.RandomState(0))
    order = jax.device_put(order_np, shard_lib.replicated_tree(mesh, 0))
    assert n_steps == K

    template = jax.eval_shape(lambda r: mdef.init(r, cfg.model, meta),
                              jax.random.PRNGKey(0))

    def run(steps_per_call):
        placed = shard_lib.place_params(
            mesh, cfg.mesh, jax.device_get(params))
        o_pl = jax.device_put(
            opt.init(placed), shard_lib.replicated_tree(mesh,
                                                        opt.init(placed)))
        fn = make_sharded_superstep(mdef, cfg, opt, mesh, template,
                                    meta.item_vocab, B)(steps_per_call)
        rng = jax.random.PRNGKey(3)
        for c in range(K // steps_per_call):
            placed, o_pl, stacked, rng = fn(placed, o_pl, data, order,
                                            c * steps_per_call, rng)
        assert stacked["loss"].shape == (steps_per_call,)
        return jax.device_get(placed)

    p_k = run(K)
    p_1 = run(1)
    for a, b in zip(jax.tree.leaves(p_k), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_shard_map_embedding_engines_exact(devices):
    """Explicit EP lookups (psum-assemble and all-to-all exchange,
    parallel/embedding_shard.py) vs. the replicated gather."""
    import jax
    from mtamrecommender_tpu.parallel import embedding_shard as es

    mesh = build_mesh(MeshConfig(model_axis_size=2))
    rng = np.random.RandomState(0)
    V, d = 64, 16
    table = jnp.asarray(rng.randn(V, d).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 53, (8, 5)).astype(np.int32))
    ref = jnp.take(table, ids, axis=0)

    out = es.sharded_gather(mesh, table, ids)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    out2 = es.sharded_gather_a2a(mesh, table, ids)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))

    g_ref = jax.grad(lambda t: jnp.sum(jnp.sin(jnp.take(t, ids, axis=0))))(table)
    g1 = jax.grad(lambda t: jnp.sum(jnp.sin(es.sharded_gather(mesh, t, ids))))(table)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g_ref))
    g2 = jax.grad(lambda t: jnp.sum(jnp.sin(
        es.sharded_gather_a2a(mesh, t, ids))))(table)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g_ref))


@pytest.mark.parametrize("engine", ["a2a", "psum"])
def test_explicit_engine_training_trajectory(engine, devices):
    """The explicit shard_map lookup engines, wired through the sharded
    optimizer step via MeshConfig.embedding_engine (VERDICT.md r2 item 5),
    must reproduce the replicated single-device trajectory."""
    import optax

    cfg = ExperimentConfig().with_overrides(**{
        "model.num_units": 8, "model.num_blocks": 1, "model.dropout": 0.0,
        "model.vocab_pad_multiple": 16,
        "mesh.model_axis_size": 2, "mesh.shard_embeddings": True,
        "mesh.embedding_engine": engine})
    mesh = build_mesh(cfg.mesh)
    meta = make_meta(item_count=30, max_seq_len=6)
    mdef = get_model("MTAM")
    params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)

    # replicated single-device reference (no engine scope -> jnp.take)
    p_ref = jax.device_get(params)
    o_ref = opt.init(p_ref)
    for i in range(3):
        b = make_batch(meta, batch_size=8, seed=i)
        g = jax.grad(lambda p: compute_loss(
            mdef, p, cfg.model, b, True, jax.random.PRNGKey(i),
            meta.item_vocab)["loss"])(p_ref)
        up, o_ref = opt.update(g, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, up)

    placed = shard_lib.place_params(mesh, cfg.mesh, params)
    o_pl = jax.device_put(opt.init(params),
                          shard_lib.replicated_tree(mesh, opt.init(params)))
    step = make_sharded_train_step(mdef, cfg, opt, mesh, placed,
                                   meta.item_vocab)
    for i in range(3):
        b = shard_lib.place_batch(mesh, cfg.mesh, make_batch(meta, 8, seed=i))
        placed, o_pl, _ = step(placed, o_pl, b, jax.random.PRNGKey(i))
    assert placed["embedding"]["item_table"].sharding.spec == \
        P("model", None)

    for a, b in zip(jax.tree.leaves(jax.device_get(placed)),
                    jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # eval under the engine matches the replicated eval
    ev = make_sharded_eval_step(mdef, cfg, mesh, placed,
                                valid_vocab=meta.item_vocab)
    b = shard_lib.place_batch(mesh, cfg.mesh, make_batch(meta, 8, seed=9))
    m_eng = ev(placed, b)
    from mtamrecommender_tpu.models.base import scores_for_eval
    from mtamrecommender_tpu.train import evaluate as eval_lib
    bb = make_batch(meta, batch_size=8, seed=9)
    scores = scores_for_eval(mdef, jax.device_get(placed), cfg.model, bb,
                             meta.item_vocab)
    m_ref = eval_lib.topk_metrics(scores, bb.target_id, bb.valid,
                                  (1, 5, 10, 30, 50))
    np.testing.assert_allclose(float(m_eng["hr@10"]), float(m_ref["hr@10"]),
                               atol=1e-6)


def test_engine_scope_validation_and_noop(devices):
    """Unknown engines raise; gspmd / 1-wide model axis leave gather_rows
    on the jnp.take path."""
    from mtamrecommender_tpu.parallel import embedding_shard as es

    mesh = build_mesh(MeshConfig(model_axis_size=2))
    with pytest.raises(ValueError, match="unknown embedding_engine"):
        with es.engine_scope(mesh, "bogus"):
            pass
    with es.engine_scope(mesh, "gspmd"):
        assert es.active_gather() is None
    mesh1 = build_mesh(MeshConfig(model_axis_size=1))
    with es.engine_scope(mesh1, "a2a"):
        assert es.active_gather() is None
    assert es.active_gather() is None
