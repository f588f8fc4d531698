"""Pallas-kernel parity tests vs. the jnp reference paths (interpret mode
on CPU — SURVEY.md section 4 'each Pallas kernel vs. a pure-jnp reference
implementation').  Real-TPU execution is exercised by bench.py and
__graft_entry__ on the driver side.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtamrecommender_tpu.config import ExperimentConfig
from mtamrecommender_tpu.models import base as base_m
from mtamrecommender_tpu.models.registry import get_model
from mtamrecommender_tpu.ops import attention as att
from mtamrecommender_tpu.ops import time_gru as tg
from mtamrecommender_tpu.ops.pallas import embedding_kernel as ek

from helpers import make_batch, make_meta


# ------------------------------------------------------------ attention

@pytest.fixture(scope="module")
def att_inputs():
    rng = np.random.RandomState(7)
    B, L, d = 3, 50, 32
    x = jnp.asarray(rng.randn(B, L, d).astype(np.float32))
    t = jnp.asarray(np.sort(rng.rand(B, L).astype(np.float32) * 500, axis=1))
    lengths = jnp.asarray(np.array([50, 23, 7], np.int32))
    return x, t, lengths


def test_time_attention_kernel_parity(att_inputs):
    x, t, lengths = att_inputs
    p = att.init_time_mha_block(jax.random.PRNGKey(1), x.shape[-1],
                                x.shape[1], x.shape[1])
    ref, _ = att.time_aware_multihead_attention(
        p, x, x, lengths, lengths, t, t, num_heads=1, train=False)
    out, _ = att.time_aware_multihead_attention(
        p, x, x, lengths, lengths, t, t, num_heads=1, train=False,
        use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_time_attention_kernel_single_query(att_inputs):
    """MTAM's decoder path: Tq=1 (sublane-padded inside the kernel)."""
    x, t, lengths = att_inputs
    B, L, d = x.shape
    p = att.init_time_mha_block(jax.random.PRNGKey(2), d, 1, L)
    q, tq = x[:, :1], t[:, :1]
    ones = jnp.ones((B,), jnp.int32)
    ref, _ = att.time_aware_multihead_attention(
        p, q, x, lengths, ones, tq, t, num_heads=1, train=False)
    out, _ = att.time_aware_multihead_attention(
        p, q, x, lengths, ones, tq, t, num_heads=1, train=False,
        use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tisas_kernel_parity(att_inputs):
    x, t, lengths = att_inputs
    p = att.init_mha_block(jax.random.PRNGKey(3), x.shape[-1])
    ref, _ = att.tisas_multihead_attention(
        p, x, x, lengths, lengths, t, t, num_heads=1, train=False)
    out, _ = att.tisas_multihead_attention(
        p, x, x, lengths, lengths, t, t, num_heads=1, train=False,
        use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_attention_kernel_grad_parity(att_inputs):
    x, t, lengths = att_inputs
    p = att.init_time_mha_block(jax.random.PRNGKey(1), x.shape[-1],
                                x.shape[1], x.shape[1])

    def loss(pp, use_pallas):
        o, _ = att.time_aware_multihead_attention(
            pp, x, x, lengths, lengths, t, t, num_heads=1, train=False,
            use_pallas=use_pallas)
        return jnp.sum(o * o)

    g_ref = jax.grad(lambda pp: loss(pp, False))(p)
    g_pk = jax.grad(lambda pp: loss(pp, True))(p)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_plain_mha_kernel_dropout_training_parity(att_inputs, monkeypatch):
    """TRAINING with attention-weight dropout can ride the fused kernel
    (the '*_drop' modes): same rng -> same bernoulli mask bits as the jnp
    path (layers.dropout), so outputs must agree to rounding (the only
    difference is w/keep vs w*(1/keep)).  At L=50 the default routing
    keeps training on jnp (measured faster, steps_r4.json) — force the
    kernel here to pin its correctness."""
    monkeypatch.setattr(att, "DROPOUT_KERNEL_MIN_KEYS", 0)
    x, t, lengths = att_inputs
    p = att.init_mha_block(jax.random.PRNGKey(5), x.shape[-1])
    rng = jax.random.PRNGKey(11)
    ref, _ = att.multihead_attention(p, x, x, lengths, lengths, num_heads=1,
                                     dropout_rate=0.5, train=True, rng=rng)
    out, _ = att.multihead_attention(p, x, x, lengths, lengths, num_heads=1,
                                     dropout_rate=0.5, train=True, rng=rng,
                                     use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # the mask must actually be doing something: a different rng differs
    out2, _ = att.multihead_attention(p, x, x, lengths, lengths, num_heads=1,
                                      dropout_rate=0.5, train=True,
                                      rng=jax.random.PRNGKey(12),
                                      use_pallas=True)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-4


def test_dropout_training_routing_threshold(att_inputs, monkeypatch):
    """At the reference's L=50, training WITH weight dropout stays on the
    jnp path (the kernel measurably loses there — steps_r4.json); the
    kernel takes it only past DROPOUT_KERNEL_MIN_KEYS."""
    x, t, lengths = att_inputs   # L = 50 < 256

    def boom(*a, **k):
        raise AssertionError("kernel should not take short-L dropout training")

    monkeypatch.setattr(att, "_plain_attention_pallas", boom)
    p = att.init_mha_block(jax.random.PRNGKey(5), x.shape[-1])
    out, _ = att.multihead_attention(
        p, x, x, lengths, lengths, num_heads=1, dropout_rate=0.5,
        train=True, rng=jax.random.PRNGKey(0), use_pallas=True)
    assert np.all(np.isfinite(np.asarray(out)))
    # eval at the same length still routes to the kernel
    with pytest.raises(AssertionError, match="should not take"):
        att.multihead_attention(p, x, x, lengths, lengths, num_heads=1,
                                dropout_rate=0.5, train=False,
                                use_pallas=True)


@pytest.mark.parametrize("kind", ["plain", "tisas"])
def test_attention_kernel_dropout_grad_parity(att_inputs, kind, monkeypatch):
    """Fused backward through the dropped weights: dv uses the DROPPED
    weights, the weight cotangent re-masks before the softmax transpose —
    must equal jnp AD through the identically-masked reference path."""
    monkeypatch.setattr(att, "DROPOUT_KERNEL_MIN_KEYS", 0)
    x, t, lengths = att_inputs
    p = att.init_mha_block(jax.random.PRNGKey(6), x.shape[-1])
    rng = jax.random.PRNGKey(13)

    def loss(pp, xx, use_pallas):
        if kind == "plain":
            o, _ = att.multihead_attention(
                pp, xx, xx, lengths, lengths, num_heads=1, dropout_rate=0.5,
                train=True, rng=rng, use_pallas=use_pallas)
        else:
            o, _ = att.tisas_multihead_attention(
                pp, xx, xx, lengths, lengths, t, t, num_heads=1,
                dropout_rate=0.5, train=True, rng=rng, use_pallas=use_pallas)
        return jnp.sum(o * o)

    g_ref = jax.grad(loss, argnums=(0, 1))(p, x, False)
    g_pk = jax.grad(loss, argnums=(0, 1))(p, x, True)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("gate_mode,n_hops", [("positional", 3),
                                              ("scalar", 2)])
def test_fused_readout_kernel_parity(att_inputs, gate_mode, n_hops):
    """The one-call multi-hop readout kernel == the jnp fused readout
    (values AND grads wrt memory, query and every per-hop param)."""
    x, t, lengths = att_inputs
    B, L, d = x.shape
    blocks = att.init_attention_stack(jax.random.PRNGKey(8), n_hops, d,
                                      kind="time", t_q_len=1, t_k_len=L,
                                      gate_mode=gate_mode)
    dec = x[:, :1, :] * 0.3
    tq = t[:, -1:]
    qlen = jnp.asarray([1] * (B - 1) + [0], jnp.int32)  # one masked query

    def run(bl, mem, dq, use_kernel):
        if use_kernel:
            return att._fused_readout_pallas(bl, mem, dq, lengths, tq, t,
                                             qlen)
        return att.vanilla_attention_stack(
            bl, mem, dq, lengths, qlen, kind="time", num_heads=1,
            dropout_rate=0.0, train=True, t_queries=tq, t_keys=t,
            fused=False)

    ref = run(blocks, x, dec, False)
    out = run(blocks, x, dec, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    probe = jnp.sin(jnp.arange(d, dtype=jnp.float32))

    def loss(bl, mem, dq, use_kernel):
        return jnp.sum(run(bl, mem, dq, use_kernel) * probe)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(blocks, x, dec, False)
    g_out = jax.grad(loss, argnums=(0, 1, 2))(blocks, x, dec, True)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_o = jax.tree_util.tree_leaves(g_out)
    for (path, a), b in zip(flat_r, flat_o):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_fused_readout_kernel_in_mtam_training(monkeypatch):
    """MTAM pallas_scope=all (readout kernel) trains to the same loss as
    scope=gru (jnp readout) on the same batch/rng — close, not exact (the
    kernel regroups matmuls).  Forced past the measured length threshold
    (default routing keeps L=50-scale readouts on the faster jnp path)."""
    monkeypatch.setattr(att, "READOUT_KERNEL_MIN_KEYS", 0)
    meta = make_meta(item_count=50, max_seq_len=10)
    batch = make_batch(meta, batch_size=4, seed=0)
    rng = jax.random.PRNGKey(5)
    losses = {}
    for scope in ("gru", "all"):
        cfg = ExperimentConfig().with_overrides(**{
            "model.experiment_type": "MTAM", "model.num_units": 16,
            "model.num_blocks": 2, "model.use_pallas": True,
            "model.pallas_scope": scope})
        model = get_model("MTAM")
        params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
        m = base_m.compute_loss(model, params, cfg.model, batch, True, rng,
                                meta.item_vocab)
        losses[scope] = float(m["loss"])
    assert abs(losses["all"] - losses["gru"]) < 1e-4 * max(
        abs(losses["gru"]), 1.0), losses


def test_multihead_fallback_when_unsupported(att_inputs):
    """num_heads > 1 falls back to the jnp path (same result either way)."""
    x, t, lengths = att_inputs
    p = att.init_time_mha_block(jax.random.PRNGKey(4), x.shape[-1],
                                x.shape[1], x.shape[1])
    ref, _ = att.time_aware_multihead_attention(
        p, x, x, lengths, lengths, t, t, num_heads=2, train=False)
    out, _ = att.time_aware_multihead_attention(
        p, x, x, lengths, lengths, t, t, num_heads=2, train=False,
        use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


# ------------------------------------------------------------ GRU scan

@pytest.fixture(scope="module")
def seq_inputs():
    rng = np.random.RandomState(3)
    B, L, d = 5, 12, 16
    inputs = jnp.asarray(rng.randn(B, L, d).astype(np.float32))
    tl = jnp.asarray(np.abs(rng.randn(B, L)).astype(np.float32))
    tn = jnp.asarray(np.abs(rng.randn(B, L)).astype(np.float32))
    lengths = jnp.asarray(np.array([12, 7, 1, 3, 9], np.int32))
    return inputs, tl, tn, lengths


@pytest.mark.parametrize("mode", ["plain", "tseqrec", "tgru"])
def test_gru_scan_kernel_parity(mode, seq_inputs):
    inputs, tl, tn, lengths = seq_inputs
    d = inputs.shape[-1]
    if mode == "plain":
        p = tg.init_gru(jax.random.PRNGKey(0), d, d)
        fn = lambda pp, up: tg.gru_net(pp, inputs, lengths, use_pallas=up)  # noqa: E731
    elif mode == "tseqrec":
        p = tg.init_tseqrec(jax.random.PRNGKey(1), d, d)
        fn = lambda pp, up: tg.tseqrec_net(pp, inputs, tl, tn, lengths,  # noqa: E731
                                           use_pallas=up)
    else:
        p = tg.init_tgru(jax.random.PRNGKey(2), d, d)
        fn = lambda pp, up: tg.tgru_net(pp, inputs, tl, tn, lengths,  # noqa: E731
                                        use_pallas=up)
    np.testing.assert_allclose(np.asarray(fn(p, True)),
                               np.asarray(fn(p, False)), rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(lambda pp: jnp.sum(fn(pp, False) ** 2))(p)
    g_pk = jax.grad(lambda pp: jnp.sum(fn(pp, True) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gru_scan_initial_state(seq_inputs):
    inputs, _, _, lengths = seq_inputs
    d = inputs.shape[-1]
    p = tg.init_gru(jax.random.PRNGKey(0), d, d)
    h0 = jnp.asarray(np.random.RandomState(9).randn(inputs.shape[0], d)
                     .astype(np.float32))
    ref = tg.gru_net(p, inputs, lengths, initial_state=h0)
    out = tg.gru_net(p, inputs, lengths, initial_state=h0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------ embedding

def test_embedding_gather_scatter_parity():
    rng = np.random.RandomState(0)
    V, d = 40, 16
    table = jnp.asarray(rng.randn(V, d).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (6, 9)).astype(np.int32))
    np.testing.assert_allclose(np.asarray(ek.gather(table, ids)),
                               np.asarray(jnp.take(table, ids, axis=0)))
    g_pk = jax.grad(lambda t: jnp.sum(jnp.sin(ek.gather(t, ids))))(table)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.sin(jnp.take(t, ids, axis=0))))(table)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_dtable_kernel_matches_scatter_grad():
    """take_dtable's tiled-one-hot backward == XLA's scatter-add grad,
    across the id-chunked path (n > CHUNK_N), ragged vocab (pad+slice)
    and duplicate ids."""
    rng = np.random.RandomState(1)
    for V, n_ids in ((40, 25), (130, 3000)):   # ragged V; n > CHUNK_N via
        d = 16                                 # monkeypatched chunk below
        table = jnp.asarray(rng.randn(V, d).astype(np.float32))
        ids = jnp.asarray(rng.randint(0, V, (n_ids,)).astype(np.int32))
        w = jnp.asarray(rng.randn(n_ids, d).astype(np.float32))

        def loss(gather_fn, t):
            return jnp.sum(jnp.tanh(gather_fn(t, ids)) * w)

        g_k = jax.grad(lambda t: loss(ek.take_dtable, t))(table)
        g_ref = jax.grad(
            lambda t: loss(lambda tb, i: jnp.take(tb, i, axis=0), t))(table)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


def test_dtable_kernel_chunked_accumulation(monkeypatch):
    """Force multiple id-chunks per vocab tile so the in-kernel
    zero-init + accumulate path is exercised explicitly."""
    monkeypatch.setattr(ek, "CHUNK_N", 64)
    monkeypatch.setattr(ek, "_ONE_CHUNK_BYTES", 0)   # force the chunked path
    rng = np.random.RandomState(2)
    V, d, n = 130, 8, 200                      # 4 chunks, ragged tail
    table = jnp.asarray(rng.randn(V, d).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (n,)).astype(np.int32))
    w = jnp.asarray(rng.randn(n, d).astype(np.float32))
    g_k = jax.grad(lambda t: jnp.sum(ek.take_dtable(t, ids) * w))(table)
    g_ref = jax.grad(
        lambda t: jnp.sum(jnp.take(t, ids, axis=0) * w))(table)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------ end-to-end

@pytest.mark.parametrize("name", ["MTAM", "Ti_Self_Attention_Model",
                                  "NARM++"])
def test_model_loss_parity_with_pallas(name):
    meta = make_meta(item_count=50, max_seq_len=10)
    batch = make_batch(meta, batch_size=4, seed=0, seq_lens=[5, 8, 10, 3])
    cfg_ref = ExperimentConfig().with_overrides(**{
        "model.num_units": 16, "model.num_blocks": 2,
        "model.dropout": 0.0}).model
    cfg_pk = ExperimentConfig().with_overrides(**{
        "model.num_units": 16, "model.num_blocks": 2,
        "model.dropout": 0.0, "model.use_pallas": True}).model
    mdef = get_model(name)
    params = mdef.init(jax.random.PRNGKey(0), cfg_ref, meta)
    r = jax.random.PRNGKey(1)
    l_ref = base_m.compute_loss(mdef, params, cfg_ref, batch, True, r)
    l_pk = base_m.compute_loss(mdef, params, cfg_pk, batch, True, r)
    np.testing.assert_allclose(float(l_pk["loss"]), float(l_ref["loss"]),
                               rtol=1e-6)


@pytest.mark.parametrize("mode", ["time", "tisas", "plain"])
def test_blockwise_long_history_parity(mode):
    """Tk > SINGLE_TILE_KEYS routes through the flash-style online-softmax
    key-block walk; must match the reference middle exactly."""
    from mtamrecommender_tpu.ops.pallas import attention_kernel as pk
    rng = np.random.RandomState(0)
    B, Tq, Tk, d = 2, 8, 1500, 32
    q = jnp.asarray(rng.randn(B, Tq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Tk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Tk, d).astype(np.float32))
    tq = jnp.asarray(np.sort(rng.rand(B, Tq) * 100, 1).astype(np.float32))
    tk = jnp.asarray(np.sort(rng.rand(B, Tk) * 100, 1).astype(np.float32))
    tqw = jnp.asarray(rng.randn(B, Tq, d).astype(np.float32))
    rawk = jnp.asarray(rng.randn(B, Tk, d).astype(np.float32))
    g = [jnp.asarray(rng.randn(Tq, Tk).astype(np.float32) * 0.1)
         for _ in range(5)]
    lens = jnp.asarray([1500, 700], jnp.int32)
    out = pk.fused_attention(mode, q, k, v, tq, tk, tqw, rawk, *g, lens,
                             pk.dm_dummy())
    ref = pk._reference_middle(mode, q, k, v, tq, tk, tqw, rawk, *g, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_plain_mha_kernel_parity_eval(att_inputs):
    """Plain MHA routes to the fused kernel when dropout is inactive
    (SASrec's eval/serving path); training with dropout stays jnp."""
    x, t, lengths = att_inputs
    p = att.init_mha_block(jax.random.PRNGKey(4), x.shape[-1])
    ref, _ = att.multihead_attention(
        p, x, x, lengths, lengths, num_heads=1, dropout_rate=0.5,
        train=False)
    out, _ = att.multihead_attention(
        p, x, x, lengths, lengths, num_heads=1, dropout_rate=0.5,
        train=False, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # dropout_rate=0 training also routes and must match the jnp path
    rng = jax.random.PRNGKey(0)
    ref, _ = att.multihead_attention(
        p, x, x, lengths, lengths, num_heads=1, dropout_rate=0.0,
        train=True, rng=rng)
    out, _ = att.multihead_attention(
        p, x, x, lengths, lengths, num_heads=1, dropout_rate=0.0,
        train=True, rng=rng, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# (the round-3 test_scope_all_equals_scope_gru_on_mtam_training exactness
# pin is superseded by test_fused_readout_kernel_in_mtam_training: scope
# 'all' now routes MTAM's readout through the fused multi-hop kernel, so
# the losses are close rather than bit-equal)


def test_readout_chain_kernel_parity(monkeypatch):
    """Round-5 chain kernel (readout_chain_kernel.py): values AND grads
    wrt memory/query/params match the jnp hop-batched readout at the
    reference shape (L=50 < MAX_KEYS) for positional and scalar gates.
    The kernel is opt-in (measured loss at L=50, steps_r5chain.json) —
    forced on here to pin its correctness."""
    from mtamrecommender_tpu.ops.pallas import flags as pallas_flags
    monkeypatch.setattr(att, "READOUT_CHAIN_OPT_IN", True)

    for gate_mode, n_hops in (("positional", 3), ("scalar", 2)):
        B, L, d = 12, 50, 16
        r = np.random.RandomState(4)
        mem = jnp.asarray(r.randn(B, L, d).astype(np.float32) * 0.5)
        t = jnp.asarray(np.sort(r.rand(B, L) * 500, 1).astype(np.float32))
        lengths = jnp.asarray(r.randint(2, L + 1, B).astype(np.int32))
        blocks = att.init_attention_stack(
            jax.random.PRNGKey(9), n_hops, d, kind="time", t_q_len=1,
            t_k_len=L, gate_mode=gate_mode)
        dec = mem[:, :1, :] * 0.3
        tq = t[:, -1:]
        ones = jnp.ones((B,), jnp.int32)
        probe = jnp.cos(jnp.arange(d, dtype=jnp.float32))

        def loss(bl, m, dq, use_kernel):
            pallas_flags.set_scope("attention" if use_kernel else "gru")
            try:
                out = att.vanilla_attention_stack(
                    bl, m, dq, lengths, ones, kind="time", num_heads=1,
                    dropout_rate=0.0, train=True, t_queries=tq, t_keys=t,
                    use_pallas=use_kernel, fused=True)
            finally:
                pallas_flags.set_scope("all")
            return jnp.sum(out * probe)

        v_ref = float(loss(blocks, mem, dec, False))
        v_k = float(loss(blocks, mem, dec, True))
        np.testing.assert_allclose(v_k, v_ref, rtol=1e-5, atol=1e-5)
        g_ref = jax.grad(lambda a, b, c: loss(a, b, c, False),
                         argnums=(0, 1, 2))(blocks, mem, dec)
        g_k = jax.grad(lambda a, b, c: loss(a, b, c, True),
                       argnums=(0, 1, 2))(blocks, mem, dec)
        flat_k, _ = jax.tree_util.tree_flatten_with_path(g_k)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        for (path, a), b in zip(flat_k, flat_r):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=f"{gate_mode} {jax.tree_util.keystr(path)}")


def test_readout_chain_kernel_in_mtam_training(monkeypatch):
    """Three MTAM train steps through the chain kernel vs the jnp path:
    same loss trajectory within f32 tolerance (kernel forced on)."""
    from mtamrecommender_tpu.train.trainer import (make_optimizer,
                                                   make_train_step)
    monkeypatch.setattr(att, "READOUT_CHAIN_OPT_IN", True)

    meta = make_meta(item_count=40, max_seq_len=50)
    batch = make_batch(meta, batch_size=8, seed=2)
    traj = {}
    for use_k in (False, True):
        cfg = ExperimentConfig().with_overrides(**{
            "model.experiment_type": "MTAM", "model.num_units": 16,
            "model.num_blocks": 2, "model.dropout": 0.0,
            "model.use_pallas": use_k,
            "model.pallas_scope": "attention"})
        mdef = get_model("MTAM")
        params = mdef.init(jax.random.PRNGKey(0), cfg.model, meta)
        opt = make_optimizer(cfg.train)
        step = make_train_step(mdef, cfg, opt, meta.item_vocab)
        opt_state = opt.init(params)
        losses = []
        for i in range(3):
            params, opt_state, m = step(params, opt_state, batch,
                                        jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        traj[use_k] = losses
    np.testing.assert_allclose(traj[True], traj[False], rtol=1e-5)
