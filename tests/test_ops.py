"""Op-library parity tests: GRU cells vs. step-by-step numpy references,
attention mask/gate properties, layer utilities.

The numpy references below implement the reference repo's cell equations
literally (one step at a time, Model/Modules/time_aware_rnn.py) so the
hoisted-projection `lax.scan` drivers in ops/time_gru.py are checked
against an independent derivation, not against themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtamrecommender_tpu.ops import attention as att
from mtamrecommender_tpu.ops import layers, time_gru


def _np(x):
    return np.asarray(x)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


# ------------------------------------------------------------ numpy cells

def np_gru_step(p, x, h):
    gates = sigmoid(x @ _np(p["w_gate_x"]) + h @ _np(p["w_gate_h"])
                    + _np(p["b_gate"]))
    r, u = np.split(gates, 2, axis=-1)
    c = np.tanh(x @ _np(p["w_cand_x"]) + (r * h) @ _np(p["w_cand_h"])
                + _np(p["b_cand"]))
    return r, u, c


def np_run(step, p, inputs, lengths, units):
    """dynamic_rnn semantics: zero output past length, frozen state."""
    B, L, _ = inputs.shape
    h = np.zeros((B, units), np.float32)
    outs = np.zeros((B, L, units), np.float32)
    for t in range(L):
        new_h = step(p, inputs[:, t], h, t)
        alive = (t < lengths)[:, None]
        h = np.where(alive, new_h, h)
        outs[:, t] = np.where(alive, new_h, 0.0)
    return outs


@pytest.fixture()
def seq_inputs():
    rng = np.random.RandomState(3)
    B, L, d = 3, 7, 8
    inputs = rng.randn(B, L, d).astype(np.float32)
    time_last = np.abs(rng.randn(B, L)).astype(np.float32)
    time_now = np.abs(rng.randn(B, L)).astype(np.float32)
    lengths = np.array([7, 4, 1], np.int32)
    return inputs, time_last, time_now, lengths


def test_plain_gru_matches_numpy(seq_inputs):
    inputs, _, _, lengths = seq_inputs
    units = 5
    p = time_gru.init_gru(jax.random.PRNGKey(0), inputs.shape[-1], units)
    got = _np(time_gru.gru_net(p, jnp.asarray(inputs), jnp.asarray(lengths)))

    def step(p, x, h, t):
        _, u, c = np_gru_step(p, x, h)
        return u * h + (1 - u) * c

    want = np_run(step, p, inputs, lengths, units)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tseqrec_matches_numpy(seq_inputs):
    # TimeAwareGRUCell_sigmoid (time_aware_rnn.py:105-131):
    #   new_h = u*h*sig(now_state) + (1-u)*c*sig(last_state)
    inputs, tl, tn, lengths = seq_inputs
    units = 5
    p = time_gru.init_tseqrec(jax.random.PRNGKey(1), inputs.shape[-1], units)
    got = _np(time_gru.tseqrec_net(p, jnp.asarray(inputs), jnp.asarray(tl),
                                   jnp.asarray(tn), jnp.asarray(lengths)))

    def step(p, x, h, t):
        t_now = tn[:, t][:, None]
        t_last = tl[:, t][:, None]
        now_in = np.tanh(t_now * _np(p["time_input_w1"]) + _np(p["time_input_b1"]))
        last_in = np.tanh(t_last * _np(p["time_input_w2"]) + _np(p["time_input_b2"]))
        now_state = (x @ _np(p["time_kernel_w1"]) + now_in @ _np(p["time_kernel_t1"])
                     + _np(p["time_bias1"]))
        last_state = (x @ _np(p["time_kernel_w2"]) + last_in @ _np(p["time_kernel_t2"])
                      + _np(p["time_bias2"]))
        _, u, c = np_gru_step(p, x, h)
        return u * h * sigmoid(now_state) + (1 - u) * c * sigmoid(last_state)

    want = np_run(step, p, inputs, lengths, units)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tgru_matches_numpy(seq_inputs):
    # TimeAwareGRUCell_decay_new (time_aware_rnn.py:228-268):
    #   weight = relu(x*w_k1 + b_k1 + h*w_h1)
    #   score  = relu(w1*t_last + b1)
    #   state  = sigmoid(w_k2*weight + w12*score + b12)
    #   new_h  = u*h + (1-u)*c*state
    inputs, tl, tn, lengths = seq_inputs
    units = 8  # input_dim == units: elementwise x*w_k1 needs matching dims
    p = time_gru.init_tgru(jax.random.PRNGKey(2), inputs.shape[-1], units)
    got = _np(time_gru.tgru_net(p, jnp.asarray(inputs), jnp.asarray(tl),
                                jnp.asarray(tn), jnp.asarray(lengths)))

    def step(p, x, h, t):
        weight = np.maximum(x * _np(p["time_kernel_w1"]) + _np(p["time_kernel_b1"])
                            + h * _np(p["time_history_w1"]), 0.0)
        score = np.maximum(_np(p["time_w1"]) * tl[:, t][:, None]
                           + _np(p["time_b1"]), 0.0)
        state = sigmoid(_np(p["time_kernel_w2"]) * weight
                        + _np(p["time_w12"]) * score + _np(p["time_b12"]))
        _, u, c = np_gru_step(p, x, h)
        return u * h + (1 - u) * c * state

    want = np_run(step, p, inputs, lengths, units)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_masked_scan_freezes_state_and_zeroes_output(seq_inputs):
    inputs, _, _, _ = seq_inputs
    units = 5
    p = time_gru.init_gru(jax.random.PRNGKey(0), inputs.shape[-1], units)
    lengths = jnp.asarray(np.array([3, 3, 3], np.int32))
    out = _np(time_gru.gru_net(p, jnp.asarray(inputs), lengths))
    assert np.all(out[:, 3:] == 0.0)
    # changing inputs past the length must not change valid outputs
    inputs2 = inputs.copy()
    inputs2[:, 3:] = 99.0
    out2 = _np(time_gru.gru_net(p, jnp.asarray(inputs2), lengths))
    np.testing.assert_allclose(out[:, :3], out2[:, :3], rtol=1e-6)


def test_initial_state_is_used(seq_inputs):
    inputs, _, _, lengths = seq_inputs
    units = 5
    p = time_gru.init_gru(jax.random.PRNGKey(0), inputs.shape[-1], units)
    h0 = jnp.ones((inputs.shape[0], units)) * 0.7
    out0 = _np(time_gru.gru_net(p, jnp.asarray(inputs), jnp.asarray(lengths)))
    out1 = _np(time_gru.gru_net(p, jnp.asarray(inputs), jnp.asarray(lengths),
                                initial_state=h0))
    assert np.abs(out0[:, 0] - out1[:, 0]).max() > 1e-4


# ------------------------------------------------------------ attention

@pytest.fixture()
def att_inputs():
    rng = np.random.RandomState(7)
    B, L, d = 2, 6, 8
    x = rng.randn(B, L, d).astype(np.float32)
    t = np.sort(rng.rand(B, L).astype(np.float32) * 50, axis=1)
    lengths = np.array([6, 3], np.int32)
    return jnp.asarray(x), jnp.asarray(t), jnp.asarray(lengths)


def test_mha_padding_keys_get_zero_weight(att_inputs):
    x, _, lengths = att_inputs
    p = att.init_mha_block(jax.random.PRNGKey(0), x.shape[-1])
    out, weights = att.multihead_attention(p, x, x, lengths, lengths,
                                           num_heads=2, train=False)
    w = _np(weights)   # [B, h, Tq, Tk]
    assert np.allclose(w[1, :, :, 3:], 0.0, atol=1e-6)
    # valid-query rows sum to ~1 over keys
    np.testing.assert_allclose(w[1, :, :3, :].sum(-1), 1.0, rtol=1e-5)
    # padded-query rows are zeroed by the query mask
    assert np.allclose(w[1, :, 3:, :], 0.0, atol=1e-6)
    assert out.shape == x.shape


def test_mha_padding_content_invariance(att_inputs):
    x, _, lengths = att_inputs
    p = att.init_mha_block(jax.random.PRNGKey(0), x.shape[-1])
    out1, _ = att.multihead_attention(p, x, x, lengths, lengths,
                                      num_heads=1, train=False)
    x2 = _np(x).copy()
    x2[1, 3:] = 123.0  # clobber padded positions of row 1
    out2, _ = att.multihead_attention(p, jnp.asarray(x2), jnp.asarray(x2),
                                      lengths, lengths, num_heads=1,
                                      train=False)
    np.testing.assert_allclose(_np(out1)[1, :3], _np(out2)[1, :3],
                               rtol=1e-4, atol=1e-5)


def test_time_attention_gate_modulates_scores(att_inputs):
    x, t, lengths = att_inputs
    L = x.shape[1]
    p = att.init_time_mha_block(jax.random.PRNGKey(1), x.shape[-1], L, L)
    out_t, w_t = att.time_aware_multihead_attention(
        p, x, x, lengths, lengths, t, t, num_heads=1, train=False)
    # with the gate forced wide open (sigmoid -> 1) we must recover plain
    # scaled dot-product attention on the same projections
    p_open = dict(p)
    p_open["time_output_w1"] = jnp.zeros_like(p["time_output_w1"])
    p_open["time_output_w2"] = jnp.zeros_like(p["time_output_w2"])
    p_open["time_output_b"] = jnp.full_like(p["time_output_b"], 1e4)
    out_open, w_open = att.time_aware_multihead_attention(
        p_open, x, x, lengths, lengths, t, t, num_heads=1, train=False)
    out_plain, w_plain = att.multihead_attention(
        p, x, x, lengths, lengths, num_heads=1, train=False)
    np.testing.assert_allclose(_np(w_open), _np(w_plain), rtol=1e-4, atol=1e-5)
    # and the real gate must actually change the weights
    assert np.abs(_np(w_t) - _np(w_plain)).max() > 1e-4


def test_tisas_additive_bias_prefers_near_keys(att_inputs):
    x, t, lengths = att_inputs
    p = att.init_mha_block(jax.random.PRNGKey(2), x.shape[-1])
    _, w = att.tisas_multihead_attention(p, x, x, lengths, lengths, t, t,
                                         num_heads=1, train=False)
    _, w_plain = att.multihead_attention(p, x, x, lengths, lengths,
                                         num_heads=1, train=False)
    # additive log-interval term: zero at Δt=0, grows with distance, so
    # the two weight matrices must differ wherever Δt varies
    assert np.abs(_np(w) - _np(w_plain)).max() > 1e-4


def test_vanilla_stack_output_shape(att_inputs):
    x, t, lengths = att_inputs
    B, L, d = x.shape
    blocks = att.init_attention_stack(jax.random.PRNGKey(3), 2, d, kind="time",
                                      t_q_len=1, t_k_len=L)
    q = x[:, :1, :]
    tq = t[:, :1]
    out = att.vanilla_attention_stack(blocks, x, q, lengths,
                                      jnp.ones((B,), jnp.int32), kind="time",
                                      num_heads=1, dropout_rate=0.0,
                                      train=False, t_queries=tq, t_keys=t)
    assert out.shape == (B * 1, d)


@pytest.mark.parametrize("kind,gate_mode,heads,drop", [
    ("time", "positional", 1, 0.0),
    ("time", "scalar", 1, 0.0),
    ("time", "positional", 2, 0.0),
    ("plain", None, 1, 0.5),     # NARM's readout trains WITH weight dropout
    ("plain", None, 2, 0.0),
])
def test_fused_readout_matches_per_hop_loop(att_inputs, kind, gate_mode,
                                            heads, drop):
    """The hop-batched Tq=1 readout (_fused_single_query_readout) must be
    trajectory-identical to the reference-shaped per-hop loop: same values,
    same grads, same dropout mask bits (the rng folds per hop exactly like
    the unfused path)."""
    x, t, lengths = att_inputs
    B, L, d = x.shape
    init_kw = {} if gate_mode is None else {"gate_mode": gate_mode}
    blocks = att.init_attention_stack(jax.random.PRNGKey(3), 3, d, kind=kind,
                                      t_q_len=1, t_k_len=L, **init_kw)
    q = x[:, :1, :] * 0.5
    tq = t[:, -1:]
    # one masked-out query row: the fused paths must reproduce the
    # per-hop loop's query-mask semantics (residual+normalize only)
    qlen = jnp.asarray([1] * (B - 1) + [0], jnp.int32)
    rng = jax.random.PRNGKey(9)

    def run(fused):
        return att.vanilla_attention_stack(
            blocks, x, q, lengths, qlen, kind=kind, num_heads=heads,
            dropout_rate=drop, train=True, rng=rng,
            t_queries=tq, t_keys=t, fused=fused)

    np.testing.assert_allclose(_np(run(True)), _np(run(False)),
                               rtol=2e-5, atol=2e-6)

    # grads through blocks AND the memory must agree too (the fused path
    # regroups the matmuls; AD must see the same function)
    def loss(fused):
        def f(bl, mem, dec):
            out = att.vanilla_attention_stack(
                bl, mem, dec, lengths, qlen, kind=kind, num_heads=heads,
                dropout_rate=drop, train=True, rng=rng,
                t_queries=tq, t_keys=t, fused=fused)
            return jnp.sum(out * jnp.cos(jnp.arange(d, dtype=jnp.float32)))
        return jax.grad(f, argnums=(0, 1, 2))(blocks, x, q)

    g_fused, g_loop = loss(True), loss(False)
    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_l, _ = jax.tree_util.tree_flatten(g_loop)
    for a, b in zip(flat_f, flat_l):
        np.testing.assert_allclose(_np(a), _np(b), rtol=5e-5, atol=5e-6)


# ------------------------------------------------------------ layers

def test_layer_norm_matches_formula():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 6).astype(np.float32)
    p = layers.init_layer_norm(6)
    got = _np(layers.layer_norm(p, jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-12)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gather_positions():
    x = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    out = _np(layers.gather_positions(x, jnp.asarray([1, 3])))
    np.testing.assert_allclose(out[0], _np(x)[0, 1])
    np.testing.assert_allclose(out[1], _np(x)[1, 3])


def test_sequence_mask():
    m = _np(layers.sequence_mask(jnp.asarray([0, 2, 4]), 4))
    want = np.array([[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(m, want)


def test_dropout_train_vs_eval():
    x = jnp.ones((100, 100))
    out_eval = layers.dropout(jax.random.PRNGKey(0), x, 0.5, train=False)
    np.testing.assert_allclose(_np(out_eval), 1.0)
    out_train = _np(layers.dropout(jax.random.PRNGKey(0), x, 0.5, train=True))
    frac_zero = (out_train == 0.0).mean()
    assert 0.4 < frac_zero < 0.6
    kept = out_train[out_train != 0]
    np.testing.assert_allclose(kept, 2.0)  # inverted dropout scaling


def test_sequential_max_pooling():
    x = jnp.asarray(np.array([[[1.0], [5.0], [-2.0], [9.0]],
                              [[3.0], [-1.0], [7.0], [8.0]]]))
    out = _np(layers.sequential_max_pooling(x, jnp.asarray([2, 3])))
    np.testing.assert_allclose(out, [[5.0], [7.0]])


def test_bidirectional_gru_matches_numpy(seq_inputs):
    inputs, _, _, lengths = seq_inputs
    units = 5
    p = time_gru.init_bidirectional_gru(jax.random.PRNGKey(4),
                                        inputs.shape[-1], units)
    out = _np(time_gru.bidirectional_gru_net(p, jnp.asarray(inputs),
                                             jnp.asarray(lengths)))
    assert out.shape == (*inputs.shape[:2], 2 * units)

    def step(pp, x, h, t):
        _, u, c = np_gru_step(pp, x, h)
        return u * h + (1 - u) * c

    fw = np_run(step, p["fw"], inputs, lengths, units)
    np.testing.assert_allclose(out[..., :units], fw, rtol=1e-5, atol=1e-5)
    # backward half: reverse each valid prefix, scan, un-reverse
    B, L, _ = inputs.shape
    rev_in = inputs.copy()
    for b in range(B):
        n = lengths[b]
        rev_in[b, :n] = inputs[b, :n][::-1]
    bw = np_run(step, p["bw"], rev_in, lengths, units)
    for b in range(B):
        n = lengths[b]
        bw[b, :n] = bw[b, :n][::-1]
    np.testing.assert_allclose(out[..., units:], bw, rtol=1e-5, atol=1e-5)


def test_embedding_config_reader(tmp_path):
    from mtamrecommender_tpu.utils.embedding_config import read_embedding_config
    path = tmp_path / "emb.csv"
    path.write_text("# comment\nitem_id,3706,128\ncat_id,18,128\n")
    cfg = read_embedding_config(str(path))
    assert list(cfg.items()) == [("item_id", (3706, 128)),
                                 ("cat_id", (18, 128))]


def test_onehot_backward_matches_scatter():
    """The one-hot-matmul table backward (ops/embedding._take_onehot_bwd,
    the measured floor fix — benchmarks/results/floor_r5.json) is the
    same reduction as XLA's scatter-add up to float summation order:
    duplicate ids must accumulate, padded/filler cotangents stay zero."""
    from mtamrecommender_tpu.ops import embedding as emb

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(37, 16).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 37, size=(8, 12)).astype(np.int32))
    w = jnp.asarray(rng.randn(8, 12, 16).astype(np.float32))

    def loss(gather_fn, t):
        return jnp.sum(jnp.tanh(gather_fn(t, ids)) * w)

    g_scatter = jax.grad(
        lambda t: loss(lambda tb, i: jnp.take(tb, i, axis=0), t))(table)
    g_onehot = jax.grad(lambda t: loss(emb._take_onehot_bwd, t))(table)
    np.testing.assert_allclose(np.asarray(g_onehot), np.asarray(g_scatter),
                               rtol=1e-5, atol=1e-5)
    # a row never referenced gets exactly zero either way
    untouched = np.setdiff1d(np.arange(37), np.asarray(ids).ravel())
    if untouched.size:
        assert np.all(np.asarray(g_onehot)[untouched] == 0.0)


def test_embedding_grad_mode_update_parity():
    """One full fp32 STAMP train step under embedding_grad_mode='scatter'
    vs the 'auto' default (one-hot backward at these vocab sizes): the
    optimizer updates must agree to float-reassociation tolerance."""
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import (make_optimizer,
                                                   make_train_step)
    from mtamrecommender_tpu.types import DatasetMeta
    from tests.helpers import make_batch

    meta = DatasetMeta(user_count=40, item_count=30, category_count=5,
                       max_seq_len=10)
    model = get_model("STAMP")
    batch = make_batch(meta, 16, seed=3)
    rng = jax.random.PRNGKey(0)
    results = {}
    for mode in ("scatter", "auto"):
        cfg = ExperimentConfig().with_overrides(**{
            "model.experiment_type": "STAMP", "model.num_units": 16,
            "model.embedding_grad_mode": mode})
        params = model.init(jax.random.PRNGKey(1), cfg.model, meta)
        opt = make_optimizer(cfg.train)
        step = make_train_step(model, cfg, opt, meta.item_vocab)
        new_params, _, metrics = step(params, opt.init(params), batch, rng)
        results[mode] = (new_params, metrics)
    pa, ma = results["auto"]
    ps, ms = results["scatter"]
    np.testing.assert_allclose(float(ma["loss"]), float(ms["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6), pa, ps)
