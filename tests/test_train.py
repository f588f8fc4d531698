"""Trainer / eval / checkpoint tests.

Covers the lr-schedule switch semantics (train_process.py:154-159,333-336),
HR/NDCG goldens against hand-computed ranks (base_model.py:215-242), a tiny
end-to-end train->eval->checkpoint->resume loop on synthetic data, and the
three load modes (base_model.py:48-69).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtamrecommender_tpu.config import DataConfig, ExperimentConfig
from mtamrecommender_tpu.data.ingest import load_synthetic
from mtamrecommender_tpu.data.pipeline import batch_iterator, pack_examples
from mtamrecommender_tpu.data.prepare import prepare_examples
from mtamrecommender_tpu.models.registry import get_model
from mtamrecommender_tpu.train import evaluate as eval_lib
from mtamrecommender_tpu.train.checkpoint import Checkpointer, apply_load_type
from mtamrecommender_tpu.train.trainer import (Trainer, TrainState,
                                               make_lr_schedule,
                                               make_optimizer)


# ------------------------------------------------------------ lr schedule

def test_lr_schedule_switch_semantics():
    from mtamrecommender_tpu.config import TrainConfig
    # base lr <= 1e-3: lr2 from step 0 (every shipped preset)
    sched = make_lr_schedule(TrainConfig(learning_rate=1e-3, decay_rate=0.995))
    assert float(sched(jnp.asarray(0))) == pytest.approx(1e-3)
    assert float(sched(jnp.asarray(100))) == pytest.approx(1e-3 * 0.995)
    assert float(sched(jnp.asarray(250))) == pytest.approx(1e-3 * 0.995 ** 2)
    # base lr > 1e-3: staircase 0.99 decay until it crosses 1e-3
    sched = make_lr_schedule(TrainConfig(learning_rate=2e-3, decay_rate=0.995))
    assert float(sched(jnp.asarray(0))) == pytest.approx(2e-3)
    n_cross = math.ceil(math.log(1e-3 / 2e-3) / math.log(0.99)) * 100
    before = float(sched(jnp.asarray(n_cross - 1)))
    after = float(sched(jnp.asarray(n_cross + 101)))
    assert before > 1e-3 and after <= 1e-3 * 0.995 ** ((n_cross + 101) // 100 - 1) + 1e-12


# ------------------------------------------------------------ metric goldens

def test_hr_ndcg_goldens():
    # catalog of 6, 3 rows with known ranks
    scores = jnp.asarray([
        [9.0, 1.0, 2.0, 3.0, 4.0, 5.0],   # target 0 -> rank 0
        [9.0, 1.0, 2.0, 3.0, 4.0, 5.0],   # target 3 -> rank 3
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0],   # target 2, all tied -> rank 2
    ])
    targets = jnp.asarray([0, 3, 2])
    valid = jnp.ones((3,))
    m = eval_lib.topk_metrics(scores, targets, valid, ks=(1, 5))
    assert float(m["hr@1"]) == pytest.approx(1 / 3)
    assert float(m["hr@5"]) == pytest.approx(1.0)
    want_ndcg5 = (math.log(2) / math.log(2)
                  + math.log(2) / math.log(5)
                  + math.log(2) / math.log(4)) / 3
    assert float(m["ndcg@5"]) == pytest.approx(want_ndcg5, rel=1e-5)
    # invalid rows drop out of the mean
    m2 = eval_lib.topk_metrics(scores, targets, jnp.asarray([1.0, 1.0, 0.0]),
                               ks=(1,))
    assert float(m2["hr@1"]) == pytest.approx(0.5)


def test_rank_tie_break_matches_topk_order():
    scores = jnp.asarray([[2.0, 5.0, 5.0, 1.0]])
    # tf.nn.top_k breaks ties by lower index: order = [1, 2, 0, 3]
    r = eval_lib.ranks_from_scores(scores, jnp.asarray([2]))
    assert int(r[0]) == 1
    r = eval_lib.ranks_from_scores(scores, jnp.asarray([1]))
    assert int(r[0]) == 0


# ------------------------------------------------------------ end-to-end

@pytest.fixture(scope="module")
def synth_data():
    cfg = DataConfig(dataset="synthetic", synth_users=60, synth_items=40,
                     synth_categories=5, synth_events_per_user=12,
                     max_seq_len=10, user_count_limit=10_000)
    prepared = prepare_examples(load_synthetic(cfg), cfg)
    train = pack_examples(prepared.train_set, prepared.meta)
    test = pack_examples(prepared.test_set, prepared.meta)
    return train, test


def _tiny_cfg(experiment_type, **over):
    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": experiment_type,
        "model.num_units": 16, "model.num_blocks": 2, "model.dropout": 0.1,
        "train.train_batch_size": 32, "train.test_batch_size": 64,
        "train.eval_freq": 10_000, "train.display_freq": 10_000,
        "data.max_seq_len": 10,
    })
    return cfg.with_overrides(**over) if over else cfg


@pytest.mark.parametrize("experiment_type", ["bpr", "MTAM"])
def test_training_improves_over_init(experiment_type, synth_data, tmp_path):
    train, test = synth_data
    cfg = _tiny_cfg(experiment_type)
    trainer = Trainer(cfg=cfg, model=get_model(experiment_type),
                      train_data=train, test_data=test,
                      run_dir=str(tmp_path / "run"))
    state = trainer.init_state()
    m0 = trainer.evaluate(state)
    losses = []
    rng = np.random.RandomState(0)
    for epoch in range(4):
        for _, batch in batch_iterator(train, 32, shuffle=True, rng=rng):
            step_rng = jax.random.PRNGKey(state.step)
            state.params, state.opt_state, metrics = trainer.train_step(
                state.params, state.opt_state, batch, step_rng)
            state.step += 1
            losses.append(float(metrics["loss"]))
    m1 = trainer.evaluate(state)
    assert np.isfinite(losses[-1])
    half = len(losses) // 2
    if experiment_type == "bpr":
        # the reference's one-shared-negative BPR loss (Model/BPRMF.py:43) is
        # high-variance; require a downward trend, not a fixed drop
        assert np.mean(losses[half:]) < np.mean(losses[:half])
        assert m1["hr@10"] > m0["hr@10"]
    else:
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.95
        assert m1["hr@10"] >= m0["hr@10"]


def test_trainer_fit_runs_and_tracks_best(synth_data, tmp_path):
    train, test = synth_data
    cfg = _tiny_cfg("Gru4Rec", **{"train.eval_freq": 5})
    trainer = Trainer(cfg=cfg, model=get_model("Gru4Rec"),
                      train_data=train, test_data=test,
                      run_dir=str(tmp_path / "run"))
    state = trainer.fit(max_epochs=1, max_steps=12)
    assert state.step == 12
    assert "hr@10" in trainer.best


# ------------------------------------------------------------ checkpoint

def test_checkpoint_roundtrip(synth_data, tmp_path):
    train, test = synth_data
    cfg = _tiny_cfg("MTAM")
    model = get_model("MTAM")
    params = model.init(jax.random.PRNGKey(0), cfg.model, train.meta)
    opt = make_optimizer(cfg.train)
    state = TrainState(params=params, opt_state=opt.init(params), step=7)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, wait=True)
    assert ckpt.latest_step() == 7

    template = TrainState(params=jax.tree.map(jnp.zeros_like, params),
                          opt_state=opt.init(params), step=0)
    restored = ckpt.restore(template)
    ckpt.close()
    assert restored.step == 7
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_type_modes(synth_data, tmp_path):
    train, _ = synth_data
    cfg = _tiny_cfg("bpr")
    model = get_model("bpr")
    params = model.init(jax.random.PRNGKey(0), cfg.model, train.meta)
    opt = make_optimizer(cfg.train)
    state = TrainState(params=params, opt_state=opt.init(params), step=11)
    ckpt_dir = str(tmp_path / "modes")
    Checkpointer(ckpt_dir).save(state, wait=True)

    fresh = TrainState(params=jax.tree.map(jnp.zeros_like, params),
                       opt_state=opt.init(params), step=0)
    # from_scratch: untouched
    out = apply_load_type(cfg.train, fresh, ckpt_dir)
    assert out.step == 0 and float(jax.tree.leaves(out.params)[0].sum()) == 0.0
    # full: params + step restored
    cfg_full = cfg.train.__class__(**{**cfg.train.__dict__, "load_type": "full"})
    out = apply_load_type(cfg_full, fresh, ckpt_dir)
    assert out.step == 11
    # fine_tune: params restored, step reset, fresh opt state
    cfg_ft = cfg.train.__class__(**{**cfg.train.__dict__,
                                    "load_type": "fine_tune",
                                    "fine_tune_load_path": ckpt_dir})
    out = apply_load_type(cfg_ft, fresh, ckpt_dir, optimizer_init=opt.init)
    assert out.step == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(out.params)[0]),
        np.asarray(jax.tree.leaves(params)[0]))


def test_missing_checkpoint_raises(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ckpt.restore(None)


def test_load_type_with_cursor(synth_data, tmp_path):
    """apply_load_type(with_cursor=True) returns (state, cursor):
    the saved cursor for 'full', None for from_scratch/fine_tune and for
    pre-cursor checkpoints."""
    train, _ = synth_data
    cfg = _tiny_cfg("bpr")
    model = get_model("bpr")
    params = model.init(jax.random.PRNGKey(0), cfg.model, train.meta)
    opt = make_optimizer(cfg.train)
    state = TrainState(params=params, opt_state=opt.init(params), step=7)
    cur = {"epoch": 2, "step_at_epoch_start": 5,
           "rng": [0, 1], "np_keys": [3] * 624, "np_pos": 4,
           "np_has_gauss": 0, "np_cached": 0.0}
    with_dir = str(tmp_path / "with")
    Checkpointer(with_dir).save(state, cursor=cur, wait=True)
    without_dir = str(tmp_path / "without")
    Checkpointer(without_dir).save(state, wait=True)

    cfg_full = cfg.train.__class__(**{**cfg.train.__dict__,
                                      "load_type": "full"})
    out, got = apply_load_type(cfg_full, state, with_dir, with_cursor=True)
    assert out.step == 7 and got["epoch"] == 2 \
        and got["step_at_epoch_start"] == 5
    out, got = apply_load_type(cfg_full, state, without_dir,
                               with_cursor=True)
    assert out.step == 7 and got is None
    out, got = apply_load_type(cfg.train, state, with_dir, with_cursor=True)
    assert got is None  # from_scratch never resumes a cursor


def test_legacy_checkpoint_restore(synth_data, tmp_path):
    """Checkpoints written by the pre-Composite code (plain StandardSave,
    stored under Orbax's 'default' item) must still restore instead of
    raising ValueError (ADVICE.md round-1 finding 1)."""
    import orbax.checkpoint as ocp
    train, _ = synth_data
    cfg = _tiny_cfg("bpr")
    model = get_model("bpr")
    params = model.init(jax.random.PRNGKey(0), cfg.model, train.meta)
    opt = make_optimizer(cfg.train)
    state = TrainState(params=params, opt_state=opt.init(params), step=9)
    legacy_dir = str(tmp_path / "legacy")
    # write exactly what the previous Checkpointer.save wrote
    mgr = ocp.CheckpointManager(
        legacy_dir, options=ocp.CheckpointManagerOptions(create=True))
    mgr.save(9, args=ocp.args.StandardSave(
        {"params": state.params, "opt_state": state.opt_state}))
    mgr.wait_until_finished()
    mgr.close()

    template = TrainState(params=jax.tree.map(jnp.zeros_like, params),
                          opt_state=opt.init(params), step=0)
    ckpt = Checkpointer(legacy_dir)
    restored, cursor = ckpt.restore(template, with_cursor=True)
    ckpt.close()
    assert restored.step == 9 and cursor is None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(params)[0]))
    # and through the cli's apply_load_type path
    cfg_full = cfg.train.__class__(**{**cfg.train.__dict__,
                                      "load_type": "full"})
    out, got = apply_load_type(cfg_full, template, legacy_dir,
                               with_cursor=True)
    assert out.step == 9 and got is None


def test_fit_noop_when_resumed_past_max_steps(synth_data, tmp_path):
    """Resuming fit() with state.step >= max_steps must run ZERO optimizer
    steps (ADVICE.md round-1 finding 2: the superstep chunk clamp used to
    execute one extra step)."""
    train, test = synth_data
    cfg = _tiny_cfg("Gru4Rec")
    trainer = Trainer(cfg=cfg, model=get_model("Gru4Rec"),
                      train_data=train, test_data=test,
                      run_dir=str(tmp_path / "run"))
    state = trainer.fit(max_epochs=1, max_steps=4)
    assert state.step == 4
    before = [np.asarray(x).copy() for x in jax.tree.leaves(state.params)]
    state = trainer.fit(state, max_epochs=1, max_steps=4)  # fleet retry
    assert state.step == 4
    for a, b in zip(before, jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_auc_metric():
    import jax
    from mtamrecommender_tpu.train.evaluate import auc
    scores = jnp.asarray([[10.0, 0.0, 0.0, 0.0],
                          [0.0, 0.0, 0.0, -10.0]])
    targets = jnp.asarray([0, 3])
    valid = jnp.ones((2,))
    # row 0 target always wins; row 1 target always loses
    val = float(auc(scores, targets, valid, jax.random.PRNGKey(0),
                    num_negatives=8))
    assert 0.3 < val < 0.8


def test_tb_archive_roundtrip(tmp_path):
    from mtamrecommender_tpu.utils import tb_tools
    run = tmp_path / "runs" / "exp1"
    run.mkdir(parents=True)
    (run / "events.jsonl").write_text('{"step": 1}\n')
    written = tb_tools.archive_runs(str(tmp_path / "runs"),
                                    str(tmp_path / "arch"))
    assert len(written) == 1
    out_root = tmp_path / "restored"
    tb_tools.extract_archives(str(tmp_path / "arch"), str(out_root))
    assert (out_root / "exp1" / "events.jsonl").exists()


def test_device_resident_path_matches_host_path(synth_data, tmp_path):
    """The in-jit batch-gather path must reproduce the host pipeline's
    trajectory exactly (same shuffle stream, same padding semantics)."""
    train, test = synth_data
    results = []
    for device_resident in (False, True):
        cfg = _tiny_cfg("Gru4Rec", **{"model.dropout": 0.0})
        trainer = Trainer(cfg=cfg, model=get_model("Gru4Rec"),
                          train_data=train, test_data=test,
                          run_dir=str(tmp_path / f"run{device_resident}"),
                          device_resident=device_resident)
        state = trainer.fit(max_epochs=1, max_steps=9)
        results.append(jax.device_get(state.params))
    for a, b in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_resume_trajectory_exact(synth_data, tmp_path):
    """Interrupt mid-epoch, checkpoint with the data cursor, restore into
    a FRESH trainer, resume — final params must be bitwise-equal to an
    uninterrupted run (epoch shuffle replayed, rng chain fast-forwarded,
    already-trained steps skipped)."""
    train, test = synth_data
    n_steps = -(-len(train) // 32)
    assert n_steps >= 3

    def fresh(tag):
        cfg = _tiny_cfg("Gru4Rec", **{"model.dropout": 0.0})
        return Trainer(cfg=cfg, model=get_model("Gru4Rec"),
                       train_data=train, test_data=test,
                       run_dir=str(tmp_path / tag))

    # uninterrupted: 2 epochs
    t_full = fresh("full")
    full = t_full.fit(max_epochs=2)

    # interrupted mid-epoch-1 (epoch 0 complete + 2 steps), then resumed
    t_a = fresh("a")
    mid = t_a.fit(max_epochs=2, max_steps=n_steps + 2)
    ckpt = Checkpointer(str(tmp_path / "ckpt_cursor"))
    ckpt.save(mid, cursor=t_a._cursor, wait=True)
    t_b = fresh("b")
    template = TrainState(params=t_b.init_state().params,
                          opt_state=t_b.optimizer.init(
                              t_b.init_state().params), step=0)
    restored, cursor = ckpt.restore(template, with_cursor=True)
    ckpt.close()
    assert cursor is not None and restored.step == n_steps + 2
    start_epoch, skip = t_b.resume_from_cursor(cursor, restored)
    assert (start_epoch, skip) == (1, 2)
    resumed = t_b.fit(restored, max_epochs=2, start_epoch=start_epoch,
                      skip_steps=skip)

    assert resumed.step == full.step
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_superstep_matches_per_step_device_path(synth_data, tmp_path):
    """steps_per_call > 1 (lax.scan of K optimizer steps per jit call)
    must reproduce the single-step device path's trajectory exactly —
    same rng split chain, same batch gathers, same eval/stop steps.
    K=4 with max_steps=9 exercises full chunks, the eval-boundary clamp
    and the max_steps remainder."""
    train, test = synth_data
    results = []
    for steps_per_call in (1, 4):
        cfg = _tiny_cfg("Gru4Rec", **{"model.dropout": 0.0,
                                      "train.steps_per_call": steps_per_call})
        trainer = Trainer(cfg=cfg, model=get_model("Gru4Rec"),
                          train_data=train, test_data=test,
                          run_dir=str(tmp_path / f"run{steps_per_call}"))
        state = trainer.fit(max_epochs=1, max_steps=9)
        assert state.step == 9
        results.append(jax.device_get(state.params))
    for a, b in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_divergence_surfaces(synth_data, tmp_path):
    """A non-finite loss raises instead of being swallowed
    (reference swallows step errors; we deliberately do not)."""
    train, test = synth_data
    cfg = _tiny_cfg("Gru4Rec", **{"train.learning_rate": 1e25,
                                  "train.display_freq": 1,
                                  "train.max_gradient_norm": 1e12})
    trainer = Trainer(cfg=cfg, model=get_model("Gru4Rec"),
                      train_data=train, test_data=test,
                      run_dir=str(tmp_path / "run"))
    with pytest.raises(FloatingPointError):
        trainer.fit(max_epochs=3, max_steps=60)


def test_best_so_far_survives_cursor_resume(synth_data, tmp_path):
    """Models under the reference protocol peak early (train_process.py
    best-so-far tracking at :279-288), so a watchdog retry of a long run
    must not restart `best` from zero: the cursor carries the maxima and
    resume_from_cursor restores them."""
    train, test = synth_data
    cfg = _tiny_cfg("Gru4Rec")
    t_a = Trainer(cfg=cfg, model=get_model("Gru4Rec"), train_data=train,
                  test_data=test, run_dir=str(tmp_path / "a"))
    t_a.best = {"hr@10": 0.61, "ndcg@10": 0.44}
    cur = t_a._capture_cursor(epoch=1, epoch_start_step=5)
    assert cur["best"] == {"hr@10": 0.61, "ndcg@10": 0.44}

    # the shipped flow: a FRESH trainer restores the dict verbatim
    t_b = Trainer(cfg=cfg, model=get_model("Gru4Rec"), train_data=train,
                  test_data=test, run_dir=str(tmp_path / "b"))
    state = t_b.init_state()
    t_b.resume_from_cursor(cur, state)
    assert t_b.best == {"hr@10": 0.61, "ndcg@10": 0.44}

    # merging into a non-empty tracker uses the reference's PAIRED rule
    # (train_process.py:279-288): hr and ndcg at the same k must BOTH
    # improve, so the merge can never report an (hr, ndcg) pair that
    # never co-occurred in one eval (ADVICE.md r3)
    t_b2 = Trainer(cfg=cfg, model=get_model("Gru4Rec"), train_data=train,
                   test_data=test, run_dir=str(tmp_path / "b2"))
    t_b2.best = {"hr@10": 0.10, "ndcg@10": 0.50}  # hr worse, ndcg better
    t_b2.resume_from_cursor(cur, t_b2.init_state())
    assert t_b2.best == {"hr@10": 0.10, "ndcg@10": 0.50}  # pair kept intact
    t_b3 = Trainer(cfg=cfg, model=get_model("Gru4Rec"), train_data=train,
                   test_data=test, run_dir=str(tmp_path / "b3"))
    t_b3.best = {"hr@10": 0.10, "ndcg@10": 0.20}  # both worse -> replaced
    t_b3.resume_from_cursor(cur, t_b3.init_state())
    assert t_b3.best == {"hr@10": 0.61, "ndcg@10": 0.44}

    # pre-r3 cursors have no "best" key: restore must not fail
    del cur["best"]
    t_c = Trainer(cfg=cfg, model=get_model("Gru4Rec"), train_data=train,
                  test_data=test, run_dir=str(tmp_path / "c"))
    t_c.resume_from_cursor(cur, t_c.init_state())
    assert t_c.best == {}


def test_checkpoint_cursor_carries_intra_epoch_best(synth_data, tmp_path):
    """_cursor_for_save refreshes ONLY the best field: evals that ran
    since the epoch started must travel with the checkpoint (the ADVICE r3
    medium finding — eval_freq < epoch length silently lost intra-epoch
    peaks on resume), while the rng/epoch fields stay frozen at the epoch
    start so the shuffle replays exactly."""
    train, test = synth_data
    cfg = _tiny_cfg("Gru4Rec")
    t = Trainer(cfg=cfg, model=get_model("Gru4Rec"), train_data=train,
                test_data=test, run_dir=str(tmp_path / "run"))
    t.best = {"hr@10": 0.2}
    t._cursor = t._capture_cursor(epoch=3, epoch_start_step=42)
    assert t._cursor["best"] == {"hr@10": 0.2}
    t.best["hr@10"] = 0.9            # an intra-epoch eval improved it
    saved = t._cursor_for_save()
    assert saved["best"] == {"hr@10": 0.9}
    assert saved["epoch"] == 3 and saved["step_at_epoch_start"] == 42
    assert saved["rng"] == t._cursor["rng"]          # epoch-start rng kept
    assert t._cursor["best"] == {"hr@10": 0.2}       # original untouched

    t._cursor = None                 # pre-first-epoch save path
    assert t._cursor_for_save() is None


@pytest.mark.parametrize("knob", ["flatten_optimizer", "pack_small_leaves"])
def test_flatten_optimizer_update_parity(synth_data, knob):
    """train.flatten_optimizer (ravel everything) and
    train.pack_small_leaves (ravel only the small leaves, tables
    standalone) must produce the per-leaf chain's exact updates to float
    tolerance (the global-norm sum order is the only difference)."""
    from mtamrecommender_tpu.train.trainer import (make_optimizer,
                                                   make_train_step)
    train, _ = synth_data
    cfg = _tiny_cfg("MTAM")
    cfg_flat = cfg.with_overrides(**{f"train.{knob}": True})
    model = get_model("MTAM")
    params = model.init(jax.random.PRNGKey(0), cfg.model, train.meta)
    batch_it = batch_iterator(train, 16)
    _, batch = next(batch_it)
    rng = jax.random.PRNGKey(7)

    p_ref, p_flat = params, params
    opt_ref = make_optimizer(cfg.train)
    opt_flat = make_optimizer(cfg_flat.train)
    s_ref, s_flat = opt_ref.init(p_ref), opt_flat.init(p_flat)
    step_ref = make_train_step(model, cfg, opt_ref, train.meta.item_vocab)
    step_flat = make_train_step(model, cfg_flat, opt_flat,
                                train.meta.item_vocab)
    for i in range(3):   # a few steps so opt-state moments diverge if wrong
        _, b = next(batch_it)
        p_ref, s_ref, m_ref = step_ref(p_ref, s_ref, b, rng)
        p_flat, s_flat, m_flat = step_flat(p_flat, s_flat, b, rng)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_flat["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_dynamic_superstep_matches_fixed(synth_data, tmp_path):
    """make_dynamic_superstep (one executable, traced trip count) must be
    trajectory-identical to make_superstep's per-size scan for every
    chunk size — it is what fit() runs, so boundary remainder chunks
    (e.g. 97-step epoch tails) ride the same compile as full chunks."""
    from mtamrecommender_tpu.data import device_data as dd
    from mtamrecommender_tpu.train.trainer import (make_dynamic_superstep,
                                                   make_optimizer,
                                                   make_superstep)

    train, _ = synth_data
    cfg = _tiny_cfg("Gru4Rec")
    model = get_model("Gru4Rec")
    params = model.init(jax.random.PRNGKey(0), cfg.model, train.meta)
    opt = make_optimizer(cfg.train)
    data = dd.to_device(train)
    order = jnp.arange(len(train), dtype=jnp.int32)
    bs, vocab = 16, train.meta.item_vocab

    dyn = make_dynamic_superstep(model, cfg, opt, vocab, bs, max_sub=8)
    for n in (8, 5, 1):
        fixed = make_superstep(model, cfg, opt, vocab, bs)(n)
        rng = jax.random.PRNGKey(42)
        p_f, o_f, st_f, rng_f = fixed(params, opt.init(params), data,
                                      order, 0, rng)
        p_d, o_d, st_d, rng_d = dyn(params, opt.init(params), data,
                                    order, 0, n, rng)
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_d)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(rng_f), np.asarray(rng_d))
        for m in st_f:
            np.testing.assert_array_equal(np.asarray(st_f[m]),
                                          np.asarray(st_d[m])[:n])
