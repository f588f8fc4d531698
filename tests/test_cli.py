"""CLI / fleet / TopPop / figures tests (the orchestration layer,
reference train_process.py + run_server.py + top_pop_model.py +
util/generate_figure.py)."""

import json
import os

import numpy as np
import pytest

from mtamrecommender_tpu import cli
from mtamrecommender_tpu.config import DataConfig
from mtamrecommender_tpu.data.ingest import load_synthetic
from mtamrecommender_tpu.data.prepare import prepare_examples
from mtamrecommender_tpu.models import top_pop
from mtamrecommender_tpu.utils import figures


SMALL = ["--type", "synthetic",
         "--set", "data.synth_users=60", "--set", "data.synth_items=40",
         "--set", "data.max_seq_len=8", "--set", "model.num_units=8",
         "--set", "model.num_blocks=1",
         "--set", "train.train_batch_size=32",
         "--set", "train.test_batch_size=64",
         "--set", "train.eval_freq=1000"]


def test_build_config_overrides():
    args = cli.make_parser().parse_args(
        ["--experiment_name", "MTAMb7_elec", "--set", "model.num_blocks=9",
         "--set", "train.learning_rate=0.01", "--version", "x"])
    cfg = cli.build_config(args)
    assert cfg.model.experiment_type == "MTAM"
    assert cfg.model.num_blocks == 9
    assert cfg.train.learning_rate == 0.01
    assert cfg.version == "x"


def test_build_config_model_parallel():
    args = cli.make_parser().parse_args(["--model_parallel", "2"])
    cfg = cli.build_config(args)
    assert cfg.mesh.model_axis_size == 2
    assert cfg.mesh.shard_embeddings
    assert cfg.model.vocab_pad_multiple == 128


def test_cli_statistics(tmp_path, capsys):
    rc = cli.main(SMALL + ["--statistics", "--data_root", str(tmp_path)])
    assert rc == 0


def test_cli_top_pop(tmp_path):
    rc = cli.main(SMALL + ["--top_pop", "--data_root", str(tmp_path)])
    assert rc == 0


def test_cli_end_to_end_train(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(SMALL + ["--experiment_type", "bpr", "--max_steps", "12",
                           "--version", "clitest",
                           "--run_root", str(tmp_path / "runs"),
                           "--data_root", str(tmp_path / "data")])
    assert rc == 0
    run_dir = tmp_path / "runs" / "synthetic_bpr_clitest"
    events = (run_dir / "events.jsonl").read_text().strip().splitlines()
    assert len(events) >= 2
    rec = json.loads(events[-1])
    assert "hr@10" in rec or "train_loss" in rec
    # checkpoint written
    assert (tmp_path / "data" / "check_point" / "synthetic_bpr_clitest").exists()


def test_cli_python_builder_writes_cache(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(SMALL + ["--experiment_type", "bpr", "--max_steps", "2",
                           "--version", "cachetest", "--no_fast_prep",
                           "--run_root", str(tmp_path / "runs"),
                           "--data_root", str(tmp_path / "data")])
    assert rc == 0
    # example cache written by the Python builder path
    assert (tmp_path / "data" / "train_data" / "synthetic").exists()


def test_cli_unknown_preset_fails():
    with pytest.raises(SystemExit):
        cli.make_parser().parse_args(["--experiment_name", "nope"])


@pytest.fixture(scope="module")
def prepared():
    cfg = DataConfig(dataset="synthetic", synth_users=50, synth_items=30,
                     synth_categories=4, synth_events_per_user=10,
                     max_seq_len=8, user_count_limit=10_000)
    return prepare_examples(load_synthetic(cfg), cfg)


def test_top_pop_beats_nothing_and_bounded(prepared):
    m = top_pop.eval_top_pop(prepared.train_set, prepared.test_set)
    p = top_pop.eval_p_pop(prepared.train_set, prepared.test_set)
    for metrics in (m, p):
        for k, v in metrics.items():
            assert 0.0 <= v <= 1.0, (k, v)
    assert m["hr@30"] >= m["hr@10"] >= m["hr@1"]
    # popularity must beat uniform-random HR@10 (10/30 items would be
    # 0.33 only for uniform targets; zipf-ish synthetic makes TopPop high)
    assert m["hr@10"] > 10.0 / 30.0 * 0.5


def test_figures_tsne_and_heatmap(prepared, tmp_path):
    rng = np.random.RandomState(0)
    table = rng.randn(33, 8).astype(np.float32)
    coords, labels = figures.item_embedding_tsne(
        table, prepared.item_category, max_items=25)
    assert coords.shape == (min(25, len(prepared.item_category)), 2)
    assert labels.shape[0] == coords.shape[0]

    heat = figures.history_similarity_heatmap(rng.randn(8, 8), 5)
    assert heat.shape == (5, 5)
    np.testing.assert_allclose(np.diag(heat), 1.0, atol=1e-5)

    out = figures.save_heatmap_figure(heat, str(tmp_path / "h.png"))
    if out is not None:
        assert os.path.exists(out)


def test_figures_from_checkpoint(tmp_path):
    """The standalone checkpoint-restore figure driver (the reference's
    util/generate_figure.py:52 restores WITHOUT the trainer): train
    briefly, checkpoint, render from the checkpoint alone."""
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.pipeline import batch_iterator, pack_examples
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.checkpoint import Checkpointer
    from mtamrecommender_tpu.train.trainer import Trainer

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM", "model.num_units": 16,
        "model.num_blocks": 1, "data.max_seq_len": 8,
        "data.synth_users": 50, "data.synth_items": 30,
        "data.synth_categories": 4, "data.synth_events_per_user": 10,
        "data.dataset": "synthetic",
        "train.train_batch_size": 32, "train.test_batch_size": 64,
        "train.eval_freq": 1000})
    prepared = prepare_examples(load_synthetic(cfg.data), cfg.data)
    train = pack_examples(prepared.train_set, prepared.meta)
    test = pack_examples(prepared.test_set, prepared.meta)
    trainer = Trainer(cfg=cfg, model=get_model("MTAM"), train_data=train,
                      test_data=test, run_dir=str(tmp_path / "run"))
    state = trainer.fit(max_epochs=1, max_steps=3)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, wait=True)
    ckpt.close()

    _, batch = next(batch_iterator(test, 4))
    arrays, paths = figures.generate_from_checkpoint(
        cfg, prepared.meta, prepared.item_category, str(tmp_path / "ckpt"),
        str(tmp_path / "figs"), test_batch=batch, user_rows=2, max_items=20)
    assert arrays["tsne_coords"].shape == (20, 2)
    assert len(arrays["heatmaps"]) == 2
    for hm, sl in zip(arrays["heatmaps"], np.asarray(batch.seq_len)[:2]):
        assert hm.shape == (sl, sl)
        np.testing.assert_allclose(np.diag(hm), 1.0, atol=1e-5)
    for p in paths.values():
        if p is not None:
            assert os.path.exists(p)


def test_figures_cli_main(tmp_path):
    """figures.main() end-to-end on a tiny checkpoint with NON-default
    shape-affecting knobs (scalar gate, vocab padding) passed via
    --config_json — the restore fails with an Orbax shape error if the
    CLI drops any of them (ADVICE r4)."""
    import json

    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.pipeline import pack_examples
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.checkpoint import Checkpointer
    from mtamrecommender_tpu.train.trainer import Trainer

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM", "model.num_units": 16,
        "model.num_blocks": 1, "data.max_seq_len": 8,
        "model.time_gate_mode": "scalar", "model.vocab_pad_multiple": 8,
        "data.synth_users": 50, "data.synth_items": 30,
        "data.synth_categories": 4, "data.synth_events_per_user": 10,
        "data.dataset": "synthetic",
        "train.train_batch_size": 32, "train.test_batch_size": 64,
        "train.eval_freq": 1000})
    prepared = prepare_examples(load_synthetic(cfg.data), cfg.data)
    train = pack_examples(prepared.train_set, prepared.meta)
    test = pack_examples(prepared.test_set, prepared.meta)
    trainer = Trainer(cfg=cfg, model=get_model("MTAM"), train_data=train,
                      test_data=test, run_dir=str(tmp_path / "run"))
    state = trainer.fit(max_epochs=1, max_steps=3)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, wait=True)
    ckpt.close()
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))

    rc = figures.main(["--checkpoint", str(tmp_path / "ckpt"),
                       "--config_json", str(cfg_path),
                       "--out_dir", str(tmp_path / "figs"),
                       "--heatmap_users", "2", "--max_items", "20"])
    assert rc == 0


def test_recommender_serving(tmp_path):
    """serve.Recommender: train briefly, checkpoint, restore, recommend."""
    import jax
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.pipeline import pack_examples
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.serve import Recommender
    from mtamrecommender_tpu.train.checkpoint import Checkpointer
    from mtamrecommender_tpu.train.trainer import Trainer

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "MTAM", "model.num_units": 16,
        "model.num_blocks": 1, "data.max_seq_len": 8,
        "data.synth_users": 50, "data.synth_items": 30,
        "data.synth_categories": 4, "data.synth_events_per_user": 10,
        "data.dataset": "synthetic",
        "train.train_batch_size": 32, "train.test_batch_size": 64,
        "train.eval_freq": 1000})
    prepared = prepare_examples(load_synthetic(cfg.data), cfg.data)
    train = pack_examples(prepared.train_set, prepared.meta)
    test = pack_examples(prepared.test_set, prepared.meta)
    trainer = Trainer(cfg=cfg, model=get_model("MTAM"), train_data=train,
                      test_data=test, run_dir=str(tmp_path / "run"))
    state = trainer.fit(max_epochs=1, max_steps=5)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, wait=True)
    ckpt.close()

    rec = Recommender.from_checkpoint(cfg, prepared.meta,
                                      str(tmp_path / "ckpt"))
    hour = 3600.0
    histories = [[(3, 1, 100 * hour), (5, 2, 120 * hour), (7, 1, 130 * hour)],
                 [(2, 1, 90 * hour)]]
    out = rec.recommend(histories, request_times=[140 * hour, 95 * hour], k=5)
    assert len(out) == 2 and all(len(r) == 5 for r in out)
    for recs, hist in zip(out, histories):
        ids = [i for i, _ in recs]
        assert len(set(ids)) == 5
        # history exclusion
        assert not (set(ids) & {e[0] for e in hist})
        # scores sorted descending
        scores = [s for _, s in recs]
        assert scores == sorted(scores, reverse=True)
        # recommendations stay inside the logical vocab
        assert max(ids) < prepared.meta.item_vocab


def test_fleet_single_experiment(tmp_path, monkeypatch):
    """fleet.main launches one CLI subprocess and reports success."""
    import os
    import subprocess
    import sys
    monkeypatch.chdir(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    # force the subprocess onto CPU: without PALLAS_AXON_POOL_IPS the
    # site hook skips TPU registration and JAX_PLATFORMS applies
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # run the fleet driver itself as a subprocess so cwd/log capture are real
    proc = subprocess.run(
        [sys.executable, "-m", "mtamrecommender_tpu.fleet",
         "--datasets", "synthetic", "--models", "bpr", "--max_steps", "3",
         "--run_root", str(tmp_path / "runs"),
         "--log_dir", str(tmp_path / "logs"),
         "--set", "data.synth_users=40", "--set", "data.synth_items=25",
         "--set", "data.max_seq_len=6", "--set", "model.num_units=8",
         "--set", "train.train_batch_size=16",
         "--set", "train.test_batch_size=32",
         "--set", "train.eval_freq=1000"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "finished synthetic/bpr: ok" in proc.stdout
    log = (tmp_path / "logs" / "synthetic_bpr.log").read_text()
    assert "done at step 3" in log


def test_serve_cli_json_lines(tmp_path, monkeypatch):
    """The serving CLI answers JSON-line requests from a checkpoint."""
    import io
    import json
    import sys

    import jax
    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.pipeline import pack_examples
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu import serve
    from mtamrecommender_tpu.train.checkpoint import Checkpointer
    from mtamrecommender_tpu.train.trainer import (TrainState, make_optimizer)

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": "bpr", "model.num_units": 8,
        "data.max_seq_len": 6})
    from helpers import make_meta
    meta = make_meta(item_count=30, user_count=20, category_count=4,
                     max_seq_len=6)
    model = get_model("bpr")
    params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
    opt = make_optimizer(cfg.train)
    st = TrainState(params=params, opt_state=opt.init(params), step=1)
    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(st, wait=True)
    ckpt.close()

    req = {"history": [[3, 1, 360000], [5, 2, 363600]],
           "request_time": 370000, "user_id": 2, "k": 4}
    monkeypatch.setattr(sys, "stdin", io.StringIO(json.dumps(req) + "\n"))
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    rc = serve.main(["--checkpoint", str(tmp_path / "ck"),
                     "--experiment_type", "bpr", "--items", "30",
                     "--users", "20", "--categories", "4",
                     "--max_seq_len", "6", "--num_units", "8"])
    assert rc == 0
    resp = json.loads(out.getvalue().strip().splitlines()[-1])
    assert len(resp["items"]) == 4 and len(resp["scores"]) == 4
