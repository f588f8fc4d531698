"""benchmarks/run_baseline.py --resume: a watchdog retry of a long
protocol run must continue from the last evaluated checkpoint (params,
data cursor AND best-so-far), not restart from scratch.  This is the
crash-resilience layer under the 200-epoch comparison protocol
(reference: train_process.py:315 max_epochs loop + :279-288 best
tracking)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from mtamrecommender_tpu.config import ExperimentConfig


@pytest.fixture()
def tiny_cfg_base():
    return ExperimentConfig().with_overrides(**{
        "data.dataset": "synthetic", "data.synth_users": 80,
        "data.synth_items": 50, "data.synth_categories": 5,
        "data.synth_events_per_user": 12, "data.max_seq_len": 10,
        "data.user_count_limit": 10_000_000,
        "model.experiment_type": "Gru4Rec", "model.num_units": 8,
        "train.train_batch_size": 16, "train.test_batch_size": 32,
        "train.eval_freq": 20, "train.save_freq": 20,
        "train.display_freq": 20, "train.steps_per_call": 8})


def test_run_one_resumes_from_checkpoint(tiny_cfg_base, tmp_path,
                                         monkeypatch):
    import run_baseline
    from mtamrecommender_tpu.data import fastprep
    from mtamrecommender_tpu.data.ingest import load_origin_data

    monkeypatch.chdir(tmp_path)   # run_dir/ckpt paths are cwd-relative
    origin = load_origin_data(tiny_cfg_base.data)
    train, test, _ = fastprep.build_packed(origin, tiny_cfg_base.data)

    # "crash" after 40 steps (the runner's own checkpoint cadence), then
    # re-enter with the full budget, as run_matrix.sh RESUME=1 does
    r1 = run_baseline.run_one("Gru4Rec", 40, False, False, train, test,
                              tiny_cfg_base, run_tag="t", resume=True)
    assert r1["steps"] == 40
    r2 = run_baseline.run_one("Gru4Rec", 60, False, False, train, test,
                              tiny_cfg_base, run_tag="t", resume=True)
    assert r2["steps"] == 60
    # best-so-far carried across the re-entry: the final report can never
    # be worse than what the interrupted run had already evaluated
    for k in ("best_hr@10", "best_ndcg@10"):
        assert r2[k] >= r1[k] - 1e-9

    # fresh tag = fresh run (no accidental cross-run resume)
    r3 = run_baseline.run_one("Gru4Rec", 8, False, False, train, test,
                              tiny_cfg_base, run_tag="t2", resume=True)
    assert r3["steps"] == 8
