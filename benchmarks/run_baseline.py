"""Baseline measurement runs (SURVEY.md section 6 action item).

The reference repo ships no numbers and its ml-1m ratings blob is absent
from the snapshot (`/root/reference/.MISSING_LARGE_BLOBS`), so the
comparison band is established on `ml1m_synth`: a synthetic behavior log
at ml-1m scale (6040 users / 3706 items / zipf popularity / mixed
minute-to-day gaps) built by data/ingest.load_synthetic with seed 1234.
Every model trains at the reference hyperparameters (d=128, B=256,
L=50, lr 1e-3 staircase decay — config/model_parameter.py:104-395) for
--steps optimizer steps, then reports best HR@k/NDCG@k plus steady-state
training throughput.

Usage:  python benchmarks/run_baseline.py --models MTAM Gru4Rec --steps 2000
Writes: benchmarks/results/baseline_{tag}.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ML1M_SCALE = {
    "data.dataset": "synthetic",
    "data.synth_users": 6040,
    "data.synth_items": 3706,
    "data.synth_categories": 18,
    "data.synth_events_per_user": 40,
    "data.max_seq_len": 50,
    "data.user_count_limit": 10_000_000,
}

DEFAULT_MODELS = ["MTAM", "T_SeqRec", "Gru4Rec", "SASrec",
                  "Ti_Self_Attention_Model", "NARM", "STAMP", "bpr"]


def run_one(name: str, steps: int, use_pallas: bool, bf16: bool,
            train, test, cfg_base, run_tag: str = "",
            resume: bool = False) -> dict:
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.trainer import Trainer

    over = {"model.experiment_type": name}
    if use_pallas:
        over["model.use_pallas"] = True
        # per-family measured winner (steps_r4): the fused GRU kernel
        # always; the readout/attention kernels only where they won.
        # Override with PALLAS_SCOPE=... for experiments.
        over["model.pallas_scope"] = os.environ.get("PALLAS_SCOPE", "gru")
    if os.environ.get("TIME_GATE_MODE"):
        # e.g. TIME_GATE_MODE=scalar: the length-free decay-gate
        # reparameterization (SURVEY.md §5.7) at protocol scale
        over["model.time_gate_mode"] = os.environ["TIME_GATE_MODE"]
    if os.environ.get("TRAIN_SEED"):
        # seed-band runs: vary the TRAINING seed (init/shuffle/dropout)
        # while the dataset stays the fixed seed-1234 synthetic log
        over["train.seed"] = int(os.environ["TRAIN_SEED"])
    if bf16:
        over["model.compute_dtype"] = "bfloat16"
    cfg = cfg_base.with_overrides(**over)
    run_dir = f"benchmarks/results/runs/{run_tag or 'adhoc'}/{name}"
    trainer = Trainer(cfg=cfg, model=get_model(name), train_data=train,
                      test_data=test, run_dir=run_dir)
    # fit runs the device-resident superstep path (steps_per_call from
    # cfg.train): dispatch-free training; best-so-far tracked on the
    # eval_freq cadence like the reference (train_process.py:279-288)
    checkpointer = None
    state = None
    start_epoch = skip_steps = 0
    if resume:
        # long-protocol crash resilience: checkpoint at each eval and
        # resume exactly (incl. best-so-far, carried in the data cursor)
        # when a watchdog retry re-enters this run
        from mtamrecommender_tpu.train.checkpoint import Checkpointer
        checkpointer = Checkpointer(os.path.join(run_dir, "ckpt"))
        state = trainer.init_state()
        latest = checkpointer.latest_step()
        if latest is not None:
            state, cursor = checkpointer.restore(state, with_cursor=True)
            if cursor is not None:
                start_epoch, skip_steps = trainer.resume_from_cursor(
                    cursor, state)
            print(f"resume {name} at step {state.step} "
                  f"(epoch {start_epoch})", flush=True)
    t_wall = time.time()
    state = trainer.fit(state, max_epochs=10 ** 9, max_steps=steps,
                        checkpointer=checkpointer, start_epoch=start_epoch,
                        skip_steps=skip_steps)
    wall = time.time() - t_wall
    m = trainer.evaluate(state)
    bs = cfg.train.train_batch_size
    return {
        "model": name,
        "steps": state.step,
        "wall_s": round(wall, 1),
        # end-to-end including compiles and evals — the isolated
        # train-step throughput lives in bench.py / kernels_r3_honest
        "examples_per_s_e2e": round(bs * state.step / wall, 1),
        **{f"best_{k}": round(v, 4) for k, v in trainer.best.items()},
        **{k: round(v, 4) for k, v in m.items()},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=DEFAULT_MODELS)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--tag", default="r1")
    ap.add_argument("--dataset", default="synthetic",
                    help="synthetic | synthetic_sessions")
    ap.add_argument("--events_per_user", type=int, default=40)
    ap.add_argument("--skip_floors", action="store_true",
                    help="skip TopPop/P-Pop (already recorded elsewhere)")
    ap.add_argument("--use_pallas", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--num_units", type=int, default=128)
    ap.add_argument("--eval_freq", type=int, default=10_000_000,
                    help="best-so-far eval cadence (default: end only)")
    ap.add_argument("--steps_per_call", type=int, default=100,
                    help="superstep size (1 = per-step dispatch)")
    ap.add_argument("--resume", action="store_true",
                    help="checkpoint at each eval and resume exactly on "
                         "re-entry (long-protocol watchdog retries)")
    args = ap.parse_args()

    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data import fastprep
    from mtamrecommender_tpu.data.ingest import load_origin_data
    from mtamrecommender_tpu.models.top_pop import eval_p_pop, eval_top_pop
    from mtamrecommender_tpu.data.prepare import prepare_examples

    cfg_base = ExperimentConfig().with_overrides(**{
        **ML1M_SCALE,
        "data.dataset": args.dataset,
        "data.synth_events_per_user": args.events_per_user,
        "model.num_units": args.num_units,
        "train.eval_freq": args.eval_freq,
        # save on the eval cadence so a watchdog retry resumes from the
        # newest evaluated step (fit saves only when step %% save_freq == 0)
        "train.save_freq": args.eval_freq if args.resume else 50_000,
        "train.display_freq": 500,
        "train.steps_per_call": args.steps_per_call,
    })
    origin = load_origin_data(cfg_base.data)
    print(f"events={len(origin)}", flush=True)
    train, test, meta = fastprep.build_packed(origin, cfg_base.data)
    print(f"train={len(train)} test={len(test)} items={meta.item_count}",
          flush=True)

    results = {"config": {"steps": args.steps, "use_pallas": args.use_pallas,
                          "bf16": args.bf16, "num_units": args.num_units,
                          "events": len(origin), "train": len(train),
                          "test": len(test)},
               "models": []}

    if not args.skip_floors:
        # non-learned floors once (python example path needed for tuples)
        prepared = prepare_examples(origin, cfg_base.data)
        results["top_pop"] = {k: round(v, 4) for k, v in eval_top_pop(
            prepared.train_set, prepared.test_set).items()}
        results["p_pop"] = {k: round(v, 4) for k, v in eval_p_pop(
            prepared.train_set, prepared.test_set).items()}
        print("TopPop:", results["top_pop"], flush=True)

    for name in args.models:
        print(f"=== {name}", flush=True)
        r = run_one(name, args.steps, args.use_pallas, args.bf16,
                    train, test, cfg_base, run_tag=args.tag,
                    resume=args.resume)
        print(json.dumps(r), flush=True)
        results["models"].append(r)
        out = os.path.join("benchmarks", "results",
                           f"baseline_{args.tag}.json")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print("written", out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
