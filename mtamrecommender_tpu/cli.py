"""Training CLI — the `train_process.py` equivalent.

Usage (mirrors `/root/reference/train_process.py` + its tf.flags):

    python -m mtamrecommender_tpu --experiment_name MTAM_ml1m
    python -m mtamrecommender_tpu --type synthetic --experiment_type MTAM \\
        --version v1 --set train.max_epochs=3 --set model.num_blocks=5

Presets come from config.get_preset (the reference's --experiment_name
dispatch, config/model_parameter.py:75-396); every config leaf is
overridable with --set section.leaf=value.  Unlike the reference there is
no global flag mutation — the resolved ExperimentConfig is logged and
frozen before anything runs.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, List, Optional

from mtamrecommender_tpu.config import (ExperimentConfig, get_preset,
                                        preset_names)


def _parse_value(raw: str) -> Any:
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def build_config(args: argparse.Namespace) -> ExperimentConfig:
    cfg = get_preset(args.experiment_name) if args.experiment_name \
        else ExperimentConfig()
    over = {}
    if args.type:
        over["data.dataset"] = args.type
    if args.experiment_type:
        over["model.experiment_type"] = args.experiment_type
    if args.version:
        over["version"] = args.version
    if args.train_batch_size:
        over["train.train_batch_size"] = args.train_batch_size
    if args.load_type:
        over["train.load_type"] = args.load_type
    if args.use_pallas:
        over["model.use_pallas"] = True
    if args.model_parallel > 1:
        over["mesh.model_axis_size"] = args.model_parallel
        over["mesh.shard_embeddings"] = True
        over["model.vocab_pad_multiple"] = max(128, args.model_parallel)
    if args.embedding_engine:
        over["mesh.embedding_engine"] = args.embedding_engine
    for item in args.set or []:
        key, _, raw = item.partition("=")
        over[key] = _parse_value(raw)
    return cfg.with_overrides(**over) if over else cfg


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mtamrecommender_tpu",
        description="TPU-native sequential-recommender training")
    p.add_argument("--experiment_name", choices=preset_names(), default=None,
                   help="named preset (reference --experiment_name)")
    p.add_argument("--type", default=None, help="dataset (reference --type)")
    p.add_argument("--experiment_type", default=None,
                   help="model family (reference --experiment_type)")
    p.add_argument("--version", default=None)
    p.add_argument("--train_batch_size", type=int, default=None)
    p.add_argument("--load_type", default=None,
                   choices=["from_scratch", "full", "fine_tune"])
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="dotted config override, e.g. model.num_blocks=5")
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="model-axis size (row-sharded embedding tables)")
    p.add_argument("--embedding_engine", default=None,
                   choices=["gspmd", "a2a", "psum"],
                   help="sharded-lookup engine: gspmd annotations (default)"
                        " or an explicit shard_map exchange (a2a | psum)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--run_root", default="data/runs")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first steps")
    p.add_argument("--statistics", action="store_true",
                   help="print dataset statistics and exit "
                        "(reference experiment_name=statistics)")
    p.add_argument("--top_pop", action="store_true",
                   help="evaluate the non-learned TopPop/P-Pop baselines")
    p.add_argument("--no_fast_prep", action="store_true",
                   help="force the Python example builder")
    return p




def _enable_compile_cache():
    """Persistent XLA compile cache — first-compile latency on the remote
    TPU service is minutes; the cache makes reruns instant."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main(argv: Optional[List[str]] = None) -> int:
    args = make_parser().parse_args(argv)
    _enable_compile_cache()
    cfg = build_config(args)
    if args.data_root:
        cfg = cfg.with_overrides(**{"data.data_root": args.data_root})

    from mtamrecommender_tpu.data.ingest import data_statistics, load_origin_data
    from mtamrecommender_tpu.data.pipeline import pack_examples
    from mtamrecommender_tpu.data.prepare import prepare_examples
    from mtamrecommender_tpu.utils.logging import create_log

    logger = create_log(cfg.data.dataset, cfg.model.experiment_type,
                        cfg.version)
    logger.info("resolved config: %s", json.dumps(cfg.to_dict()))

    origin = load_origin_data(cfg.data)
    if args.statistics:
        for k, v in data_statistics(origin).items():
            logger.info("statistics %s = %s", k, v)
        return 0

    train = test = None
    if args.top_pop or args.no_fast_prep:
        prepared = None
    else:
        # native example builder (6x+ on large catalogs); falls back to
        # the Python builder for unsupported configs / missing toolchain
        from mtamrecommender_tpu.data import fastprep
        try:
            train, test, _ = fastprep.build_packed(origin, cfg.data)
            logger.info("examples (native builder): train=%d test=%d",
                        len(train), len(test))
        except RuntimeError as exc:
            logger.info("fastprep fallback: %s", exc)

    if train is None:
        cache_dir = os.path.join(cfg.data.data_root, "train_data",
                                 cfg.data.dataset)
        prepared = prepare_examples(origin, cfg.data, cache_dir=cache_dir)
        logger.info("examples: train=%d test=%d items=%d users=%d",
                    len(prepared.train_set), len(prepared.test_set),
                    prepared.meta.item_count, prepared.meta.user_count)

        if args.top_pop:
            from mtamrecommender_tpu.models.top_pop import (eval_p_pop,
                                                            eval_top_pop)
            for name, metrics in (("TopPop", eval_top_pop(
                    prepared.train_set, prepared.test_set)),
                    ("P-Pop", eval_p_pop(prepared.train_set,
                                         prepared.test_set))):
                logger.info("%s: %s", name,
                            {k: round(v, 4) for k, v in metrics.items()})
            return 0

        train = pack_examples(prepared.train_set, prepared.meta)
        test = pack_examples(prepared.test_set, prepared.meta)

    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.train.checkpoint import Checkpointer, apply_load_type
    from mtamrecommender_tpu.train.trainer import Trainer

    mesh = None
    if cfg.mesh.model_axis_size > 1 or cfg.mesh.data_axis_size > 1:
        from mtamrecommender_tpu.parallel.mesh import build_mesh
        mesh = build_mesh(cfg.mesh)
        logger.info("mesh: %s", dict(mesh.shape))

    run_name = f"{cfg.data.dataset}_{cfg.model.experiment_type}_{cfg.version}"
    run_dir = os.path.join(args.run_root, run_name)
    trainer = Trainer(cfg=cfg, model=get_model(cfg.model.experiment_type),
                      train_data=train, test_data=test, run_dir=run_dir,
                      use_tensorboard=args.tensorboard, mesh=mesh)

    ckpt_dir = os.path.join("data", "check_point", run_name)
    checkpointer = Checkpointer(ckpt_dir)
    state = trainer.init_state()
    try:
        state, cursor = apply_load_type(cfg.train, state, ckpt_dir,
                                        optimizer_init=trainer.optimizer.init,
                                        with_cursor=True)
    except FileNotFoundError as exc:
        # load_type=full before the first save (e.g. a fleet retry of a
        # run that crashed pre-checkpoint): start from scratch instead of
        # refusing to run
        logger.info("no checkpoint to restore (%s); training from scratch",
                    exc)
        cursor = None
    start_epoch = skip_steps = 0
    if cursor is not None:
        start_epoch, skip_steps = trainer.resume_from_cursor(cursor, state)
        logger.info("resuming at step %d (epoch %d, skipping %d steps)",
                    state.step, start_epoch, skip_steps)

    if args.profile:
        import jax
        os.makedirs(os.path.join(run_dir, "profile"), exist_ok=True)
        jax.profiler.start_trace(os.path.join(run_dir, "profile"))

    try:
        state = trainer.fit(state, max_epochs=args.max_epochs,
                            max_steps=args.max_steps,
                            checkpointer=checkpointer,
                            start_epoch=start_epoch, skip_steps=skip_steps)
    finally:
        if args.profile:
            import jax
            jax.profiler.stop_trace()
        checkpointer.close()
    logger.info("done at step %d; best: %s", state.step,
                {k: round(v, 4) for k, v in trainer.best.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
