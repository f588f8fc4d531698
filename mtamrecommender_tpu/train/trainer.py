"""Training orchestration: one jit-compiled step, epoch loop, eval cadence.

TPU-native replacement for `/root/reference/train_process.py:132-407` +
`Model/base_model.py` optimizer plumbing:

  * LR schedule reproduces the two staircase exponential-decay graphs and
    the `learning_rate > 0.001 -> lr1 else lr2` switch
    (train_process.py:154-159, 333-336);
  * optimizer select adadelta/adam/rmsprop/sgd (base_model.py:71-80) with
    TF-default hyperparameters;
  * global-norm gradient clipping at max_gradient_norm
    (base_model.py:290-297);
  * step errors SURFACE instead of being swallowed (the reference's
    blanket try/except at train_process.py:369-371 is deliberately not
    replicated).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mtamrecommender_tpu.config import ExperimentConfig, TrainConfig
from mtamrecommender_tpu.data.pipeline import (PackedDataset, batch_iterator,
                                                prefetch_to_device)
from mtamrecommender_tpu.models.base import ModelDef, compute_loss
from mtamrecommender_tpu.train import evaluate as eval_lib
from mtamrecommender_tpu.types import Batch
from mtamrecommender_tpu.utils.logging import MetricsWriter, create_log


# ------------------------------------------------------------ LR schedule

def make_lr_schedule(cfg: TrainConfig) -> Callable[[jax.Array], jax.Array]:
    """lr1 = base * 0.99^(step//100) (staircase); lr2 = 1e-3 *
    decay_rate^(step//100).  The reference evaluates `learning_rate >
    0.001` with the PREVIOUS step's value, so lr1 applies while
    lr1(step-1) > 1e-3 and lr2 thereafter; a base lr <= 1e-3 uses lr2
    from step 0 (as every shipped preset does)."""
    base = cfg.learning_rate
    decay = cfg.decay_rate

    def schedule(step: jax.Array) -> jax.Array:
        step = step.astype(jnp.float32)
        lr1 = base * jnp.power(0.99, jnp.floor(step / 100.0))
        lr2 = 1e-3 * jnp.power(decay, jnp.floor(step / 100.0))
        prev = base * jnp.power(0.99, jnp.floor(jnp.maximum(step - 1.0, 0.0)
                                                / 100.0))
        return jnp.where((base > 1e-3) & (prev > 1e-3), lr1, lr2)

    return schedule


def pack_small_leaves(inner: optax.GradientTransformation,
                      max_elems: int = 1 << 20
                      ) -> optax.GradientTransformation:
    """Run ``inner`` with every SMALL float param leaf raveled into one
    vector, big leaves (embedding tables) left standalone.

    The motivation is per-op overhead: the optimizer update is a chain of
    elementwise ops PER LEAF, and this model is ~20 small [d,d]/[d]
    leaves + 4 big tables — so adam costs ~24 op-chains/step where 5
    would do.  `optax.flatten` (ravel EVERYTHING) was measured 20x
    slower because copying the ~10 MB tables in and out each step
    dominates; packing only the small leaves copies ~1 MB and keeps the
    tables' updates in place.  Math-identical to the unpacked chain
    (global-norm clip and adam are elementwise/norm ops either way);
    update parity pinned by tests/test_train.py.
    """

    def _meta(tree):
        """Small float leaves grouped BY DTYPE (one packed vector per
        dtype): concatenating mixed dtypes would silently promote to the
        widest and run the optimizer moments in the promoted dtype
        (ADVICE r4).  Uniform-f32 trees — every shipped config — still
        pack into exactly one vector."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        groups: Dict[str, list] = {}
        for i, l in enumerate(leaves):
            if l.size <= max_elems and jnp.issubdtype(l.dtype, jnp.floating):
                groups.setdefault(jnp.dtype(l.dtype).name, []).append(i)
        group_keys = sorted(groups)
        small = {k: groups[k] for k in group_keys}
        in_small = {i for idxs in groups.values() for i in idxs}
        big = [i for i in range(len(leaves)) if i not in in_small]
        return treedef, small, big, leaves

    def _pack(tree):
        treedef, small, big, leaves = _meta(tree)
        packed = [jnp.concatenate([leaves[i].ravel() for i in idxs])
                  for idxs in small.values()]
        if not packed:
            packed = [jnp.zeros((0,), jnp.float32)]
        packed.extend(leaves[i] for i in big)
        return packed

    def _unpack(packed, like):
        treedef, small, big, leaves = _meta(like)
        out = list(leaves)
        n_groups = max(len(small), 1)
        for flat, idxs in zip(packed[:n_groups], small.values()):
            off = 0
            for i in idxs:
                n = leaves[i].size
                out[i] = flat[off:off + n].reshape(leaves[i].shape
                                                   ).astype(leaves[i].dtype)
                off += n
        for j, i in enumerate(big):
            out[i] = packed[n_groups + j]
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        return inner.init(_pack(params))

    def update(grads, state, params=None):
        p_packed = None if params is None else _pack(params)
        u_packed, state = inner.update(_pack(grads), state, p_packed)
        return _unpack(u_packed, grads), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Optimizer select with TF-1.14 default hyperparameters
    (base_model.py:71-80)."""
    schedule = make_lr_schedule(cfg)
    name = cfg.optimizer
    if name == "adam":
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif name == "adadelta":
        core = optax.scale_by_adadelta(rho=0.95, eps=1e-8)
    elif name == "rmsprop":
        core = optax.scale_by_rms(decay=0.9, eps=1e-10)
    elif name == "sgd":
        core = optax.identity()
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = optax.chain(
        optax.clip_by_global_norm(cfg.max_gradient_norm),
        core,
        optax.scale_by_schedule(lambda count: -schedule(count)),
    )
    if cfg.flatten_optimizer:
        # run the whole update on ONE raveled vector: the per-leaf op
        # chains (~8 ops x ~20 leaves per step) collapse to a handful of
        # whole-param ops.  Same math — global-norm clip and adam are
        # elementwise/norm ops either way (update parity pinned by
        # tests/test_train.py::test_flatten_optimizer_update_parity);
        # the opt_state checkpoint layout changes.  MEASURED 20x SLOWER
        # at headline shapes (docs/PERFORMANCE.md) — kept as a knob.
        chain = optax.flatten(chain)
    if cfg.pack_small_leaves:
        chain = pack_small_leaves(chain)
    return chain


# ------------------------------------------------------------ train state

@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(model: ModelDef, cfg: ExperimentConfig,
                    optimizer: optax.GradientTransformation,
                    valid_vocab: int = None):
    """One jit region: loss -> grads -> clipped update."""

    def loss_fn(params, batch: Batch, rng):
        metrics = compute_loss(model, params, cfg.model, batch, True, rng,
                               valid_vocab)
        return metrics["loss"], metrics

    @jax.jit
    def train_step(params, opt_state, batch: Batch, rng
                   ) -> Tuple[Any, Any, Dict[str, jax.Array]]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, metrics

    return train_step


def make_device_train_step(model: ModelDef, cfg: ExperimentConfig,
                           optimizer: optax.GradientTransformation,
                           valid_vocab: int, batch_size: int):
    """Train step with ON-DEVICE batch assembly: the whole dataset lives
    in HBM and each step gathers its rows inside the jit region — zero
    per-step host work (data/device_data.py)."""
    from mtamrecommender_tpu.data.device_data import DeviceDataset, gather_batch

    @jax.jit
    def train_step(params, opt_state, data: DeviceDataset, order,
                   step_index, rng):
        batch = gather_batch(data, order, step_index, batch_size)

        def loss_fn(p):
            m = compute_loss(model, p, cfg.model, batch, True, rng,
                             valid_vocab)
            return m["loss"], m

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, metrics

    return train_step


def fast_forward_rng(rng: jax.Array, n: int) -> jax.Array:
    """Advance the per-step rng chain by ``n`` splits without running the
    steps (exact-resume fast-forward; one fori_loop dispatch)."""
    if n <= 0:
        return rng
    return _ff_rng_jit(rng, jnp.asarray(n, jnp.int32))


@jax.jit
def _ff_rng_jit(rng, n):
    return jax.lax.fori_loop(0, n, lambda i, k: jax.random.split(k)[1], rng)


def make_superstep(model: ModelDef, cfg: ExperimentConfig,
                   optimizer: optax.GradientTransformation,
                   valid_vocab: int, batch_size: int):
    """K optimizer steps per jit call: `lax.scan` over in-jit batch gathers
    on the device-resident dataset.

    The per-step paths pay one dispatch per optimizer step; at this
    workload's shapes the model is dispatch-latency-bound, not FLOP-bound
    (docs/PERFORMANCE.md), so scanning K steps inside one executable is
    the TPU-native answer — there is no reference equivalent (the
    reference pays a feed_dict + sess.run round-trip per step,
    train_process.py:326-336).

    Trajectory-identical to the single-step device path: same in-jit
    `jax.random.split` chain, same batch gather — pinned by
    tests/test_train.py.  Returns a `build(n_sub)` factory; each distinct
    n_sub compiles once.
    """
    from mtamrecommender_tpu.data.device_data import gather_batch

    def build(n_sub: int):
        @jax.jit
        def superstep(params, opt_state, data, order, start_step, rng):
            def body(carry, k):
                params, opt_state, rng = carry
                keys = jax.random.split(rng)
                step_rng, rng = keys[0], keys[1]
                batch = gather_batch(data, order, start_step + k, batch_size)

                def loss_fn(p):
                    m = compute_loss(model, p, cfg.model, batch, True,
                                     step_rng, valid_vocab)
                    return m["loss"], m

                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, new_opt_state = optimizer.update(grads, opt_state,
                                                          params)
                new_params = optax.apply_updates(params, updates)
                return (new_params, new_opt_state, rng), metrics

            (params, opt_state, rng), stacked = jax.lax.scan(
                body, (params, opt_state, rng),
                jnp.arange(n_sub, dtype=jnp.int32))
            return params, opt_state, stacked, rng

        return superstep

    return build


def make_dynamic_superstep(model: ModelDef, cfg: ExperimentConfig,
                           optimizer: optax.GradientTransformation,
                           valid_vocab: int, batch_size: int, max_sub: int):
    """One executable for EVERY chunk size 1..max_sub: `lax.fori_loop`
    with a *traced* trip count instead of per-size `lax.scan`.

    The epoch/eval/max_steps boundaries make `Trainer._chunk_size` emit
    remainder chunks (897-step epochs at steps_per_call=100 produce 97;
    eval boundaries off-phase with epochs produce dozens of distinct
    sizes over a long run), and on this backend every distinct scan
    length is a fresh multi-second remote compile.  A dynamic trip count
    keeps the compile count at exactly one.

    Trajectory-identical to `make_superstep(...)(n)` for the first n
    steps (same rng-split chain, same gathers); per-step metrics come
    back in fixed [max_sub] buffers of which only [:n_sub] are written —
    callers must slice.  Uninitialized tail entries are zero-filled.
    """
    from mtamrecommender_tpu.data.device_data import gather_batch

    @jax.jit
    def superstep(params, opt_state, data, order, start_step, n_sub, rng):
        probe_batch = gather_batch(data, order, start_step, batch_size)
        metric_shapes = jax.eval_shape(
            lambda p: compute_loss(model, p, cfg.model, probe_batch, True,
                                   jax.random.PRNGKey(0), valid_vocab),
            params)
        bufs0 = jax.tree.map(
            lambda s: jnp.zeros((max_sub,) + s.shape, s.dtype),
            metric_shapes)

        def body(k, carry):
            params, opt_state, rng, bufs = carry
            keys = jax.random.split(rng)
            step_rng, rng = keys[0], keys[1]
            batch = gather_batch(data, order, start_step + k, batch_size)

            def loss_fn(p):
                m = compute_loss(model, p, cfg.model, batch, True,
                                 step_rng, valid_vocab)
                return m["loss"], m

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = optimizer.update(grads, opt_state,
                                                      params)
            new_params = optax.apply_updates(params, updates)
            bufs = jax.tree.map(
                lambda b, v: jax.lax.dynamic_update_index_in_dim(b, v, k, 0),
                bufs, metrics)
            return (new_params, new_opt_state, rng, bufs)

        params, opt_state, rng, bufs = jax.lax.fori_loop(
            0, n_sub, body, (params, opt_state, rng, bufs0))
        return params, opt_state, bufs, rng

    return superstep


# ------------------------------------------------------------ orchestration

@dataclass
class Trainer:
    """Epoch/eval loop (Train_main_process.train, train_process.py:132-407)."""

    cfg: ExperimentConfig
    model: ModelDef
    train_data: PackedDataset
    test_data: PackedDataset
    run_dir: str = "data/runs/dev"
    use_tensorboard: bool = False
    mesh: Any = None                  # jax.sharding.Mesh -> SPMD steps
    device_resident: bool = True      # dataset in HBM, in-jit batch gather
    best: Dict[str, float] = field(default_factory=dict)

    def __post_init__(self):
        self.logger = create_log(self.cfg.data.dataset,
                                 self.cfg.model.experiment_type,
                                 self.cfg.version)
        self.writer = MetricsWriter(self.run_dir, self.use_tensorboard)
        self.optimizer = make_optimizer(self.cfg.train)
        self.valid_vocab = self.train_data.meta.item_vocab
        if self.mesh is None:
            self.train_step = make_train_step(self.model, self.cfg,
                                              self.optimizer, self.valid_vocab)
            self.eval_step = eval_lib.make_eval_step(self.model, self.cfg.model,
                                                     self.cfg.train.topk,
                                                     self.valid_vocab)
        else:
            # mesh-annotated SPMD steps: DP batch + (optionally) EP tables
            from mtamrecommender_tpu.parallel import dist_trainer
            template = jax.eval_shape(
                lambda r: self.model.init(r, self.cfg.model,
                                          self.train_data.meta),
                jax.random.PRNGKey(0))
            self._params_template = template
            self.train_step = dist_trainer.make_sharded_train_step(
                self.model, self.cfg, self.optimizer, self.mesh, template,
                self.valid_vocab)
            self.eval_step = dist_trainer.make_sharded_eval_step(
                self.model, self.cfg, self.mesh, template,
                self.cfg.train.topk, self.valid_vocab)
        if self.mesh is None and self.device_resident:
            self.device_train_step = make_device_train_step(
                self.model, self.cfg, self.optimizer, self.valid_vocab,
                self.cfg.train.train_batch_size)
        else:
            self.device_train_step = None
        self._dynamic_superstep = None
        if self.cfg.train.steps_per_call > 1 and self.device_resident:
            if self.mesh is None:
                self._superstep_factory = make_superstep(
                    self.model, self.cfg, self.optimizer, self.valid_vocab,
                    self.cfg.train.train_batch_size)
                # single-executable variant used by fit(): boundary
                # remainder chunks reuse the same compile (see
                # make_dynamic_superstep docstring)
                self._dynamic_superstep = make_dynamic_superstep(
                    self.model, self.cfg, self.optimizer, self.valid_vocab,
                    self.cfg.train.train_batch_size,
                    self.cfg.train.steps_per_call)
            else:
                # sharded superstep: K SPMD steps per jit call over the
                # mesh-replicated device-resident dataset
                from mtamrecommender_tpu.parallel import dist_trainer
                self._superstep_factory = dist_trainer.make_sharded_superstep(
                    self.model, self.cfg, self.optimizer, self.mesh,
                    self._params_template, self.valid_vocab,
                    self.cfg.train.train_batch_size)
        else:
            self._superstep_factory = None
        self._superstep_cache: Dict[int, Any] = {}
        self._cursor = None
        self._device_data = None
        self.rng = jax.random.PRNGKey(self.cfg.train.seed)
        self.np_rng = np.random.RandomState(self.cfg.train.seed)

    def _capture_cursor(self, epoch: int, epoch_start_step: int) -> Dict:
        """JSON-able data cursor as of an epoch's start: epoch index,
        global step, per-step jax rng and the epoch-shuffle numpy rng.
        Saved with each checkpoint so resume replays the interrupted
        epoch's shuffle exactly (train/checkpoint.py)."""
        st = self.np_rng.get_state()
        return {"epoch": int(epoch), "step_at_epoch_start": int(epoch_start_step),
                "rng": np.asarray(self.rng).astype(np.uint32).tolist(),
                "np_keys": np.asarray(st[1]).astype(np.uint32).tolist(),
                "np_pos": int(st[2]), "np_has_gauss": int(st[3]),
                "np_cached": float(st[4]),
                # best-so-far maxima travel with the cursor: models under
                # the reference protocol peak early (steps 4k-8k), so a
                # retry that restarted `best` from zero would silently
                # lose the run's reported result
                "best": {k: float(v) for k, v in self.best.items()}}

    def resume_from_cursor(self, cursor: Dict, state: TrainState
                           ) -> Tuple[int, int]:
        """Restore both rng streams to the cursor's epoch start; returns
        (start_epoch, skip_steps) to pass to fit() for an exact resume."""
        self.rng = jnp.asarray(np.asarray(cursor["rng"], np.uint32))
        self.np_rng.set_state(
            ("MT19937", np.asarray(cursor["np_keys"], np.uint32),
             int(cursor["np_pos"]), int(cursor["np_has_gauss"]),
             float(cursor["np_cached"])))
        cbest = cursor.get("best", {})                # absent pre-r3 ckpts
        if not self.best:
            # the shipped flow: a fresh trainer restores the dict verbatim
            self.best = {k: float(v) for k, v in cbest.items()}
        else:
            # merging into a non-empty tracker uses the reference's PAIRED
            # rule (train_process.py:279-288): hr and ndcg at the same k
            # must both improve, so no (hr, ndcg) pair is reported that
            # never co-occurred in a single eval (ADVICE.md r3)
            ks = {key.split("@", 1)[1] for key in cbest if key.startswith("hr@")}
            for k in ks:
                hr = float(cbest.get(f"hr@{k}", 0.0))
                ndcg = float(cbest.get(f"ndcg@{k}", 0.0))
                if (hr > self.best.get(f"hr@{k}", 0.0)
                        and ndcg > self.best.get(f"ndcg@{k}", 0.0)):
                    self.best[f"hr@{k}"] = hr
                    self.best[f"ndcg@{k}"] = ndcg
        return int(cursor["epoch"]), \
            int(state.step) - int(cursor["step_at_epoch_start"])

    def _cursor_for_save(self) -> Optional[Dict]:
        """The epoch-start cursor with ONLY its best-so-far field refreshed
        to now: evals that ran since the epoch began (intra-epoch eval
        peaks) must travel with the checkpoint, while the rng/epoch fields
        must stay frozen at the epoch start so resume replays the epoch
        exactly (ADVICE.md r3)."""
        if self._cursor is None:
            return None
        return {**self._cursor,
                "best": {k: float(v) for k, v in self.best.items()}}

    def _chunk_size(self, step: int, steps_left: int,
                    max_steps: Optional[int]) -> int:
        """Largest superstep chunk that does not cross an eval boundary,
        the epoch end, or max_steps — so evals/saves/stops land on exactly
        the same global steps as the per-step paths."""
        if self._superstep_factory is None:
            return 1
        cfg_t = self.cfg.train
        chunk = min(cfg_t.steps_per_call, steps_left,
                    cfg_t.eval_freq - (step % cfg_t.eval_freq))
        if max_steps is not None:
            chunk = min(chunk, max_steps - step)
        return max(chunk, 1)

    def _place(self, batch: Batch) -> Batch:
        if self.mesh is None:
            return batch
        from mtamrecommender_tpu.parallel import sharding as shard_lib
        return shard_lib.place_batch(self.mesh, self.cfg.mesh, batch)

    def init_state(self) -> TrainState:
        init_rng, self.rng = jax.random.split(self.rng)
        params = self.model.init(init_rng, self.cfg.model, self.train_data.meta)
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            from mtamrecommender_tpu.parallel import sharding as shard_lib
            params = shard_lib.place_params(self.mesh, self.cfg.mesh, params)
            opt_state = jax.device_put(
                opt_state, shard_lib.replicated_tree(self.mesh, opt_state))
        return TrainState(params=params, opt_state=opt_state, step=0)

    def evaluate(self, state: TrainState) -> Dict[str, float]:
        batches = ((s, self._place(b)) for s, b in batch_iterator(
            self.test_data, self.cfg.train.test_batch_size))
        metrics = eval_lib.evaluate_dataset(self.eval_step, state.params,
                                            batches)
        step_for_curve = state.step
        # best-so-far maxima (train_process.py:279-288): hr and ndcg must
        # BOTH improve to update, per the reference's paired condition
        for k in self.cfg.train.topk:
            hr, ndcg = metrics.get(f"hr@{k}", 0.0), metrics.get(f"ndcg@{k}", 0.0)
            if (hr > self.best.get(f"hr@{k}", 0.0)
                    and ndcg > self.best.get(f"ndcg@{k}", 0.0)):
                self.best[f"hr@{k}"] = hr
                self.best[f"ndcg@{k}"] = ndcg
            self.logger.info("Test recall rate @ %d : %.4f   ndcg @ %d: %.4f",
                             k, hr, k, ndcg)
        if metrics:
            self.writer.scalars(step_for_curve, metrics)
        return metrics

    def fit(self, state: Optional[TrainState] = None,
            max_epochs: Optional[int] = None,
            max_steps: Optional[int] = None,
            checkpointer=None, start_epoch: int = 0,
            skip_steps: int = 0) -> TrainState:
        """Epoch loop.  ``start_epoch``/``skip_steps`` (usually from
        ``resume_from_cursor``) resume an interrupted run exactly: the
        first epoch's shuffle is re-drawn from the restored numpy rng and
        its first ``skip_steps`` already-trained steps are skipped with
        the per-step rng chain fast-forwarded to match."""
        cfg_t = self.cfg.train
        state = state or self.init_state()
        if max_steps is not None and state.step >= max_steps:
            # resumed at/past the step budget (e.g. a fleet retry of a job
            # killed after reaching max_steps but before its clean exit):
            # run ZERO optimizer steps — eval/save/report only (ADVICE.md r1)
            self.evaluate(state)
            for k in self.cfg.train.topk:
                self.logger.info(
                    "Max recall rate @ %d: %.4f   ndcg @ %d: %.4f", k,
                    self.best.get(f"hr@{k}", 0.0), k,
                    self.best.get(f"ndcg@{k}", 0.0))
            if checkpointer is not None:
                checkpointer.save(state, cursor=self._cursor_for_save())
            return state
        self.evaluate(state)  # initial eval (train_process.py:308)
        epochs = max_epochs if max_epochs is not None else cfg_t.max_epochs
        self._avg_loss, self._seen = 0.0, 0
        use_device_data = (self.device_train_step is not None
                           or (self.mesh is not None
                               and self._superstep_factory is not None))
        if use_device_data:
            from mtamrecommender_tpu.data import device_data as dd
            if self._device_data is None:
                self._device_data = dd.to_device(self.train_data)
                if self.mesh is not None:
                    from mtamrecommender_tpu.parallel import \
                        sharding as shard_lib
                    self._device_data = jax.device_put(
                        self._device_data,
                        shard_lib.replicated_tree(self.mesh,
                                                  self._device_data))

        def on_step(metrics, fetch_every_step: bool) -> bool:
            """Shared display/eval/save cadence; returns True to stop.
            On the device-resident path metrics are fetched only on
            cadence boundaries so the loop never syncs per step."""
            state.step += 1
            if fetch_every_step:
                self._avg_loss += float(metrics["loss"])
                self._seen += 1
            if state.step % cfg_t.display_freq == 0:
                loss = float(metrics["loss"])
                if not np.isfinite(loss):
                    # surface divergence instead of training on garbage
                    # (the reference swallows step errors,
                    # train_process.py:369-371 — deliberately not replicated)
                    raise FloatingPointError(
                        f"non-finite train loss {loss} at step {state.step}; "
                        f"restore the last checkpoint and lower the lr")
                if not fetch_every_step:
                    self._avg_loss += loss
                    self._seen += 1
                self.writer.scalars(state.step, {
                    "train_loss": loss, "ce": float(metrics["ce"]),
                    "l2": float(metrics["l2"])})
            if state.step % cfg_t.eval_freq == 0:
                self.logger.info("Global step %d  train_loss %.5f",
                                 state.step,
                                 self._avg_loss / max(self._seen, 1))
                self._avg_loss, self._seen = 0.0, 0
                self.evaluate(state)
                if checkpointer is not None and \
                        state.step % cfg_t.save_freq == 0:
                    checkpointer.save(state, cursor=self._cursor_for_save())
            return max_steps is not None and state.step >= max_steps

        for epoch in range(start_epoch, epochs):
            epoch_start = time.time()
            stop = False
            skip = skip_steps if epoch == start_epoch else 0
            # cursor BEFORE the epoch's shuffle draw, so a restore can
            # replay this epoch's order from the same numpy rng state
            self._cursor = self._capture_cursor(epoch, state.step - skip)
            if skip:
                self.rng = fast_forward_rng(self.rng, skip)
            if use_device_data:
                from mtamrecommender_tpu.data import device_data as dd
                order_np, n_steps = dd.epoch_order(
                    len(self.train_data), cfg_t.train_batch_size, self.np_rng)
                if self.mesh is not None:
                    from mtamrecommender_tpu.parallel import \
                        sharding as shard_lib
                    order = jax.device_put(
                        order_np, shard_lib.replicated_tree(self.mesh, 0))
                else:
                    order = jax.device_put(order_np)
                i = skip
                while i < n_steps and not stop:
                    chunk = self._chunk_size(state.step, n_steps - i,
                                             max_steps)
                    if chunk > 1 or self.device_train_step is None:
                        if self._dynamic_superstep is not None:
                            state.params, state.opt_state, stacked, \
                                self.rng = self._dynamic_superstep(
                                    state.params, state.opt_state,
                                    self._device_data, order, i, chunk,
                                    self.rng)
                            host = jax.device_get(stacked)
                            host = {m: host[m][:chunk] for m in host}
                        else:
                            fn = self._superstep_cache.get(chunk)
                            if fn is None:
                                fn = self._superstep_factory(chunk)
                                self._superstep_cache[chunk] = fn
                            state.params, state.opt_state, stacked, \
                                self.rng = fn(
                                    state.params, state.opt_state,
                                    self._device_data, order, i, self.rng)
                            host = jax.device_get(stacked)
                        for k in range(chunk):
                            if on_step({m: host[m][k] for m in host},
                                       fetch_every_step=False):
                                stop = True
                                break
                        i += chunk
                    else:
                        step_rng, self.rng = jax.random.split(self.rng)
                        state.params, state.opt_state, metrics = \
                            self.device_train_step(state.params,
                                                   state.opt_state,
                                                   self._device_data, order,
                                                   i, step_rng)
                        if on_step(metrics, fetch_every_step=False):
                            stop = True
                        i += 1
            else:
                it = batch_iterator(self.train_data, cfg_t.train_batch_size,
                                    shuffle=True, rng=self.np_rng)
                if skip:
                    import itertools
                    it = itertools.islice(it, skip, None)
                if self.mesh is None:
                    it = prefetch_to_device(it)
                for _, batch in it:
                    step_rng, self.rng = jax.random.split(self.rng)
                    state.params, state.opt_state, metrics = self.train_step(
                        state.params, state.opt_state, self._place(batch),
                        step_rng)
                    if on_step(metrics, fetch_every_step=True):
                        stop = True
                        break
            self.logger.info("epoch %d done in %.2fs (step %d)", epoch,
                             time.time() - epoch_start, state.step)
            if stop:
                break
        self.evaluate(state)
        for k in self.cfg.train.topk:
            self.logger.info("Max recall rate @ %d: %.4f   ndcg @ %d: %.4f",
                             k, self.best.get(f"hr@{k}", 0.0), k,
                             self.best.get(f"ndcg@{k}", 0.0))
        if checkpointer is not None:
            checkpointer.save(state, cursor=self._cursor_for_save())
        return state
