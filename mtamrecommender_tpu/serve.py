"""Batch inference / serving: checkpoint -> top-k recommendations.

The reference has no serving layer (SURVEY.md section 1: "no serving
layer"); this is the TPU-native completion of the capability set for
deployment.  A `Recommender` wraps a trained registry model with one
jit-compiled scoring step:

    scores = model(batch).predict_emb @ item_table^T        (vocab-masked)
    top-k via jax.lax.top_k on device, ids + scores to host

History tensors are built with the same windowing/time-feature rules as
training (`data.prepare.build_user_examples` semantics) so online
requests see the exact training distribution: pass raw (item, category,
timestamp) event triples and a request time.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtamrecommender_tpu.config import ExperimentConfig
from mtamrecommender_tpu.models.base import ModelDef, scores_for_eval
from mtamrecommender_tpu.models.registry import get_model
from mtamrecommender_tpu.types import Batch, DatasetMeta


class Recommender:
    def __init__(self, cfg: ExperimentConfig, meta: DatasetMeta, params,
                 model: Optional[ModelDef] = None):
        self.cfg = cfg
        self.meta = meta
        self.params = params
        self.model = model or get_model(cfg.model.experiment_type)
        self._score = jax.jit(self._score_impl, static_argnames=("k",))

    @classmethod
    def from_checkpoint(cls, cfg: ExperimentConfig, meta: DatasetMeta,
                        checkpoint_dir: str) -> "Recommender":
        from mtamrecommender_tpu.train.checkpoint import Checkpointer
        from mtamrecommender_tpu.train.trainer import TrainState, make_optimizer

        model = get_model(cfg.model.experiment_type)
        params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
        opt = make_optimizer(cfg.train)
        template = TrainState(params=params, opt_state=opt.init(params))
        ckpt = Checkpointer(checkpoint_dir)
        try:
            state = ckpt.restore(template)
        finally:
            ckpt.close()
        return cls(cfg, meta, state.params, model)

    # ------------------------------------------------------------ scoring

    def _score_impl(self, params, batch: Batch, k: int):
        scores = scores_for_eval(self.model, params, self.cfg.model, batch,
                                 self.meta.item_vocab)
        top_scores, top_ids = jax.lax.top_k(scores, k)
        return top_ids, top_scores

    def batch_from_histories(
            self,
            histories: Sequence[Sequence[Tuple[int, int, float]]],
            request_times: Sequence[float],
            user_ids: Optional[Sequence[int]] = None) -> Batch:
        """(item, category, unix_seconds) event triples -> a scoring Batch.

        Reproduces the training-side example layout (windowed last
        max_seq_len-1 events, hours, mask token, timelast/timenow with the
        request time standing in for the target time)."""
        L = self.meta.max_seq_len
        B = len(histories)
        items = np.zeros((B, L), np.int32)
        cats = np.zeros((B, L), np.int32)
        times = np.zeros((B, L), np.float32)
        tl = np.zeros((B, L), np.float32)
        tn = np.zeros((B, L), np.float32)
        pos = np.zeros((B, L), np.int32)
        slen = np.zeros((B,), np.int32)
        t_req = np.zeros((B,), np.float32)
        for b, events in enumerate(histories):
            ev = sorted(events, key=lambda e: e[2])[-(L - 1):]
            req_hour = int(request_times[b] // 3600)
            hours = [int(t // 3600) for (_, _, t) in ev]
            n = len(ev)
            for i, (item, cat, _) in enumerate(ev):
                items[b, i] = item
                cats[b, i] = cat
                times[b, i] = hours[i]
                tl[b, i] = 0 if i == 0 else hours[i] - hours[i - 1]
                tn[b, i] = req_hour - hours[i]
                pos[b, i] = i
            items[b, n] = self.meta.item_count + 1
            cats[b, n] = self.meta.category_count + 1
            times[b, n] = req_hour
            pos[b, n] = min(n, L - 1)
            slen[b] = n + 1
            t_req[b] = req_hour
        uids = np.asarray(user_ids, np.int32) if user_ids is not None \
            else np.zeros((B,), np.int32)
        return Batch(
            user_id=jnp.asarray(uids), items=jnp.asarray(items),
            cats=jnp.asarray(cats), times=jnp.asarray(times),
            time_last=jnp.asarray(tl), time_now=jnp.asarray(tn),
            positions=jnp.asarray(pos),
            target_id=jnp.zeros((B,), jnp.int32),
            target_cat=jnp.zeros((B,), jnp.int32),
            target_time=jnp.asarray(t_req),
            seq_len=jnp.asarray(slen), valid=jnp.ones((B,), jnp.float32))

    def recommend(self,
                  histories: Sequence[Sequence[Tuple[int, int, float]]],
                  request_times: Sequence[float],
                  k: int = 10,
                  user_ids: Optional[Sequence[int]] = None,
                  exclude_history: bool = True
                  ) -> List[List[Tuple[int, float]]]:
        """Top-k (item_id, score) per request."""
        batch = self.batch_from_histories(histories, request_times, user_ids)
        fetch = k + self.meta.max_seq_len if exclude_history else k
        fetch = min(fetch, self.meta.item_vocab)
        ids, scores = self._score(self.params, batch, k=fetch)
        ids = np.asarray(ids)
        scores = np.asarray(scores)
        out: List[List[Tuple[int, float]]] = []
        for b, events in enumerate(histories):
            seen = {e[0] for e in events} if exclude_history else set()
            recs = [(int(i), float(s)) for i, s in zip(ids[b], scores[b])
                    if int(i) not in seen][:k]
            out.append(recs)
        return out


def main(argv=None) -> int:
    """JSON-lines scoring service.

    Reads one request per stdin line:
        {"history": [[item, cat, unix_seconds], ...],
         "request_time": unix_seconds, "user_id": 0, "k": 10}
    writes one response per line:
        {"items": [id, ...], "scores": [s, ...]}

    Usage:
        python -m mtamrecommender_tpu.serve --checkpoint data/check_point/run \\
            --experiment_type MTAM --items 3706 --users 6040 --categories 18
    """
    import argparse
    import json
    import sys

    ap = argparse.ArgumentParser(prog="mtamrecommender_tpu.serve")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--experiment_type", default="MTAM")
    ap.add_argument("--items", type=int, required=True)
    ap.add_argument("--users", type=int, required=True)
    ap.add_argument("--categories", type=int, required=True)
    ap.add_argument("--max_seq_len", type=int, default=50)
    ap.add_argument("--num_units", type=int, default=128)
    ap.add_argument("--num_blocks", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE")
    args = ap.parse_args(argv)

    cfg = ExperimentConfig().with_overrides(**{
        "model.experiment_type": args.experiment_type,
        "model.num_units": args.num_units,
        "model.num_blocks": args.num_blocks,
        "data.max_seq_len": args.max_seq_len,
        **{kv.partition("=")[0]: json.loads(kv.partition("=")[2])
           for kv in args.set}})
    meta = DatasetMeta(user_count=args.users, item_count=args.items,
                       category_count=args.categories,
                       max_seq_len=args.max_seq_len)
    rec = Recommender.from_checkpoint(cfg, meta, args.checkpoint)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        out = rec.recommend(
            [[tuple(e) for e in req["history"]]],
            [req["request_time"]], k=int(req.get("k", args.k)),
            user_ids=[int(req.get("user_id", 0))])[0]
        print(json.dumps({"items": [i for i, _ in out],
                          "scores": [round(s, 5) for _, s in out]}),
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
