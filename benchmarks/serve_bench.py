"""Serving latency/throughput benchmark (VERDICT.md r2 item 9).

Measures `serve.Recommender.recommend` end-to-end (history collation ->
jit scoring -> top-k -> host fetch + history exclusion) at the headline
shapes (d=128, L=50, ml-1m-scale catalog), jnp vs fused-attention-kernel
scoring.  Timing is honest by construction: recommend() returns host
numpy arrays, so every wall-clock window ends with a host fetch that
data-depends on the full computation (docs/PERFORMANCE.md methodology;
`jax.block_until_ready` is unreliable on this backend).

Usage:  python benchmarks/serve_bench.py [--iters 30]
Writes: benchmarks/results/serve_{tag}.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_histories(rng, n, items, cats, max_len):
    out = []
    base = 1_700_000_000
    for _ in range(n):
        hist_len = int(rng.randint(5, max_len))
        t = base + np.cumsum(rng.randint(60, 86400, hist_len))
        out.append([(int(rng.randint(1, items + 1)),
                     int(rng.randint(1, cats + 1)), float(tt))
                    for tt in t])
    return out, [float(t[-1] + 3600)] * n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tag", default="r3")
    ap.add_argument("--model", default="MTAM")
    ap.add_argument("--num_units", type=int, default=128)
    ap.add_argument("--batch_sizes", type=int, nargs="+",
                    default=[1, 16, 256])
    ap.add_argument("--pipeline_depth", type=int, default=100)
    args = ap.parse_args()

    import jax

    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.models.registry import get_model
    from mtamrecommender_tpu.serve import Recommender
    from mtamrecommender_tpu.types import DatasetMeta

    meta = DatasetMeta(user_count=6040, item_count=3706, category_count=18,
                       max_seq_len=50)
    rng = np.random.RandomState(0)
    results = {"backend": jax.default_backend(), "model": args.model,
               "num_units": args.num_units, "rows": []}

    for use_pallas in (False, True):
        cfg = ExperimentConfig().with_overrides(**{
            "model.experiment_type": args.model,
            "model.num_units": args.num_units, "model.num_blocks": 3,
            "model.dropout": 0.0,
            "model.use_pallas": use_pallas,
            "model.pallas_scope": "all",
            "model.compute_dtype": "bfloat16",
            "data.max_seq_len": 50})
        model = get_model(args.model)
        params = model.init(jax.random.PRNGKey(0), cfg.model, meta)
        rec = Recommender(cfg, meta, params, model)
        for bs in args.batch_sizes:
            hists, req = make_histories(rng, bs, meta.item_count,
                                        meta.category_count,
                                        meta.max_seq_len)
            batch = rec.batch_from_histories(hists, req)
            # warmup/compile (distinct executable per batch size)
            rec.recommend(hists, req, k=50)
            lat = []
            for _ in range(args.iters):
                t0 = time.time()
                out = rec.recommend(hists, req, k=50)   # host fetch inside
                lat.append(time.time() - t0)
                assert len(out) == bs and len(out[0]) == 50
            # collation-only share, to separate host prep from device time
            t0 = time.time()
            for _ in range(args.iters):
                rec.batch_from_histories(hists, req)
            collate = (time.time() - t0) / args.iters
            lat = np.asarray(sorted(lat))
            # ---- pipelined sustained throughput (VERDICT r4 item 4):
            # the p50 above includes one tunnel round trip PER call
            # (~60 ms on this backend) because recommend() host-fetches
            # each result.  A deployed server overlaps calls: dispatch
            # M scoring calls asynchronously (jax dispatch is async;
            # same executable, distinct inputs), then fetch all — the
            # RTT pipelines away and wall/M is the sustained per-call
            # cost (device time + serialization), the tunnel-independent
            # figure.  Collation is excluded (measured separately above).
            M = args.pipeline_depth
            batches = [rec.batch_from_histories(*make_histories(
                rng, bs, meta.item_count, meta.category_count,
                meta.max_seq_len)) for _ in range(8)]
            fetch_k = min(50 + meta.max_seq_len, meta.item_vocab)
            _ = np.asarray(rec._score(rec.params, batches[0], k=fetch_k)[0])
            t0 = time.time()
            futs = [rec._score(rec.params, batches[i % 8], k=fetch_k)
                    for i in range(M)]
            for ids, scores in futs:
                np.asarray(ids), np.asarray(scores)      # host fetch all
            sustained = (time.time() - t0) / M
            # ---- micro-batched: this backend serializes dispatches
            # (async futures still pay the ~50 ms tunnel turn each — see
            # pipelined_ms_per_call), so the deployable amortization is
            # ONE dispatch scoring M stacked request batches (vmap).
            # wall/M then bounds the true device+serialization cost per
            # request batch — the tunnel-independent figure.
            import jax as _jax
            import jax.numpy as _jnp
            MB = 16
            stacked = _jax.tree.map(
                lambda *xs: _jnp.stack(xs),
                *(batches[i % 8] for i in range(MB)))
            try:
                vscore = _jax.jit(_jax.vmap(
                    lambda b: rec._score_impl(rec.params, b, fetch_k)))
                _ = np.asarray(vscore(stacked)[0])       # compile+warm
                reps = 5
                t0 = time.time()
                vfuts = [vscore(stacked) for _i in range(reps)]
                for ids, scores in vfuts:
                    np.asarray(ids), np.asarray(scores)  # fetch-sync ALL
                micro = (time.time() - t0) / (reps * MB)
            except Exception as exc:   # e.g. vmap over a pallas kernel
                print(f"microbatch unavailable (use_pallas={use_pallas}, "
                      f"bs={bs}): {type(exc).__name__}", file=sys.stderr)
                micro = None
            row = {
                "use_pallas": use_pallas, "batch": bs, "k": 50,
                "p50_ms": round(float(lat[len(lat) // 2]) * 1000, 3),
                "p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1000, 3),
                "mean_ms": round(float(lat.mean()) * 1000, 3),
                "collate_ms": round(collate * 1000, 3),
                "requests_per_s": round(bs / float(lat.mean()), 1),
                "pipelined_ms_per_call": round(sustained * 1000, 3),
                "pipelined_requests_per_s": round(bs / sustained, 1),
                "microbatched_ms_per_call":
                    None if micro is None else round(micro * 1000, 3),
                "microbatched_requests_per_s":
                    None if micro is None else round(bs / micro, 1),
            }
            print(json.dumps(row), flush=True)
            results["rows"].append(row)

    out_path = os.path.join("benchmarks", "results",
                            f"serve_{args.tag}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("written", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
