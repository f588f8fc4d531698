"""Merge per-model baseline_{tag}.json shards (as produced by watchdogged
one-model runs) into a single comparison file.

Usage: python benchmarks/merge_results.py --glob 'baseline_sess_*.json' \
           --out baseline_sessions_r1.json --floors baseline_r1.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_dir", default="benchmarks/results")
    ap.add_argument("--glob", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--floors", default=None,
                    help="existing results file to copy top_pop/p_pop from")
    args = ap.parse_args()

    merged = {"config": None, "models": []}
    for path in sorted(glob.glob(os.path.join(args.results_dir, args.glob))):
        with open(path) as f:
            shard = json.load(f)
        if merged["config"] is None:
            merged["config"] = shard.get("config")
        merged["models"].extend(shard.get("models", []))
        for key in ("top_pop", "p_pop"):
            if key in shard:
                merged[key] = shard[key]
    if args.floors:
        with open(os.path.join(args.results_dir, args.floors)) as f:
            floors = json.load(f)
        for key in ("top_pop", "p_pop"):
            if key in floors and key not in merged:
                merged[key] = floors[key]
    out_path = os.path.join(args.results_dir, args.out)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged {len(merged['models'])} models -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
