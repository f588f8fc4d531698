"""Offline analysis figures — the `util/generate_figure.py` equivalent.

The reference restores a checkpoint and renders (1) t-SNE clusters of
item embeddings colored by category, (2) per-user history heatmaps of
attention/embedding similarity (`/root/reference/util/generate_figure.py:16-241`).
This port consumes this framework's checkpoints/params instead of a
tf.Saver graph, writes PNGs with matplotlib when available, and always
returns the underlying arrays so tests (and notebooks) can assert on
them without a display.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np


def item_embedding_tsne(item_table: np.ndarray, item_category: Dict[int, int],
                        max_items: int = 2000, seed: int = 0,
                        perplexity: float = 30.0) -> Tuple[np.ndarray, np.ndarray]:
    """2-D t-SNE of item embeddings + their category labels
    (generate_figure.py's cluster figure)."""
    from sklearn.manifold import TSNE

    ids = np.array(sorted(item_category))[:max_items]
    emb = np.asarray(item_table)[ids]
    labels = np.array([item_category[i] for i in ids])
    perplexity = min(perplexity, max(2.0, (len(ids) - 1) / 3.0))
    coords = TSNE(n_components=2, random_state=seed,
                  perplexity=perplexity, init="pca").fit_transform(emb)
    return coords, labels


def history_similarity_heatmap(behavior_emb: np.ndarray,
                               seq_len: int) -> np.ndarray:
    """[L, L] cosine-similarity matrix of one user's history embeddings
    (the reference's per-user heatmap)."""
    e = np.asarray(behavior_emb)[:seq_len]
    norm = np.linalg.norm(e, axis=1, keepdims=True)
    e = e / np.maximum(norm, 1e-8)
    return e @ e.T


def save_tsne_figure(coords: np.ndarray, labels: np.ndarray,
                     path: str) -> Optional[str]:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 8))
    scatter = ax.scatter(coords[:, 0], coords[:, 1], c=labels, cmap="tab20",
                         s=6, alpha=0.7)
    ax.set_title("item embeddings (t-SNE), colored by category")
    fig.colorbar(scatter, ax=ax, label="category")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def generate_from_checkpoint(cfg, meta, item_category: Dict[int, int],
                             checkpoint_dir: str, out_dir: str,
                             test_batch=None, user_rows: int = 4,
                             max_items: int = 2000):
    """Standalone checkpoint-restore figure driver — the
    `util/generate_figure.py:52` equivalent (the reference's figure tool
    restores a tf.Saver checkpoint WITHOUT the trainer and renders).

    Restores params via `serve.Recommender.from_checkpoint`, renders the
    t-SNE item-embedding cluster figure and (when a packed test batch is
    given) per-user history similarity heatmaps.  Returns
    ``(arrays, paths)``; paths values are None when matplotlib is
    unavailable, the arrays are always produced."""
    from mtamrecommender_tpu.models import base as base_m
    from mtamrecommender_tpu.serve import Recommender

    rec = Recommender.from_checkpoint(cfg, meta, checkpoint_dir)
    item_table = np.asarray(rec.params["embedding"]["item_table"])
    coords, labels = item_embedding_tsne(item_table, item_category,
                                         max_items=max_items)
    paths = {"tsne": save_tsne_figure(
        coords, labels, os.path.join(out_dir, "item_tsne.png"))}
    arrays = {"tsne_coords": coords, "tsne_labels": labels, "heatmaps": []}
    if test_batch is not None:
        emb = base_m.embed(rec.params, test_batch, False)
        be = np.asarray(emb.behavior_emb)
        sl = np.asarray(test_batch.seq_len)
        for b in range(min(user_rows, be.shape[0])):
            hm = history_similarity_heatmap(be[b], int(sl[b]))
            arrays["heatmaps"].append(hm)
            paths[f"heatmap_{b}"] = save_heatmap_figure(
                hm, os.path.join(out_dir, f"history_heatmap_{b}.png"))
    return arrays, paths


def main(argv=None) -> int:
    """CLI: restore a checkpoint and render the analysis figures.

    Usage:
        python -m mtamrecommender_tpu.utils.figures \\
            --checkpoint data/check_point/run --type synthetic \\
            --experiment_type MTAM --out_dir data/figures
    """
    import argparse

    from mtamrecommender_tpu.config import ExperimentConfig
    from mtamrecommender_tpu.data.ingest import load_origin_data
    from mtamrecommender_tpu.data.pipeline import batch_iterator, pack_examples
    from mtamrecommender_tpu.data.prepare import prepare_examples

    ap = argparse.ArgumentParser(prog="mtamrecommender_tpu.utils.figures")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--type", default="synthetic", dest="dataset")
    ap.add_argument("--experiment_type", default="MTAM")
    ap.add_argument("--out_dir", default="data/figures")
    ap.add_argument("--num_units", type=int, default=128)
    ap.add_argument("--num_blocks", type=int, default=3)
    ap.add_argument("--max_seq_len", type=int, default=50)
    # every remaining flag that affects checkpoint SHAPE must be
    # restorable here, or Orbax fails with an opaque shape error
    # (ADVICE r4): gate parameterization, head count, vocab padding
    ap.add_argument("--time_gate_mode", default="positional",
                    choices=["positional", "scalar"])
    ap.add_argument("--num_heads", type=int, default=1)
    ap.add_argument("--vocab_pad_multiple", type=int, default=1)
    ap.add_argument("--config_json", default=None,
                    help="path to a cfg.to_dict() JSON dump of the run's "
                         "resolved config; overrides the individual flags")
    ap.add_argument("--heatmap_users", type=int, default=4)
    ap.add_argument("--max_items", type=int, default=2000)
    args = ap.parse_args(argv)

    if args.config_json:
        import json as _json

        from mtamrecommender_tpu.config import (DataConfig, MeshConfig,
                                                ModelConfig, TrainConfig)
        with open(args.config_json) as f:
            d = _json.load(f)
        d["train"]["topk"] = tuple(d["train"].get("topk", (1, 5, 10, 30, 50)))
        cfg = ExperimentConfig(
            version=d.get("version", "dev"), data=DataConfig(**d["data"]),
            model=ModelConfig(**d["model"]), train=TrainConfig(**d["train"]),
            mesh=MeshConfig(**d.get("mesh", {})))
    else:
        cfg = ExperimentConfig().with_overrides(**{
            "data.dataset": args.dataset, "data.max_seq_len": args.max_seq_len,
            "model.experiment_type": args.experiment_type,
            "model.num_units": args.num_units,
            "model.num_blocks": args.num_blocks,
            "model.time_gate_mode": args.time_gate_mode,
            "model.num_heads": args.num_heads,
            "model.vocab_pad_multiple": args.vocab_pad_multiple})
    origin = load_origin_data(cfg.data)
    prepared = prepare_examples(origin, cfg.data)
    test = pack_examples(prepared.test_set, prepared.meta)
    _, batch = next(batch_iterator(test, max(args.heatmap_users, 1)))
    _, paths = generate_from_checkpoint(
        cfg, prepared.meta, prepared.item_category, args.checkpoint,
        args.out_dir, test_batch=batch, user_rows=args.heatmap_users,
        max_items=args.max_items)
    for name, p in paths.items():
        print(f"{name}: {p if p else '(matplotlib unavailable - array only)'}")
    return 0


def save_heatmap_figure(matrix: np.ndarray, path: str) -> Optional[str]:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(matrix, cmap="viridis")
    ax.set_xlabel("history position")
    ax.set_ylabel("history position")
    fig.colorbar(im, ax=ax)
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path

if __name__ == "__main__":
    raise SystemExit(main())
