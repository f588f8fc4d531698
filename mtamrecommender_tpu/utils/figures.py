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
