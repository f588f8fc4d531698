"""Raw-dataset ingestion to the canonical event frame.

Canonical schema (columns): ``user_id, item_id, time_stamp, cat_id`` —
the contract every loader in the reference's ``DataHandle/`` emits
(`/root/reference/DataHandle/get_origin_data_ml.py:33-39`).

The reference ships one surviving loader (ml-1m) plus seven siblings that
are imported but absent from the snapshot (SURVEY.md "snapshot gaps");
their canonicalization is re-derived here from the surviving loader's
shape and each dataset's public file format.  A seeded synthetic
generator stands in when raw blobs are unavailable (the snapshot's
ratings.dat is missing).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional

import numpy as np
import pandas as pd

from mtamrecommender_tpu.config import DataConfig

logger = logging.getLogger("mtamrec.data")


def min_activity_filter(df: pd.DataFrame, min_user: int = 5,
                        min_item: int = 5) -> pd.DataFrame:
    """Iterative min-activity filtering.

    `Get_origin_data_base.filter` is absent from the snapshot (SURVEY.md);
    its call site (`get_origin_data_ml.py:42`) shows it maps frame->frame.
    We use the standard k-core-style pass: drop items then users below the
    activity floor, once each (single pass keeps ml-1m intact since every
    user has >=20 ratings).
    """
    counts = df.groupby("item_id")["user_id"].transform("size")
    df = df[counts >= min_item]
    counts = df.groupby("user_id")["item_id"].transform("size")
    df = df[counts >= min_user]
    return df.reset_index(drop=True)


def data_statistics(df: pd.DataFrame) -> Dict[str, float]:
    """getDataStatistics equivalent: corpus-level counts."""
    stats = {
        "events": int(len(df)),
        "users": int(df["user_id"].nunique()),
        "items": int(df["item_id"].nunique()),
        "categories": int(df["cat_id"].nunique()),
        "events_per_user": float(len(df) / max(df["user_id"].nunique(), 1)),
    }
    logger.info("data statistics: %s", stats)
    return stats


def load_ml_1m(cfg: DataConfig) -> pd.DataFrame:
    """MovieLens-1M loader (get_origin_data_ml.py:9-54).

    Reads `movies.dat` + `ratings.dat` ('::'-separated), samples
    ``user_sample_frac`` of users (np seed 1234), merges genres as cat_id,
    renames to the canonical schema, filters, caches a CSV.
    """
    cache = os.path.join(cfg.data_root, "orgin_data", "movielens.csv")
    if os.path.exists(cache):
        return pd.read_csv(cache)
    raw = os.path.join(cfg.data_root, "raw_data", "ml-1m")
    movies = pd.read_csv(os.path.join(raw, "movies.dat"), sep="::", header=None,
                         names=["movieId", "title", "genres"], engine="python",
                         encoding="latin-1")
    ratings = pd.read_csv(os.path.join(raw, "ratings.dat"), sep="::", header=None,
                          names=["userId", "movieId", "rating", "timestamp"],
                          engine="python")
    rng = np.random.RandomState(cfg.seed)
    user_counts = ratings.groupby("userId").count()
    sampled = user_counts.sample(frac=cfg.user_sample_frac, random_state=rng)
    ratings = ratings[ratings["userId"].isin(sampled.index)]
    merged = pd.merge(ratings, movies, on="movieId")
    merged = merged[["userId", "movieId", "timestamp", "genres"]]
    merged = merged.rename(columns={"userId": "user_id", "movieId": "item_id",
                                    "timestamp": "time_stamp", "genres": "cat_id"})
    filtered = min_activity_filter(merged, cfg.min_user_actions,
                                   cfg.min_item_actions)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    filtered.to_csv(cache, encoding="UTF8", index=False)
    return filtered


def _csv_loader(filename: str, colmap: Dict[str, str]) -> Callable[[DataConfig], pd.DataFrame]:
    """Loader family for the canonicalized-CSV datasets
    (yoochoose/tmall/taobao/amazon-*), mirroring the absent
    DataHandle loaders' caching convention (data/orgin_data/<name>.csv)."""

    def load(cfg: DataConfig) -> pd.DataFrame:
        path = os.path.join(cfg.data_root, "orgin_data", filename)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} not found: place the canonicalized CSV there "
                f"(columns {sorted(colmap)} -> canonical schema)")
        df = pd.read_csv(path)
        if colmap:
            df = df.rename(columns=colmap)
        required = ["user_id", "item_id", "time_stamp", "cat_id"]
        missing = [c for c in required if c not in df.columns]
        if missing:
            raise ValueError(f"{path}: missing canonical columns {missing}")
        return min_activity_filter(df[required], cfg.min_user_actions,
                                   cfg.min_item_actions)

    return load


def load_synthetic(cfg: DataConfig) -> pd.DataFrame:
    """Seeded synthetic behavior log with realistic temporal structure.

    Stands in for the missing raw blobs in tests and benchmarks.  Users
    draw items from a user-specific Zipf-tilted catalog slice; inter-event
    gaps mix minutes/hours/days so the time features exercise the same
    dynamic range as real logs.
    """
    rng = np.random.RandomState(cfg.seed)
    users, items = cfg.synth_users, cfg.synth_items
    cats = cfg.synth_categories
    item_cat = rng.randint(0, cats, size=items)
    # Zipf-ish global popularity
    pop = 1.0 / (np.arange(1, items + 1) ** 0.8)
    rows = []
    base_time = 1_000_000_000
    for u in range(users):
        n = max(3, int(rng.poisson(cfg.synth_events_per_user)))
        # user taste: re-weight a random slice of the catalog
        taste = pop.copy()
        fav = rng.randint(0, items, size=max(4, items // 50))
        taste[fav] *= 20.0
        taste /= taste.sum()
        chosen = rng.choice(items, size=n, p=taste)
        gaps = rng.choice([60, 600, 3600, 6 * 3600, 86400, 3 * 86400],
                          size=n, p=[.15, .2, .25, .2, .15, .05])
        t = base_time + rng.randint(0, 86400) + np.cumsum(gaps)
        for i in range(n):
            rows.append((u, int(chosen[i]), int(t[i]), int(item_cat[chosen[i]])))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "time_stamp", "cat_id"])
    return df


def load_synthetic_sessions(cfg: DataConfig) -> pd.DataFrame:
    """Synthetic log with TIME-DEPENDENT dynamics, so the time-aware
    models have signal to exploit (unlike `load_synthetic`, whose tastes
    are static — BASELINE.md caveat):

      * behavior arrives in sessions: minute-scale gaps inside a session,
        day-scale gaps between sessions;
      * each session locks onto one category (Markov drift between
        sessions), and items are drawn zipf-wise within it — so a SHORT
        timelast predicts same-category continuation while a LONG gap
        predicts a category switch;
      * recent items are re-consumed with decaying probability — so
        timenow carries rank information.
    """
    rng = np.random.RandomState(cfg.seed)
    users, items = cfg.synth_users, cfg.synth_items
    cats = cfg.synth_categories
    item_cat = rng.randint(0, cats, size=items)
    items_by_cat = [np.nonzero(item_cat == c)[0] for c in range(cats)]
    # zipf weights within each category
    weights_by_cat = []
    for c in range(cats):
        n = len(items_by_cat[c])
        w = 1.0 / (np.arange(1, n + 1) ** 0.9) if n else np.zeros(0)
        weights_by_cat.append(w / w.sum() if n else w)
    rows = []
    base_time = 1_000_000_000
    for u in range(users):
        taste = rng.dirichlet(np.ones(cats) * 0.3)
        n_events = max(4, int(rng.poisson(cfg.synth_events_per_user)))
        t = base_time + int(rng.randint(0, 86400))
        cat = int(rng.choice(cats, p=taste))
        recent: list = []
        emitted = 0
        while emitted < n_events:
            # one session in category `cat`
            session_len = min(1 + rng.poisson(3), n_events - emitted)
            for _ in range(session_len):
                if recent and rng.rand() < 0.25:
                    item = recent[-1 - rng.randint(0, min(len(recent), 5))]
                else:
                    pool = items_by_cat[cat]
                    if len(pool) == 0:
                        item = int(rng.randint(0, items))
                    else:
                        item = int(rng.choice(pool, p=weights_by_cat[cat]))
                rows.append((u, item, t, int(item_cat[item])))
                recent.append(item)
                emitted += 1
                t += int(rng.choice([30, 60, 180, 600],
                                    p=[.3, .35, .25, .1]))
            # between sessions: long gap + possible interest drift
            t += int(rng.choice([4 * 3600, 86400, 3 * 86400, 7 * 86400],
                                p=[.3, .4, .2, .1]))
            if rng.rand() < 0.6:
                cat = int(rng.choice(cats, p=taste))
    return pd.DataFrame(rows,
                        columns=["user_id", "item_id", "time_stamp", "cat_id"])


def load_synthetic_timed(cfg: DataConfig) -> pd.DataFrame:
    """Gap-DECISIVE synthetic log: the next event's identity is a function
    of the time gap preceding it, so models that cannot read the time
    features face an irreducible mixture.

    Rules (the gap is the one the model sees as the last position's
    ``timenow`` / the attention gate's Δt to the target):

      * short gap (30 s – 10 min, p=.5): the session continues — same
        category; with p=.3 a repeat of one of the last 3 items, else a
        zipf(1.2) draw within the category;
      * medium gap (1–6 h, p=.3): the category hops via a GLOBAL
        derangement ``T_MED`` (learnable across users); zipf item in the
        new category;
      * long gap (1–7 d, p=.2): the user "returns": with p=.8 the next
        item is the user's persistent ANCHOR item (fixed per user,
        visible throughout their history), else a zipf draw in
        ``T_LONG[cat]``.

    Knowing the gap bucket therefore tells the model which of three very
    different conditional distributions the target comes from.  After the
    builder's hour conversion the buckets stay separated (0 h / 1–6 h /
    24–168 h).  A time-blind model (Gru4Rec, SASrec,
    MTAM_no_time_aware_*'s blinded halves) must average over buckets.
    This is the discriminating benchmark VERDICT.md round-1 item 1 asks
    for; the anchor-retrieval channel additionally favors attention over
    raw memory (MTAM) vs. pure RNN state compression (T_GRU).
    """
    rng = np.random.RandomState(cfg.seed)
    users, items = cfg.synth_users, cfg.synth_items
    cats = cfg.synth_categories
    item_cat = rng.randint(0, cats, size=items)
    items_by_cat = [np.nonzero(item_cat == c)[0] for c in range(cats)]
    weights_by_cat = []
    for c in range(cats):
        n = len(items_by_cat[c])
        w = 1.0 / (np.arange(1, n + 1) ** 1.2) if n else np.zeros(0)
        weights_by_cat.append(w / w.sum() if n else w)

    def derangement() -> np.ndarray:
        if cats < 2:
            # no derangement exists: the category hop degenerates to the
            # identity instead of looping forever (VERDICT.md r2 weak-2)
            return np.arange(cats)
        while True:
            p = rng.permutation(cats)
            if not np.any(p == np.arange(cats)):
                return p

    t_med, t_long = derangement(), derangement()

    def zipf_item(c: int) -> int:
        pool = items_by_cat[c]
        if len(pool) == 0:
            return int(rng.randint(0, items))
        return int(rng.choice(pool, p=weights_by_cat[c]))

    rows = []
    base_time = 1_000_000_000
    for u in range(users):
        anchor = int(rng.randint(0, items))
        n_events = max(6, int(rng.poisson(cfg.synth_events_per_user)))
        t = base_time + int(rng.randint(0, 86400))
        cat = int(rng.randint(0, cats))
        item = zipf_item(cat)
        recent = [item]
        rows.append((u, item, t, int(item_cat[item])))
        for _ in range(n_events - 1):
            bucket = rng.choice(3, p=[.5, .3, .2])
            if bucket == 0:            # short: session continues
                t += int(rng.randint(30, 600))
                if rng.rand() < 0.3:
                    item = recent[-1 - rng.randint(0, min(len(recent), 3))]
                else:
                    item = zipf_item(cat)
            elif bucket == 1:          # medium: global category hop
                t += int(rng.randint(1, 7)) * 3600
                cat = int(t_med[cat])
                item = zipf_item(cat)
            else:                      # long: anchored return
                t += int(rng.randint(24, 169)) * 3600
                if rng.rand() < 0.8:
                    item = anchor
                    cat = int(item_cat[anchor])
                else:
                    cat = int(t_long[cat])
                    item = zipf_item(cat)
            rows.append((u, item, t, int(item_cat[item])))
            recent.append(item)
    return pd.DataFrame(rows,
                        columns=["user_id", "item_id", "time_stamp", "cat_id"])


_LOADERS: Dict[str, Callable[[DataConfig], pd.DataFrame]] = {
    "synthetic_sessions": load_synthetic_sessions,
    "synthetic_timed": load_synthetic_timed,
    "ml_1m": load_ml_1m,
    "movielen": load_ml_1m,
    "synthetic": load_synthetic,
    "yoochoose": _csv_loader("yoochoose.csv", {}),
    "tmall": _csv_loader("tmall.csv", {}),
    "taobaoapp": _csv_loader("taobaoapp.csv", {}),
    "music": _csv_loader("amazon_music.csv", {}),
    "beauty": _csv_loader("amazon_beauty.csv", {}),
    "elec": _csv_loader("amazon_elec.csv", {}),
}


def load_origin_data(cfg: DataConfig) -> pd.DataFrame:
    try:
        loader = _LOADERS[cfg.dataset]
    except KeyError:
        raise KeyError(f"unknown dataset {cfg.dataset!r}; known: {sorted(_LOADERS)}")
    df = loader(cfg)
    return df
