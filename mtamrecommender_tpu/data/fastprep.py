"""ctypes bridge to the native C++ example builder (native/fastprep.cpp).

The Python builder (`data/prepare.py`, itself the behavioral port of
`/root/reference/Prepare/prepare_data_base.py:252-314`) walks per-example
Python lists — minutes of host time on the reference's larger catalogs
(tmall/taobao).  The native path does the same walk over flat int64 arrays
and writes the packed struct-of-arrays layout (`data/pipeline.PackedDataset`)
directly, ~6x faster end-to-end.

Parity contract (pinned by tests/test_fastprep.py): the native path emits
the EXACT same example multiset as the Python builder for the
`unidirection` and `time_window` causality modes.  Documented divergences:

  * shuffle order: the Python path shuffles with the reference's
    `random.Random(seed)` stream (prepare_data_base.py:189-196); this path
    permutes with `np.random.RandomState(seed)` — same determinism, a
    different stream, and training shuffles per-epoch anyway;
  * test-cap sampling identity: when the test set exceeds
    `DataConfig.test_cap` the 20k kept rows are a different (still seeded)
    sample than `random.sample`'s;
  * `causality='random'` consumes the Python `random.Random` stream inside
    the window choice (mask_data_process.py:163-169) and stays on the
    Python builder — `build_packed` raises RuntimeError so callers fall
    back.

The shared library is built on demand via `make -C native` (g++ only —
no pybind11 in this image, hence the C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from mtamrecommender_tpu.config import DataConfig
from mtamrecommender_tpu.data.prepare import map_process
from mtamrecommender_tpu.data.pipeline import PackedDataset
from mtamrecommender_tpu.types import DatasetMeta

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libfastprep.so")

# 'random' maps to the unidirection window: for the dense behavior mask
# list ([1..L-1], masking.mask_index_list_behavior) the reference's
# random cut is randint(index, index) == index — provably identical to
# 'unidirection' (mask_data_process.py:161-169: start = previous mask
# index = index-1, so the randint range collapses).  Its only reference
# side effect is consuming one value from the global Python random
# stream per example, which nothing in this framework shares.  Pinned by
# tests/test_fastprep.py::test_random_causality_native_parity.
_CAUSALITY_CODES = {"unidirection": 0, "time_window": 1, "random": 0}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_so() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    return os.path.exists(_SO_PATH)


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the shared library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        if not os.path.exists(_SO_PATH) and not _build_so():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _load_failed = True
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.fastprep_count.restype = ctypes.c_int64
        lib.fastprep_count.argtypes = [i64p, ctypes.c_int64]
        lib.fastprep_build.restype = ctypes.c_int64
        lib.fastprep_build.argtypes = (
            [i64p, i64p, ctypes.c_int64]          # user ids/offsets
            + [i64p] * 4                          # items/cats/stamps/cat_of_item
            + [ctypes.c_int64] * 5                # max_len/causality/window/counts
            + [i32p, i32p, i32p, f32p, f32p, f32p, i32p,
               i32p, i32p, f32p, i32p, u8p])
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native builder can be loaded (toolchain present)."""
    return _load() is not None


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def build_packed(origin_data: pd.DataFrame, cfg: DataConfig
                 ) -> Tuple[PackedDataset, PackedDataset, DatasetMeta]:
    """Native twin of ``prepare_examples`` + ``pack_examples``.

    Returns ``(train, test, meta)`` PackedDatasets.  Raises RuntimeError
    when the native path cannot serve this config (missing toolchain or
    an unknown causality mode) so callers fall back to the Python builder.
    """
    if cfg.causality not in _CAUSALITY_CODES:
        raise RuntimeError(
            f"fastprep does not support causality={cfg.causality!r}; "
            "use the Python builder")
    lib = _load()
    if lib is None:
        raise RuntimeError("native toolchain unavailable (make/g++ failed)")

    df, meta, item_category = map_process(origin_data)
    meta = meta._replace(max_seq_len=cfg.max_seq_len)

    # user_count_limit: the reference checks `now_count > limit` BEFORE
    # incrementing (prepare_data_base.py:243-246), so the first limit+1
    # users (ascending encoded id) are processed.
    users = np.unique(df["user_id"].to_numpy())
    if len(users) > cfg.user_count_limit + 1:
        df = df[df["user_id"].to_numpy() <= users[cfg.user_count_limit]]

    # per-user full-row dedup keep=last + stable time sort
    # (dedup_sort_user / prepare_data_base.py:219-249).  Done globally:
    # duplicates always share a user, and a stable (user,time) sort of the
    # deduped frame equals the per-user time sort of each group.
    if cfg.remove_duplicate:
        df = df.drop_duplicates(keep="last")
    df = df.sort_values(["user_id", "time_stamp"], kind="stable",
                        na_position="first").reset_index(drop=True)

    user_col = df["user_id"].to_numpy()
    boundaries = np.flatnonzero(np.diff(user_col)) + 1
    offsets = _as_i64(np.concatenate(([0], boundaries, [len(user_col)])))
    user_ids = _as_i64(user_col[offsets[:-1].astype(np.int64)])
    n_users = len(user_ids)

    items = _as_i64(df["item_id"].to_numpy())
    cats = _as_i64(df["cat_id"].to_numpy())
    stamps = _as_i64(df["time_stamp"].to_numpy())
    cat_of_item = np.zeros((meta.item_count,), np.int64)
    for it, c in item_category.items():
        cat_of_item[it] = c

    n = int(lib.fastprep_count(_ptr(offsets, ctypes.c_int64),
                               ctypes.c_int64(n_users)))
    L = cfg.max_seq_len
    out = {
        "user_id": np.empty((n,), np.int32),
        "items": np.empty((n, L), np.int32),
        "cats": np.empty((n, L), np.int32),
        "times": np.empty((n, L), np.float32),
        "time_last": np.empty((n, L), np.float32),
        "time_now": np.empty((n, L), np.float32),
        "positions": np.empty((n, L), np.int32),
        "target_id": np.empty((n,), np.int32),
        "target_cat": np.empty((n,), np.int32),
        "target_time": np.empty((n,), np.float32),
        "seq_len": np.empty((n,), np.int32),
    }
    is_test = np.empty((n,), np.uint8)

    rows = int(lib.fastprep_build(
        _ptr(user_ids, ctypes.c_int64), _ptr(offsets, ctypes.c_int64),
        ctypes.c_int64(n_users),
        _ptr(items, ctypes.c_int64), _ptr(cats, ctypes.c_int64),
        _ptr(stamps, ctypes.c_int64), _ptr(cat_of_item, ctypes.c_int64),
        ctypes.c_int64(L), ctypes.c_int64(_CAUSALITY_CODES[cfg.causality]),
        ctypes.c_int64(24 * 3600 * cfg.time_window_days),
        ctypes.c_int64(meta.item_count), ctypes.c_int64(meta.category_count),
        _ptr(out["user_id"], ctypes.c_int32), _ptr(out["items"], ctypes.c_int32),
        _ptr(out["cats"], ctypes.c_int32), _ptr(out["times"], ctypes.c_float),
        _ptr(out["time_last"], ctypes.c_float),
        _ptr(out["time_now"], ctypes.c_float),
        _ptr(out["positions"], ctypes.c_int32),
        _ptr(out["target_id"], ctypes.c_int32),
        _ptr(out["target_cat"], ctypes.c_int32),
        _ptr(out["target_time"], ctypes.c_float),
        _ptr(out["seq_len"], ctypes.c_int32), _ptr(is_test, ctypes.c_uint8)))
    if rows != n:
        raise RuntimeError(f"fastprep_build wrote {rows} rows, expected {n}")

    def _dataset(mask: np.ndarray) -> PackedDataset:
        idx = np.flatnonzero(mask)
        return PackedDataset(
            user_id=out["user_id"][idx], items=out["items"][idx],
            cats=out["cats"][idx], times=out["times"][idx],
            time_last=out["time_last"][idx], time_now=out["time_now"][idx],
            positions=out["positions"][idx], target_id=out["target_id"][idx],
            target_cat=out["target_cat"][idx],
            target_time=out["target_time"][idx],
            seq_len=out["seq_len"][idx], meta=meta)

    train = _dataset(is_test == 0)
    test = _dataset(is_test == 1)

    # seeded shuffle + test cap (prepare_data_base.py:189-196; divergent
    # stream, see module docstring)
    rng = np.random.RandomState(cfg.seed)
    train = train.select(rng.permutation(len(train)))
    test = test.select(rng.permutation(len(test)))
    if len(test) > cfg.test_cap:
        test = test.select(np.arange(cfg.test_cap))
    return train, test, meta
