"""Native example-builder parity: the C++ fast path must produce the
exact same example SET as the Python builder (order and test-cap sampling
identity may differ — documented divergence in data/fastprep.py)."""

import numpy as np
import pytest

from mtamrecommender_tpu.config import DataConfig
from mtamrecommender_tpu.data import fastprep
from mtamrecommender_tpu.data.ingest import load_synthetic
from mtamrecommender_tpu.data.pipeline import pack_examples
from mtamrecommender_tpu.data.prepare import prepare_examples

pytestmark = pytest.mark.skipif(not fastprep.available(),
                                reason="native toolchain unavailable")


def _row_set(ds):
    """Canonical multiset of packed rows (duplicates are legitimate: two
    events in the same hour can produce identical windows)."""
    from collections import Counter
    rows = Counter()
    for k in range(len(ds)):
        rows[(
            int(ds.user_id[k]), ds.items[k].tobytes(), ds.cats[k].tobytes(),
            ds.times[k].tobytes(), ds.time_last[k].tobytes(),
            ds.time_now[k].tobytes(), ds.positions[k].tobytes(),
            int(ds.target_id[k]), int(ds.target_cat[k]),
            float(ds.target_time[k]), int(ds.seq_len[k]))] += 1
    return rows


@pytest.mark.parametrize("causality", ["unidirection", "time_window"])
def test_fastprep_matches_python_builder(causality):
    cfg = DataConfig(dataset="synthetic", synth_users=40, synth_items=30,
                     synth_categories=4, synth_events_per_user=12,
                     max_seq_len=8, user_count_limit=10_000,
                     causality=causality)
    origin = load_synthetic(cfg)

    prepared = prepare_examples(origin, cfg)
    py_train = pack_examples(prepared.train_set, prepared.meta)
    py_test = pack_examples(prepared.test_set, prepared.meta)

    fast_train, fast_test, meta = fastprep.build_packed(origin, cfg)

    assert meta.item_count == prepared.meta.item_count
    assert meta.category_count == prepared.meta.category_count
    assert _row_set(fast_train) == _row_set(py_train)
    assert _row_set(fast_test) == _row_set(py_test)


def test_fastprep_user_count_limit():
    cfg = DataConfig(dataset="synthetic", synth_users=30, synth_items=20,
                     synth_categories=3, synth_events_per_user=8,
                     max_seq_len=6, user_count_limit=9)
    origin = load_synthetic(cfg)
    prepared = prepare_examples(origin, cfg)
    fast_train, fast_test, _ = fastprep.build_packed(origin, cfg)
    py_users = {ex[0] for ex in prepared.train_set}
    fast_users = set(np.unique(fast_train.user_id).tolist())
    assert fast_users == py_users


def test_fastprep_rejects_unknown_causality():
    cfg = DataConfig(dataset="synthetic", causality="bogus")
    with pytest.raises(RuntimeError, match="does not support causality"):
        fastprep.build_packed(load_synthetic(cfg), cfg)


def test_random_causality_degenerates_to_unidirection():
    """For the dense behavior mask list the reference's 'random' window
    is randint(index, index) == index (mask_data_process.py:161-169), so
    select_window('random') must equal select_window('unidirection') at
    every index — the degeneracy fastprep relies on."""
    import random as pyrandom

    from mtamrecommender_tpu.data import masking

    stamps = list(range(0, 4000, 100))
    mask_indices = masking.mask_index_list_behavior(len(stamps))
    rng = pyrandom.Random(7)
    for index in mask_indices:
        uni = masking.select_window("unidirection", index, stamps,
                                    mask_indices, length_limit=8)
        rnd = masking.select_window("random", index, stamps, mask_indices,
                                    length_limit=8, py_random=rng)
        assert uni == rnd, index


def test_random_causality_native_parity():
    """causality='random' now runs on the native builder and must emit
    the same packed rows as causality='unidirection' (VERDICT.md r2
    missing-5)."""
    from mtamrecommender_tpu.data import fastprep
    from mtamrecommender_tpu.data.ingest import load_synthetic

    if not fastprep.available():
        pytest.skip("native toolchain unavailable")
    cfg_u = DataConfig(dataset="synthetic", synth_users=25, synth_items=30,
                       synth_categories=4, synth_events_per_user=10,
                       max_seq_len=8, causality="unidirection")
    cfg_r = DataConfig(**{**cfg_u.__dict__, "causality": "random"})
    origin = load_synthetic(cfg_u)
    train_u, test_u, _ = fastprep.build_packed(origin, cfg_u)
    train_r, test_r, _ = fastprep.build_packed(origin, cfg_r)
    import dataclasses
    for a, b in ((train_u, train_r), (test_u, test_r)):
        for f in dataclasses.fields(a):
            av, bv = getattr(a, f.name), getattr(b, f.name)
            if hasattr(av, "shape"):
                np.testing.assert_array_equal(np.asarray(av),
                                              np.asarray(bv))
