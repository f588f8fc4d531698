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


def test_fastprep_rejects_random_causality():
    cfg = DataConfig(dataset="synthetic", causality="random")
    with pytest.raises(RuntimeError):
        fastprep.build_packed(load_synthetic(cfg), cfg)
