"""Data-layer parity tests: masking, example building, packing."""

import numpy as np
import pandas as pd
import pytest

from mtamrecommender_tpu.config import DataConfig
from mtamrecommender_tpu.data import masking
from mtamrecommender_tpu.data.ingest import load_synthetic, min_activity_filter
from mtamrecommender_tpu.data.pipeline import batch_iterator, pack_examples
from mtamrecommender_tpu.data.prepare import (build_user_examples, map_process,
                                              prepare_examples)


def test_gap_list_matches_reference():
    # prepare_data_base.get_gap_list: [60, 3600, 86400, 172800, 345600] for gap_num=6
    gap = masking.gap_list(6)
    assert gap.tolist() == [60, 3600, 86400, 172800, 345600]


def test_time_features_invariants():
    # pro_time_method: timelast[0]=0, timelast[i]=t[i]-t[i-1]; timenow=target-t
    t = [10, 12, 20, 21]
    timelast, timenow = masking.time_features(t, 30)
    assert timelast == [0, 2, 8, 1]
    assert timenow == [20, 18, 10, 9]


def test_window_start_keeps_at_most_limit_minus_one():
    # mask_data_process.py:181-184 keeps <= length_limit-1 history events
    assert masking.window_start(10, 50) == 0
    assert masking.window_start(60, 50) == 11
    # history = [start, index) has 49 events when index=60
    assert 60 - masking.window_start(60, 50) == 49


def test_build_user_examples_leave_last_out():
    cfg = DataConfig(max_seq_len=50)
    items = [3, 1, 4, 1, 5]
    cats = [0, 1, 0, 1, 2]
    stamps = [3600 * k for k in (1, 2, 5, 9, 14)]
    item_cat = {3: 0, 1: 1, 4: 0, 5: 2}
    train, test = build_user_examples(
        7, items, cats, stamps, item_count=100, category_count=10,
        item_category=item_cat, cfg=cfg)
    # positions 1..4 are targets; only index L-1 becomes test
    assert len(train) == 3 and len(test) == 1
    ex = test[0]
    user, iseq, cseq, tseq, tlast, tnow, pos, target, slen = ex
    assert user == 7
    assert iseq == [3, 1, 4, 1, 101]          # mask token item_count+1
    assert cseq == [0, 1, 0, 1, 11]
    assert tseq == [1, 2, 5, 9, 14]           # hours + appended target hour
    assert tlast == [0, 1, 3, 4, 0]
    assert tnow == [13, 12, 9, 5, 0]
    assert pos == [0, 1, 2, 3, 4]
    assert target == [5, 2, 14]
    assert slen == 5
    # first train example: history = [item0], target = item1
    first = sorted(train, key=lambda e: e[8])[0]
    assert first[1] == [3, 101] and first[7][0] == 1


def test_prepare_examples_end_to_end_counts():
    cfg = DataConfig(dataset="synthetic", synth_users=40,
                     synth_events_per_user=10, max_seq_len=50)
    df = load_synthetic(cfg)
    prepared = prepare_examples(df, cfg)
    # one test example per user with >= 2 events
    users_with_2 = (df.groupby("user_id").size() >= 2).sum()
    assert len(prepared.test_set) == users_with_2
    assert prepared.meta.item_count == df["item_id"].nunique()
    # every example's last item is the mask token
    for ex in prepared.test_set[:20]:
        assert ex[1][-1] == prepared.meta.item_count + 1
        assert ex[8] == len(ex[1]) <= cfg.max_seq_len


def test_prepare_cache_roundtrip(tmp_path):
    cfg = DataConfig(dataset="synthetic", synth_users=10,
                     synth_events_per_user=6)
    df = load_synthetic(cfg)
    p1 = prepare_examples(df, cfg, cache_dir=str(tmp_path))
    p2 = prepare_examples(df, cfg, cache_dir=str(tmp_path))
    assert p1.train_set == p2.train_set
    assert p1.test_set == p2.test_set
    assert p1.meta == p2.meta


def test_map_process_label_encoding():
    df = pd.DataFrame({"user_id": [10, 10, 99], "item_id": ["b", "a", "b"],
                       "time_stamp": [3, 1, 2], "cat_id": [7, 5, 7]})
    out, meta, item_cat = map_process(df)
    assert meta.user_count == 2 and meta.item_count == 2
    assert sorted(out["item_id"].unique().tolist()) == [0, 1]
    # sorted by (user, time)
    assert out.iloc[0]["time_stamp"] == 1
    assert item_cat == {1: 1, 0: 0}


def test_pack_and_iterate_partial_batch():
    cfg = DataConfig(dataset="synthetic", synth_users=30,
                     synth_events_per_user=8)
    prepared = prepare_examples(load_synthetic(cfg), cfg)
    packed = pack_examples(prepared.train_set, prepared.meta, max_len=50)
    batches = list(batch_iterator(packed, 32))
    total_valid = sum(int(b.valid.sum()) for _, b in batches)
    assert total_valid == len(prepared.train_set)
    for _, b in batches:
        assert b.items.shape == (32, 50)
        # padded rows keep seq_len=2 so gather indices stay in range
        assert int(b.seq_len.min()) >= 2


def test_min_activity_filter():
    df = pd.DataFrame({
        "user_id": [1] * 6 + [2] * 2,
        "item_id": [10, 11, 10, 11, 10, 11, 10, 11],
        "time_stamp": range(8), "cat_id": [0] * 8})
    out = min_activity_filter(df, min_user=5, min_item=2)
    assert set(out["user_id"]) == {1}


def test_prefetch_to_device_preserves_stream():
    from mtamrecommender_tpu.data.pipeline import prefetch_to_device
    import numpy as np
    from mtamrecommender_tpu.data.prepare import prepare_examples
    from mtamrecommender_tpu.data.ingest import load_synthetic
    from mtamrecommender_tpu.config import DataConfig
    cfg = DataConfig(dataset="synthetic", synth_users=20, synth_items=15,
                     synth_categories=3, synth_events_per_user=8,
                     max_seq_len=6)
    prepared = prepare_examples(load_synthetic(cfg), cfg)
    ds = pack_examples(prepared.train_set, prepared.meta)
    plain = list(batch_iterator(ds, 16))
    pre = list(prefetch_to_device(batch_iterator(ds, 16)))
    assert [s for s, _ in plain] == [s for s, _ in pre]
    for (_, a), (_, b) in zip(plain, pre):
        np.testing.assert_array_equal(np.asarray(a.items), np.asarray(b.items))
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_synthetic_sessions_generator():
    from mtamrecommender_tpu.data.ingest import load_synthetic_sessions
    cfg = DataConfig(dataset="synthetic_sessions", synth_users=30,
                     synth_items=40, synth_categories=5,
                     synth_events_per_user=15)
    df = load_synthetic_sessions(cfg)
    assert set(df.columns) == {"user_id", "item_id", "time_stamp", "cat_id"}
    assert df.user_id.nunique() == 30
    # per-user timestamps strictly increase
    for _, g in df.groupby("user_id"):
        t = g.time_stamp.values
        assert (np.diff(t) > 0).all()
    # session structure: both minute-scale and day-scale gaps exist
    gaps = np.concatenate([np.diff(g.time_stamp.values)
                           for _, g in df.groupby("user_id")])
    assert (gaps < 3600).any() and (gaps > 12 * 3600).any()
    # deterministic for a fixed seed
    df2 = load_synthetic_sessions(cfg)
    assert df.equals(df2)


def test_synthetic_timed_gap_buckets():
    """Pin the gap-decisive generator's statistics (VERDICT.md r2 weak-2):
    three separated gap buckets at the documented rates, and each bucket's
    conditional rule (session-continue / derangement hop / anchor return)
    actually holds in the emitted log."""
    from mtamrecommender_tpu.data.ingest import load_synthetic_timed
    cfg = DataConfig(dataset="synthetic_timed", synth_users=120,
                     synth_items=80, synth_categories=6,
                     synth_events_per_user=40)
    df = load_synthetic_timed(cfg)
    assert set(df.columns) == {"user_id", "item_id", "time_stamp", "cat_id"}
    short = medium = long_ = 0
    anchor_hits = long_total = 0
    same_cat = short_total = 0
    med_pairs = []
    for _, g in df.groupby("user_id"):
        t = g.time_stamp.values
        items = g.item_id.values
        cats = g.cat_id.values
        gaps = np.diff(t)
        assert (gaps > 0).all()
        # the long bucket's p=.8 target is the user's fixed anchor: take
        # the most common long-gap successor as the anchor estimate
        long_idx = np.nonzero(gaps >= 24 * 3600)[0]
        if len(long_idx) >= 3:
            succ = items[long_idx + 1]
            top = np.bincount(succ).argmax()
            anchor_hits += int((succ == top).sum())
            long_total += len(succ)
        for i, gap in enumerate(gaps):
            if gap < 600:
                short += 1
                short_total += 1
                same_cat += int(cats[i + 1] == cats[i])
            elif gap < 24 * 3600:
                medium += 1
                med_pairs.append((cats[i], cats[i + 1]))
            else:
                long_ += 1
    total = short + medium + long_
    # bucket rates ~ .5/.3/.2 (long-bucket anchor returns keep their bucket)
    assert abs(short / total - 0.5) < 0.05
    assert abs(medium / total - 0.3) < 0.05
    assert abs(long_ / total - 0.2) < 0.05
    # short gaps continue the session's category (repeats of `recent`
    # items can cross a category boundary, so not 100%; measured 0.87)
    assert same_cat / short_total > 0.8
    # medium gaps hop via a global derangement: deterministic per source
    # category, never the identity
    med_pairs = np.asarray(med_pairs)
    for c in np.unique(med_pairs[:, 0]):
        nxt = med_pairs[med_pairs[:, 0] == c, 1]
        # anchor returns can land mid-session, so allow a small minority
        # of off-map pairs; the dominant mapping must be a non-identity
        top = np.bincount(nxt).argmax()
        assert top != c
        assert (nxt == top).mean() > 0.9
    # long gaps return to the per-user anchor ~80% of the time
    assert anchor_hits / long_total > 0.6
    # deterministic for a fixed seed
    assert df.equals(load_synthetic_timed(cfg))


def test_synthetic_timed_single_category_terminates():
    """cats=1 has no derangement; the generator must degrade to the
    identity hop instead of spinning forever (VERDICT.md r2 weak-2)."""
    from mtamrecommender_tpu.data.ingest import load_synthetic_timed
    cfg = DataConfig(dataset="synthetic_timed", synth_users=5,
                     synth_items=10, synth_categories=1,
                     synth_events_per_user=8)
    df = load_synthetic_timed(cfg)
    assert len(df) >= 5 * 6 and (df.cat_id == 0).all()
