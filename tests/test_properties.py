"""Property-based tests (hypothesis) for the data-prep math and metrics —
invariants the golden tests can't sweep.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from mtamrecommender_tpu.data import masking
from mtamrecommender_tpu.train import evaluate as eval_lib

import jax.numpy as jnp


@given(st.lists(st.integers(0, 10_000), min_size=2, max_size=60),
       st.integers(0, 20_000))
@settings(max_examples=50, deadline=None)
def test_time_features_invariants(hours, target):
    hours = sorted(hours)
    timelast, timenow = masking.time_features(hours, target)
    assert len(timelast) == len(hours) == len(timenow)
    assert timelast[0] == 0
    # timelast telescopes back to the raw series
    recon = [hours[0]]
    for d in timelast[1:]:
        recon.append(recon[-1] + d)
    assert recon == hours
    # timenow is an exact affine map of the series
    assert all(n == target - h for n, h in zip(timenow, hours))


@given(st.integers(1, 200), st.integers(2, 60))
@settings(max_examples=50, deadline=None)
def test_window_start_bounds(index, limit):
    start = masking.window_start(index, limit)
    assert 0 <= start <= index
    # keeps at most limit-1 history events (one slot for the mask token)
    assert index - start <= limit - 1


@given(st.integers(2, 40), st.integers(1, 39))
@settings(max_examples=50, deadline=None)
def test_rank_is_consistent_with_topk(vocab, target):
    target = min(target, vocab - 1)
    rng = np.random.RandomState(vocab * 31 + target)
    scores = rng.randn(1, vocab).astype(np.float32)
    rank = int(eval_lib.ranks_from_scores(jnp.asarray(scores),
                                          jnp.asarray([target]))[0])
    order = np.argsort(-scores[0], kind="stable")
    assert order[rank] == target


@given(st.integers(3, 30))
@settings(max_examples=30, deadline=None)
def test_hr_monotone_in_k(vocab):
    rng = np.random.RandomState(vocab)
    scores = jnp.asarray(rng.randn(8, vocab).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, vocab, 8))
    valid = jnp.ones((8,))
    ks = [1, 2, min(5, vocab), vocab]
    m = eval_lib.topk_metrics(scores, targets, valid, ks=ks)
    hrs = [float(m[f"hr@{k}"]) for k in ks]
    assert all(a <= b + 1e-9 for a, b in zip(hrs, hrs[1:]))
    assert abs(hrs[-1] - 1.0) < 1e-6  # k = vocab always hits


@given(st.lists(st.integers(1, 50), min_size=1, max_size=20),
       st.integers(2, 100))
@settings(max_examples=30, deadline=None)
def test_negative_items_avoid_positives(seq, item_count):
    rng = np.random.RandomState(1)
    mask_idx = list(range(len(seq)))
    want = min(5, max(1, item_count - len(set(seq)) - 1))
    neg = masking.negative_items(seq, mask_idx, item_count + 60, want, rng)
    assert len(neg) == want
    assert not (set(neg) & {seq[i] for i in mask_idx})
    assert len(set(neg)) == len(neg)
