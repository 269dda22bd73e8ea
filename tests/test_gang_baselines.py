"""TPU-native gang-encoded baseline pruners (min-weight / random).

Pins:
  * radix count-threshold mask == stable-argsort selection, bit for bit,
    including ties at the count boundary (reference semantics:
    /root/reference/ResNet/min_weight_pruning.py:66-74 topk largest=False);
  * exact prune counts for the random mask (reference replays per-layer
    counts, /root/reference/ResNet/random_pruning.py:53-55), including key
    collisions at the boundary;
  * the gang programs match the per-tensor functions bit for bit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelettransforms_tpu.ops import threshold as th
from wavelettransforms_tpu.prune.min_weight import (_gang_min,
                                                    min_weight_prune_tensor)
from wavelettransforms_tpu.prune.random_prune import _gang_random


def _argsort_mask(x, count):
    flat = np.abs(np.asarray(x, np.float32)).ravel()
    order = np.argsort(flat, kind="stable")
    m = np.zeros(flat.shape, bool)
    m[order[:count]] = True
    return m.reshape(np.shape(x))


@pytest.mark.parametrize("count", [0, 1, 250, 999, 1000])
def test_topk_mask_matches_stable_argsort(rng, count):
    w = rng.standard_normal(1000).astype(np.float32)
    got = np.asarray(th.topk_smallest_mask(jnp.asarray(w), count))
    np.testing.assert_array_equal(got, _argsort_mask(w, count))


def test_topk_mask_tie_breaking_matches_argsort(rng):
    # heavy ties: quantized values, plus explicit zeros
    w = np.round(rng.standard_normal((8, 16)) * 2).astype(np.float32) / 2
    w[0, :5] = 0.0
    for count in (0, 3, 17, 64, 100, 128):
        got = np.asarray(th.topk_smallest_mask(jnp.asarray(w), count))
        np.testing.assert_array_equal(got, _argsort_mask(w, count),
                                      err_msg=f"count={count}")


def test_smallest_bits_mask_sliced_counts_and_batch_parity(rng):
    g, n = 5, 4096
    x = rng.standard_normal((g, n)).astype(np.float32)
    counts = (0, 7, 2048, 4095, 4096)
    bits = th._abs_order_bits(jnp.asarray(x))
    mask = np.asarray(th.smallest_bits_mask_sliced(bits, counts))
    for i, c in enumerate(counts):
        assert mask[i].sum() == c
        np.testing.assert_array_equal(mask[i], _argsort_mask(x[i], c))


def test_random_mask_exact_count_and_determinism():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((37, 41), jnp.float32)
    for count in (0, 1, 500, 37 * 41):
        m = np.asarray(th.random_mask(key, x, count))
        assert m.sum() == count, count
        assert m.shape == (37, 41)
    m1 = np.asarray(th.random_mask(key, x, 500))
    m2 = np.asarray(th.random_mask(key, x, 500))
    m3 = np.asarray(th.random_mask(jax.random.PRNGKey(1), x, 500))
    np.testing.assert_array_equal(m1, m2)
    assert (m1 != m3).any()


def test_random_mask_handles_key_collisions():
    # force boundary collisions: tiny key space is impossible to rig via the
    # public API, so select at a boundary inside a large array where ties in
    # uint32 keys occur with realistic probability over many draws; exactness
    # of the count is the invariant.
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((1 << 16,), jnp.float32)
    for count in (1 << 10, 1 << 15, (1 << 16) - 1):
        assert int(np.asarray(th.random_mask(key, x, count)).sum()) == count


def test_random_mask_is_roughly_uniform():
    x = jnp.zeros((10_000,), jnp.float32)
    hits = np.zeros(10_000)
    trials = 20
    for s in range(trials):
        hits += np.asarray(th.random_mask(jax.random.PRNGKey(s), x, 1000))
    # each element hit with p=0.1 per trial; mean 2.0, sd ~1.34 over 20
    assert abs(hits.mean() - 2.0) < 0.1
    assert hits.max() <= 12


def test_gang_min_matches_per_tensor(rng):
    tensors = tuple(jnp.asarray(rng.standard_normal(s).astype(np.float32))
                    for s in [(16, 8, 3, 3), (16, 8, 3, 3), (32, 4), (7,)])
    counts = tuple(int(t.size * 0.3) for t in tensors)
    out, zeros = _gang_min(tensors, counts)
    for t, c, o, z in zip(tensors, counts, out, zeros):
        ref = min_weight_prune_tensor(t, c)
        np.testing.assert_array_equal(np.asarray(o), np.asarray(ref))
        assert int(z) == int(np.sum(np.asarray(o) == 0))


def test_gang_random_counts_and_shapes(rng):
    tensors = tuple(jnp.asarray(rng.standard_normal(s).astype(np.float32))
                    for s in [(16, 8, 3, 3), (16, 8, 3, 3), (64, 18)])
    counts = (100, 700, 64 * 18)
    out, zeros = _gang_random(jax.random.PRNGKey(0), tensors, counts)
    for t, c, o, z in zip(tensors, counts, out, zeros):
        o = np.asarray(o)
        assert o.shape == t.shape
        assert int(z) == c  # inputs have no natural zeros
        # unpruned entries unchanged
        np.testing.assert_array_equal(o[o != 0], np.asarray(t)[o != 0])
    # same-size layers get independent masks
    assert (np.asarray(out[0]) == 0).sum() != ((np.asarray(out[1]) == 0)
                                               & (np.asarray(out[0]) == 0)).sum()
