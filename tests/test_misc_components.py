"""Introspection, checkpointing, gang-encode, and prep-pipeline tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelettransforms_tpu.models.introspect import (get_layer_tensors,
                                                     model_structure,
                                                     model_summary)


def test_introspection(rng):
    state = {
        "resnet.embedder.convolution.weight": rng.standard_normal((4, 3, 7, 7)),
        "resnet.embedder.normalization.weight": rng.standard_normal(4),
        "classifier.1.weight": rng.standard_normal((10, 4)),
    }
    lines = []
    total = model_summary(state, sink=lines.append)
    assert total == 4 * 3 * 49 + 4 + 40
    lines = []
    model_structure(state, sink=lines.append)
    assert "resnet" in [l.strip() for l in lines]
    hits = get_layer_tensors(state, "resnet.embedder.convolution")
    assert list(hits) == ["resnet.embedder.convolution.weight"]
    hits = get_layer_tensors(
        state, "ResNetForImageClassification.resnet.embedder")
    assert len(hits) == 2


def test_sweep_progress(tmp_path):
    from wavelettransforms_tpu.utils.checkpointing import SweepProgress

    p = str(tmp_path / "progress.json")
    sp = SweepProgress(p)
    assert not sp.is_done(0.5)
    sp.mark(0.5, "abcd")
    sp2 = SweepProgress(p)
    assert sp2.is_done(0.5) and not sp2.is_done(0.618)


def test_orbax_train_state_roundtrip(tmp_path, rng):
    from wavelettransforms_tpu.utils.checkpointing import (load_train_state,
                                                           save_train_state)

    state = {"params": {"w": jnp.asarray(rng.standard_normal((4, 4)))},
             "step": jnp.asarray(7)}
    path = save_train_state(str(tmp_path / "ckpt"), state)
    back = load_train_state(path, like=jax.device_get(state))
    np.testing.assert_allclose(np.asarray(back["params"]["w"]),
                               np.asarray(state["params"]["w"]))
    assert int(back["step"]) == 7


def test_gang_encode_sharded_matches_single(rng):
    from wavelettransforms_tpu.parallel.gang import gang_encode_sharded
    from wavelettransforms_tpu.parallel.mesh import make_mesh
    from wavelettransforms_tpu.prune import wavelet_pruning

    mesh = make_mesh({"data": 8})
    params = {
        "a.convolution.weight": rng.standard_normal((64, 16, 3, 3)).astype(np.float32),
        "b.convolution.weight": rng.standard_normal((32, 8, 3, 3)).astype(np.float32),
    }
    sharded, s_stats = gang_encode_sharded(params, "haar", 1, 61.8, mesh)
    single, stats = wavelet_pruning(params, "haar", 1, 61.8)
    for k in params:
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(single[k]), atol=2e-6)
    assert s_stats.total_pruned == stats.total_pruned


def test_gang_encode_sharded_awkward_tensors_bit_exact(rng):
    """Tensors with NO mesh-divisible channel axis shard via pad-and-mask
    (zero out-channels appended, percentile rank-shifted, output sliced
    back); in-channel-divisible tensors shard on axis 1.  Nothing
    replicates and every output is BIT-exact vs the unsharded encode
    (VERDICT r4 item 6)."""
    from wavelettransforms_tpu.parallel.gang import (_gang_sharding,
                                                     gang_encode_sharded)
    from wavelettransforms_tpu.parallel.mesh import make_mesh
    from wavelettransforms_tpu.prune import wavelet_pruning

    mesh = make_mesh({"data": 8})
    params = {
        # odd out-channels, in-channels not divisible -> pad-and-mask
        "c.convolution.weight": rng.standard_normal((9, 4, 3, 3)).astype(np.float32),
        # out not divisible, in divisible -> axis-1 sharding
        "d.convolution.weight": rng.standard_normal((12, 8, 3, 3)).astype(np.float32),
        # grouped with c (same padded shape is NOT required): even shard
        "e.convolution.weight": rng.standard_normal((16, 4, 3, 3)).astype(np.float32),
    }
    sh_c, pad_c = _gang_sharding(mesh, (9, 4, 3, 3), "data")
    assert pad_c == 7 and not sh_c.is_fully_replicated
    sh_d, pad_d = _gang_sharding(mesh, (12, 8, 3, 3), "data")
    assert pad_d == 0 and not sh_d.is_fully_replicated

    sharded, s_stats = gang_encode_sharded(params, "haar", 1, 61.8, mesh)
    single, stats = wavelet_pruning(params, "haar", 1, 61.8)
    for k in params:
        assert sharded[k].shape == params[k].shape
        np.testing.assert_array_equal(
            np.asarray(sharded[k]), np.asarray(single[k]),
            err_msg=f"sharded != unsharded for {k}")
    assert s_stats.total_pruned == stats.total_pruned
    assert ([l.pruned_count for l in s_stats.layers]
            == [l.pruned_count for l in stats.layers])


def test_grouped_pad_rank_shift_matches_per_tensor(rng):
    """percentile_abs_stacks pad_zeros: a slice with appended zero pad
    elements yields the SAME threshold as the unpadded tensor (rank shift
    over physical zeros), for fractional and integer ranks."""
    from wavelettransforms_tpu.parallel.quantile import (
        percentile_abs, percentile_abs_stacks)

    x = rng.standard_normal((5, 7, 11)).astype(np.float32)
    for q in (50.0, 61.8, 0.0, 100.0, 33.333):
        want = percentile_abs(jnp.asarray(x), q)
        for pad in (1, 8, 64):
            xp = np.concatenate(
                [x, np.zeros((pad, 7, 11), np.float32)])[None]
            got = percentile_abs_stacks(
                [jnp.asarray(xp)], q, pad_zeros=[[pad * 7 * 11]])[0][0]
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"q={q} pad={pad}")


def test_prep_pipeline(tmp_path, rng):
    from wavelettransforms_tpu.data.imagenet import SyntheticImageNet
    from wavelettransforms_tpu.data.prep import load_preprocessed_batches

    # emulate prepare_and_save_data on synthetic batches
    import numpy as np
    out = tmp_path / "batches"
    out.mkdir()
    ds = SyntheticImageNet(10, image_size=16, num_classes=3)
    from wavelettransforms_tpu.data.imagenet import batch_iterator

    for i, (img, lab) in enumerate(batch_iterator(ds, 4)):
        np.savez(out / f"batch_{i}.npz", images=img, labels=lab)
    batches = list(load_preprocessed_batches(str(out)))
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 16, 16, 3)
    assert batches[-1][0].shape[0] == 2
