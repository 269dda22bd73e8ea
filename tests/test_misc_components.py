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
