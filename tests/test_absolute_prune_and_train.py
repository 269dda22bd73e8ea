"""Legacy absolute-threshold pruning + training-step tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wavelettransforms_tpu.prune.dwt_prune_absolute import (
    dwt_prune_tensor_absolute, wavelet_pruning_absolute)


def test_absolute_threshold_level0(rng):
    w = rng.standard_normal((4, 4, 3, 3))
    pruned = dwt_prune_tensor_absolute(jnp.asarray(w), "bior4.4", 5, 0.5)
    expect = np.where(np.abs(w) < 0.5, 0, w)
    np.testing.assert_allclose(np.asarray(pruned), expect, atol=1e-12)


def test_absolute_sweep_includes_1d(rng):
    params = {"w": rng.standard_normal((4, 4, 8, 8)),
              "b": rng.standard_normal(16)}
    new, stats = wavelet_pruning_absolute(params, "haar", 2, 0.8)
    # legacy variant prunes ALL parameters incl. 1-D biases
    assert {l.layer_name for l in stats.layers} == {"w", "b"}
    np.testing.assert_array_equal(
        np.asarray(new["b"]), np.where(np.abs(params["b"]) < 0.8, 0,
                                       params["b"]))


def test_absolute_zero_threshold_lossless(rng):
    w = rng.standard_normal((2, 2, 16, 16))
    pruned = dwt_prune_tensor_absolute(jnp.asarray(w), "db2", 2, 0.0)
    np.testing.assert_allclose(np.asarray(pruned), w, atol=1e-9)


def test_train_step_preserves_sparsity(rng):
    from wavelettransforms_tpu.models import create_model
    from wavelettransforms_tpu.models.resnet import ResNetConfig
    from wavelettransforms_tpu.train import (make_train_state, sparsity_mask,
                                             train_step)

    cfg = ResNetConfig(hidden_sizes=(8, 16, 32, 64), embedding_size=8,
                       depths=(1, 1, 1, 1), num_labels=10)
    model = create_model(cfg)
    images = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 3], np.int32)
    state, tx = make_train_state(model, jax.random.PRNGKey(0), images[:1],
                                 tx=optax.sgd(0.1, momentum=0.9))

    # zero half of one conv kernel and freeze the mask
    p = state["params"]["resnet"]["stage_0"]["layer_0"]["layer_0"][
        "convolution"]["kernel"]
    mask_np = rng.random(p.shape) > 0.5
    state["params"]["resnet"]["stage_0"]["layer_0"]["layer_0"][
        "convolution"]["kernel"] = jnp.where(mask_np, p, 0.0)
    mask = sparsity_mask(state["params"])

    losses = []
    for step_i in range(3):
        state, metrics = train_step(model, tx, state, jnp.asarray(images),
                                    jnp.asarray(labels), mask)
        losses.append(float(metrics["loss"]))
    k = np.asarray(state["params"]["resnet"]["stage_0"]["layer_0"]["layer_0"][
        "convolution"]["kernel"])
    # pruned positions stayed exactly zero; surviving weights moved
    assert np.all(k[~mask_np] == 0.0)
    assert np.any(k[mask_np] != np.asarray(p)[mask_np])
    assert np.isfinite(losses).all()


def test_train_step_learns(rng):
    # loss decreases on a fixed batch within a few steps
    from wavelettransforms_tpu.models import create_model
    from wavelettransforms_tpu.models.resnet import ResNetConfig
    from wavelettransforms_tpu.train import make_train_state, train_step

    cfg = ResNetConfig(hidden_sizes=(4, 8, 8, 8), embedding_size=4,
                       depths=(1, 1, 1, 1), num_labels=4)
    model = create_model(cfg)
    images = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    labels = np.arange(8, dtype=np.int32) % 4
    state, tx = make_train_state(model, jax.random.PRNGKey(1), images[:1],
                                 tx=optax.sgd(0.05, momentum=0.9))
    first = last = None
    for _ in range(8):
        state, m = train_step(model, tx, state, jnp.asarray(images),
                              jnp.asarray(labels))
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first
