"""Model + checkpoint IO tests (small configs to keep CI fast)."""
import os

import jax
import numpy as np
import pytest

from wavelettransforms_tpu.models import (
    ResNetConfig, conv_weight_names, create_model, create_random_checkpoint,
    flax_to_torch_state, load_config, load_torch_state, torch_state_to_flax)

TINY = ResNetConfig(hidden_sizes=(8, 16, 32, 64), embedding_size=8,
                    depths=(1, 1, 1, 1), num_labels=10)


def test_tiny_forward(rng):
    model = create_model(TINY)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_conv_count_resnet18_shapes():
    # 20 prunable convs / 11,166,912 params — the reference's exact inventory
    # (SURVEY.md §2.3 item 9) — verified from the architecture alone.
    model = create_model("resnet18")
    x = np.zeros((1, 224, 224, 3), np.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x))
    state = {}
    def walk(tree, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                state[key] = v
    walk(variables["params"])
    convs = [k for k, v in state.items()
             if k.endswith("convolution.kernel") and len(v.shape) == 4]
    assert len(convs) == 20
    assert sum(int(np.prod(state[k].shape)) for k in convs) == 11166912


def test_checkpoint_roundtrip(tmp_path):
    ck = create_random_checkpoint(str(tmp_path / "m"), TINY, seed=3)
    state = load_torch_state(ck)
    cfg = ResNetConfig.from_hf_dict(load_config(ck))
    assert cfg.hidden_sizes == TINY.hidden_sizes
    convs = conv_weight_names(state)
    assert all(state[n].ndim == 4 for n in convs)
    # HF torch layout: (O, I, kH, kW)
    emb = state["resnet.embedder.embedder.convolution.weight"]
    assert emb.shape == (8, 3, 7, 7)
    # flax round trip is exact
    variables = torch_state_to_flax(state)
    back = flax_to_torch_state(variables)
    for k, v in state.items():
        np.testing.assert_array_equal(np.asarray(back[k]), v, err_msg=k)


def test_pruned_checkpoint_forward(tmp_path, rng):
    # end-to-end: random ckpt -> DWT prune -> reload -> forward still finite
    from wavelettransforms_tpu.prune import wavelet_pruning
    from wavelettransforms_tpu.models import save_torch_state, hf_config_dict

    ck = create_random_checkpoint(str(tmp_path / "og"), TINY, seed=1)
    state = load_torch_state(ck)
    convs = {n: state[n] for n in conv_weight_names(state)}
    pruned, stats = wavelet_pruning(convs, "haar", 1, 50.0)
    state.update({k: np.asarray(v) for k, v in pruned.items()})
    out = save_torch_state(state, str(tmp_path / "pruned"),
                           hf_config_dict(TINY))
    state2 = load_torch_state(out)
    variables = torch_state_to_flax(state2)
    model = create_model(TINY)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    logits = model.apply(variables, x)
    assert np.isfinite(np.asarray(logits)).all()
    # haar-transformed layers reconstruct to NEAR-zeros, not exact zeros
    # (reference §2.3 item 7), so the exact-zero fraction is small; the 1x1
    # shortcut convs clamp to level 0 and prune exactly 50%.
    assert 0.0 < stats.prune_fraction < 0.5
    shortcut = [l for l in stats.layers if "shortcut" in l.layer_name][0]
    assert shortcut.pruned_count == shortcut.original_param_count // 2
