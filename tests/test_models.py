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


def test_third_party_hf_checkpoint_numpy_forward(tmp_path, rng):
    """A bit-exact HF-format ResNet-18 checkpoint written by a THIRD PARTY
    (state dict + config.json constructed here from the public HF key
    layout, saved with the safetensors library directly — none of this
    framework's writers) loads through hf_io -> flax -> eval and predicts
    identically to an independent numpy NCHW forward re-implementation.

    Proves the real-weights ingest path: hand the CLI a genuine
    microsoft/resnet-18 download and the BASELINE.md table reproduces with
    zero code changes (/root/reference/ResNet/testing_suite/main.py:107-170
    loader semantics)."""
    import json

    from safetensors.numpy import save_file

    # --- third-party checkpoint construction (HF public key layout) ------
    depths, hidden, embed, nlab = (2, 2, 2, 2), (64, 128, 256, 512), 64, 1000
    sd: dict = {}

    def norm(prefix, c):
        sd[prefix + ".weight"] = (1 + 0.1 * rng.standard_normal(c)).astype(
            np.float32)
        sd[prefix + ".bias"] = (0.1 * rng.standard_normal(c)).astype(
            np.float32)
        sd[prefix + ".running_mean"] = (0.1 * rng.standard_normal(c)).astype(
            np.float32)
        sd[prefix + ".running_var"] = (1 + 0.5 * rng.random(c)).astype(
            np.float32)
        sd[prefix + ".num_batches_tracked"] = np.asarray(7, np.int64)

    def convnorm(prefix, o, i, k):
        sd[prefix + ".convolution.weight"] = (
            rng.standard_normal((o, i, k, k)) / np.sqrt(i * k * k)).astype(
                np.float32)
        norm(prefix + ".normalization", o)

    convnorm("resnet.embedder.embedder", embed, 3, 7)
    in_c = embed
    for s, (c, d) in enumerate(zip(hidden, depths)):
        for l in range(d):
            p = f"resnet.encoder.stages.{s}.layers.{l}"
            if l == 0 and (in_c != c or s > 0):
                convnorm(p + ".shortcut", c, in_c, 1)
            convnorm(p + ".layer.0", c, in_c, 3)
            convnorm(p + ".layer.1", c, c, 3)
            in_c = c
    sd["classifier.1.weight"] = (
        rng.standard_normal((nlab, hidden[-1])) / np.sqrt(hidden[-1])
    ).astype(np.float32)
    sd["classifier.1.bias"] = (0.01 * rng.standard_normal(nlab)).astype(
        np.float32)

    ckpt = tmp_path / "third_party"
    ckpt.mkdir()
    save_file(sd, str(ckpt / "model.safetensors"), metadata={"format": "pt"})
    with open(ckpt / "config.json", "w") as f:
        json.dump({
            "architectures": ["ResNetForImageClassification"],
            "model_type": "resnet", "num_channels": 3,
            "embedding_size": embed, "hidden_sizes": list(hidden),
            "depths": list(depths), "layer_type": "basic",
            "downsample_in_first_stage": False,
            "id2label": {str(i): f"L{i}" for i in range(nlab)},
        }, f)

    # --- framework ingest: hf_io -> flax -> forward -----------------------
    state = load_torch_state(str(ckpt))
    assert len(conv_weight_names(state)) == 20
    cfg = ResNetConfig.from_hf_dict(load_config(str(ckpt)))
    model = create_model(cfg)
    variables = torch_state_to_flax(state)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    logits = np.asarray(model.apply(variables, x))

    # --- independent numpy NCHW forward (torch/HF semantics) --------------
    eps = 1e-5

    def np_conv(y, w, stride):
        o, i, kh, kw = w.shape
        pad = kh // 2
        yp = np.pad(y, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        ho = (y.shape[2] + 2 * pad - kh) // stride + 1
        wo = (y.shape[3] + 2 * pad - kw) // stride + 1
        out = np.zeros((y.shape[0], o, ho, wo), np.float32)
        for dy in range(kh):
            for dx in range(kw):
                ys = yp[:, :, dy:dy + stride * ho:stride,
                        dx:dx + stride * wo:stride]
                out += np.einsum("bchw,oc->bohw", ys, w[:, :, dy, dx],
                                 dtype=np.float32)
        return out

    def np_bn(y, p):
        g = sd[p + ".weight"][None, :, None, None]
        b = sd[p + ".bias"][None, :, None, None]
        m = sd[p + ".running_mean"][None, :, None, None]
        v = sd[p + ".running_var"][None, :, None, None]
        return (y - m) / np.sqrt(v + eps) * g + b

    def np_convnorm(y, p, stride, act=True):
        y = np_bn(np_conv(y, sd[p + ".convolution.weight"], stride),
                  p + ".normalization")
        return np.maximum(y, 0) if act else y

    y = np.transpose(x, (0, 3, 1, 2))  # NHWC test input -> NCHW
    y = np_convnorm(y, "resnet.embedder.embedder", 2)
    # maxpool 3x3 stride 2 pad 1 (-inf padding)
    yp = np.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1)),
                constant_values=-np.inf)
    ho = (y.shape[2] + 2 - 3) // 2 + 1
    y = np.stack([
        yp[:, :, dy:dy + 2 * ho:2, dx:dx + 2 * ho:2]
        for dy in range(3) for dx in range(3)], 0).max(0)
    in_c = embed
    for s, (c, d) in enumerate(zip(hidden, depths)):
        for l in range(d):
            p = f"resnet.encoder.stages.{s}.layers.{l}"
            stride = 2 if (s > 0 and l == 0) else 1
            res = y
            if l == 0 and (in_c != c or stride != 1):
                res = np_bn(
                    np_conv(y, sd[p + ".shortcut.convolution.weight"],
                            stride), p + ".shortcut.normalization")
            h = np_convnorm(y, p + ".layer.0", stride)
            h = np_convnorm(h, p + ".layer.1", 1, act=False)
            y = np.maximum(h + res, 0)
            in_c = c
    pooled = y.mean(axis=(2, 3))
    want = pooled @ sd["classifier.1.weight"].T + sd["classifier.1.bias"]

    np.testing.assert_array_equal(np.argmax(logits, -1), np.argmax(want, -1))
    np.testing.assert_allclose(logits, want, rtol=0, atol=5e-4)


def test_bottleneck_family_roundtrip_and_forward(tmp_path, rng):
    """ResNet-50-style bottleneck config: HF checkpoint round trip is exact
    and the forward runs (the reference only used ResNet-18, but the eval
    suite loads whatever config.json describes —
    /root/reference/ResNet/testing_suite/utils.py:28-41)."""
    cfg = ResNetConfig(hidden_sizes=(32, 64, 128, 256), embedding_size=16,
                       depths=(1, 1, 1, 1), layer_type="bottleneck",
                       num_labels=10)
    ck = create_random_checkpoint(str(tmp_path / "b"), cfg, seed=4)
    state = load_torch_state(ck)
    # bottleneck blocks expose three conv layers + shortcut per block
    assert any(".layer.2.convolution.weight" in k for k in state)
    cfg2 = ResNetConfig.from_hf_dict(load_config(ck))
    assert cfg2.layer_type == "bottleneck"
    variables = torch_state_to_flax(state)
    back = flax_to_torch_state(variables)
    for k, v in state.items():
        np.testing.assert_array_equal(np.asarray(back[k]), v, err_msg=k)
    model = create_model(cfg2)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    logits = np.asarray(model.apply(variables, x))
    assert logits.shape == (2, 10) and np.isfinite(logits).all()
