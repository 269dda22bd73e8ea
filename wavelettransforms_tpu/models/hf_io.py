"""HuggingFace-compatible checkpoint IO (safetensors + config.json).

Round-trips the exact artifact format the reference produces and consumes:
``save_pretrained`` output dirs holding ``model.safetensors`` + ``config.json``
(/root/reference/ResNet/utils.py:28-38 writer,
/root/reference/ResNet/testing_suite/utils.py:44-111 reader with subdirectory
fallback).  Two views of a checkpoint:

* **torch-layout flat dict** ``{hf_name: np.ndarray}`` — the pruning parity
  path: conv kernels are (O, I, kH, kW) and the DWT runs over the last two
  axes exactly like the reference.
* **flax param tree** — for the TPU forward pass / training; conv kernels
  are (kH, kW, I, O), translated both ways here.
"""
from __future__ import annotations

import json
import os
import re

import numpy as np

from .resnet import ResNetConfig

MODEL_FILE = "model.safetensors"
CONFIG_FILE = "config.json"


# ---------------------------------------------------------------------------
# Flat safetensors dict IO
# ---------------------------------------------------------------------------

def _find_model_dir(path: str) -> str:
    """Accept a dir containing model.safetensors, or fall back to a single
    subdirectory that does (testing_suite/utils.py:61-79 fallback)."""
    if os.path.isfile(os.path.join(path, MODEL_FILE)):
        return path
    if os.path.isdir(path):
        for d in sorted(os.listdir(path)):
            sub = os.path.join(path, d)
            if os.path.isfile(os.path.join(sub, MODEL_FILE)):
                return sub
    raise FileNotFoundError(f"no {MODEL_FILE} under {path}")


def load_torch_state(path: str, prefer_native: bool = True
                     ) -> dict[str, np.ndarray]:
    """Load a checkpoint dir (or .safetensors file) to {name: array}.

    Uses the C++ mmap runtime (zero-copy reads) when built, falling back to
    the python safetensors package.  Arrays from the native path are
    copy-on-materialize views detached before the handle closes.
    """
    if os.path.isdir(path):
        path = os.path.join(_find_model_dir(path), MODEL_FILE)
    if prefer_native:
        try:
            from ..runtime import native

            if native.available():
                with native.SafetensorsFile(path) as f:
                    return f.load_all(copy=True)
        except Exception:
            pass  # fall back to the python reader
    from safetensors.numpy import load_file

    return dict(load_file(path))


def save_torch_state(state: dict[str, np.ndarray], out_dir: str,
                     config: dict | None = None) -> str:
    """Write model.safetensors (+ config.json) in HF layout."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    save_file({k: np.asarray(v) for k, v in state.items()},
              os.path.join(out_dir, MODEL_FILE),
              metadata={"format": "pt"})
    if config is not None:
        with open(os.path.join(out_dir, CONFIG_FILE), "w") as f:
            json.dump(config, f, indent=2)
    return out_dir


def load_config(path: str) -> dict:
    path = path if path.endswith(".json") else os.path.join(path, CONFIG_FILE)
    if not os.path.isfile(path):
        sub = _find_model_dir(os.path.dirname(path) or ".")
        path = os.path.join(sub, CONFIG_FILE)
    with open(path) as f:
        return json.load(f)


def conv_weight_names(state: dict[str, np.ndarray]) -> list[str]:
    """The reference's prune scope: every Conv2d .weight — 4-D tensors named
    *.convolution.weight (20 for ResNet-18,
    /root/reference/ResNet/dwt_pruning.py:155-156)."""
    return [k for k, v in state.items()
            if k.endswith("convolution.weight") and v.ndim == 4]


def torch_layer_name(weight_name: str) -> str:
    """HF module name for a .weight entry (log.csv 'Layer Name' column)."""
    return weight_name[: -len(".weight")] if weight_name.endswith(".weight") else weight_name


# ---------------------------------------------------------------------------
# Flax <-> HF name translation
# ---------------------------------------------------------------------------

def _flax_to_hf_name(flat_key: str) -> tuple[str, str]:
    """Map a dotted flax param path to (hf_name, kind).

    kind in {conv, dense_w, dense_b, bn_scale, bn_bias, bn_mean, bn_var}.
    """
    k = flat_key
    k = re.sub(r"^resnet\.embedder\.", "resnet.embedder.embedder.", k)
    k = re.sub(r"stage_(\d+)\.layer_(\d+)\.layer_(\d+)\.",
               r"encoder.stages.\1.layers.\2.layer.\3.", k)
    k = re.sub(r"stage_(\d+)\.layer_(\d+)\.shortcut\.",
               r"encoder.stages.\1.layers.\2.shortcut.", k)
    if k.endswith("convolution.kernel"):
        return k[: -len("kernel")] + "weight", "conv"
    if k == "classifier.kernel":
        return "classifier.1.weight", "dense_w"
    if k == "classifier.bias":
        return "classifier.1.bias", "dense_b"
    if k.endswith("normalization.scale"):
        return k[: -len("scale")] + "weight", "bn_scale"
    if k.endswith("normalization.bias"):
        return k, "bn_bias"
    if k.endswith("normalization.mean"):
        return k[: -len("mean")] + "running_mean", "bn_mean"
    if k.endswith("normalization.var"):
        return k[: -len("var")] + "running_var", "bn_var"
    raise KeyError(f"unmapped flax param {flat_key}")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def flax_to_torch_state(variables: dict) -> dict[str, np.ndarray]:
    """{'params': ..., 'batch_stats': ...} -> HF torch-layout flat dict."""
    flat = {}
    flat.update(_flatten(variables["params"]))
    for k, v in _flatten(variables.get("batch_stats", {})).items():
        flat[k] = v
    out = {}
    for k, v in flat.items():
        hf, kind = _flax_to_hf_name(k)
        a = np.asarray(v)
        if kind == "conv":
            a = np.transpose(a, (3, 2, 0, 1))  # HWIO -> OIHW
        elif kind == "dense_w":
            a = np.transpose(a, (1, 0))  # (in,out) -> (out,in)
        out[hf] = a
        if kind == "bn_mean":
            out[hf.replace("running_mean", "num_batches_tracked")] = (
                np.asarray(0, dtype=np.int64))
    return out


def torch_state_to_flax(state: dict[str, np.ndarray]) -> dict:
    """HF torch-layout flat dict -> {'params': tree, 'batch_stats': tree}."""
    params_flat: dict = {}
    stats_flat: dict = {}
    for hf, a in state.items():
        if hf.endswith("num_batches_tracked"):
            continue
        k = hf
        k = re.sub(r"^resnet\.embedder\.embedder\.", "resnet.embedder.", k)
        k = re.sub(r"encoder\.stages\.(\d+)\.layers\.(\d+)\.layer\.(\d+)\.",
                   r"stage_\1.layer_\2.layer_\3.", k)
        k = re.sub(r"encoder\.stages\.(\d+)\.layers\.(\d+)\.shortcut\.",
                   r"stage_\1.layer_\2.shortcut.", k)
        a = np.asarray(a)
        if k.endswith("convolution.weight"):
            params_flat[k[: -len("weight")] + "kernel"] = np.transpose(
                a, (2, 3, 1, 0))  # OIHW -> HWIO
        elif k == "classifier.1.weight":
            params_flat["classifier.kernel"] = np.transpose(a, (1, 0))
        elif k == "classifier.1.bias":
            params_flat["classifier.bias"] = a
        elif k.endswith("normalization.weight"):
            params_flat[k[: -len("weight")] + "scale"] = a
        elif k.endswith("normalization.bias"):
            params_flat[k] = a
        elif k.endswith("normalization.running_mean"):
            stats_flat[k[: -len("running_mean")] + "mean"] = a
        elif k.endswith("normalization.running_var"):
            stats_flat[k[: -len("running_var")] + "var"] = a
        else:
            raise KeyError(f"unmapped HF param {hf}")
    return {"params": _unflatten(params_flat),
            "batch_stats": _unflatten(stats_flat)}


# ---------------------------------------------------------------------------
# Config + synthetic checkpoints
# ---------------------------------------------------------------------------

def hf_config_dict(cfg: ResNetConfig) -> dict:
    return {
        "architectures": ["ResNetForImageClassification"],
        "model_type": "resnet",
        "num_channels": cfg.num_channels,
        "embedding_size": cfg.embedding_size,
        "hidden_sizes": list(cfg.hidden_sizes),
        "depths": list(cfg.depths),
        "layer_type": cfg.layer_type,
        "downsample_in_first_stage": cfg.downsample_in_first_stage,
        "downsample_in_bottleneck": cfg.downsample_in_bottleneck,
        "hidden_act": "relu",
        "id2label": {str(i): f"LABEL_{i}" for i in range(cfg.num_labels)},
        "label2id": {f"LABEL_{i}": i for i in range(cfg.num_labels)},
    }


def create_random_checkpoint(out_dir: str, config: ResNetConfig | str = "resnet18",
                             seed: int = 0) -> str:
    """Initialize a random flax ResNet and save it as an HF checkpoint dir.

    The offline stand-in for the reference's pretrained __OGPyTorchModel__
    (no network egress in this environment)."""
    import jax

    from .resnet import create_model

    model = create_model(config)
    cfg = model.config
    variables = model.init(jax.random.PRNGKey(seed),
                           np.zeros((1, 224, 224, cfg.num_channels), np.float32))
    state = flax_to_torch_state(
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables["batch_stats"])})
    return save_torch_state(state, out_dir, hf_config_dict(cfg))
