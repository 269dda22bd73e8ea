"""Encoded-coefficient artifact format (.wtc) — wavelet-compressed checkpoints.

The reference only ever stores *reconstructed* near-sparse weights
(/root/reference/ResNet/utils.py:28-38, HF ``save_pretrained``); the
coefficient domain is discarded after thresholding
(/root/reference/ResNet/dwt_pruning.py:75-77).  This module keeps it: a
checkpoint is stored AS its thresholded DWT coefficients (subband mosaic +
sparse index set + metadata mirroring the reference's CSV schema), so the
artifact is both smaller on disk and decodable back to weights on any host.

Container: one safetensors file (interops with the C++ mmap reader in
``runtime/native.py`` and the HF ecosystem) holding per-tensor entries

    <name>::v   coefficient values (dense mosaic, or the nonzeros)
    <name>::i   flat indices into the mosaic (sparse storage only; int32,
                widened to int64 for mosaics of >= 2^31 elements)

plus a single JSON document under the safetensors ``__metadata__`` header
describing, per tensor: original shape/dtype, wavelet, clamped level, mode,
coefficient dtype (float32 / bfloat16 / int8+scale), storage kind, threshold.

Coefficient dtypes:
  * ``float32``  — lossless container (bit-exact round trip through the
    periodization filter bank, validated in tests);
  * ``bfloat16`` — 2x smaller, ~3 decimal digits;
  * ``int8``     — 4x smaller, symmetric per-tensor scale (max|c|/127).

Storage kinds: ``dense`` (whole mosaic), ``sparse`` (values + indices),
``auto`` (whichever is smaller in bytes), ``raw`` (<2-D tensors bypass the
transform — reference semantics /root/reference/ResNet/dwt_pruning.py:58-62).
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np

from .ops import dwt_jax as dj
from .ops import threshold as th
from .prune.dwt_prune import clamped_level

FORMAT_VERSION = 1

_COEFF_DTYPES = ("float32", "bfloat16", "int8")


def psnr(original, reconstructed, peak: float | None = None) -> float:
    """Peak signal-to-noise ratio in dB; peak defaults to max|original|."""
    original = np.asarray(original, np.float64)
    reconstructed = np.asarray(reconstructed, np.float64)
    mse = float(np.mean((original - reconstructed) ** 2))
    if mse == 0.0:
        return float("inf")
    if peak is None:
        peak = float(np.max(np.abs(original)))
        if peak == 0.0:
            peak = 1.0
    return 10.0 * np.log10(peak * peak / mse)


# ---------------------------------------------------------------------------
# coefficient quantization
# ---------------------------------------------------------------------------

def _quantize(mosaic: np.ndarray, coeff_dtype: str):
    """f32 mosaic -> (stored array, scale).  Zeros stay exactly zero."""
    if coeff_dtype == "float32":
        return mosaic.astype(np.float32), None
    if coeff_dtype == "bfloat16":
        import ml_dtypes

        return mosaic.astype(ml_dtypes.bfloat16).view(np.uint16), None
    if coeff_dtype == "int8":
        amax = float(np.max(np.abs(mosaic))) if mosaic.size else 0.0
        scale = amax / 127.0 if amax > 0 else 1.0
        q = np.clip(np.rint(mosaic / scale), -127, 127).astype(np.int8)
        return q, scale
    raise ValueError(f"coeff_dtype must be one of {_COEFF_DTYPES}")


def _dequantize(stored: np.ndarray, coeff_dtype: str, scale) -> np.ndarray:
    if coeff_dtype == "float32":
        return stored.astype(np.float32)
    if coeff_dtype == "bfloat16":
        import ml_dtypes

        return stored.view(ml_dtypes.bfloat16).astype(np.float32)
    if coeff_dtype == "int8":
        return stored.astype(np.float32) * np.float32(scale)
    raise ValueError(coeff_dtype)


# ---------------------------------------------------------------------------
# per-tensor encode / decode
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EncodedTensor:
    """One tensor's artifact entry: raw arrays + JSON-serializable meta."""
    arrays: dict  # suffix ('v', 'i') -> np.ndarray
    meta: dict

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in self.arrays.values())


def encode_tensor(w, wavelet: str = "bior4.4", level: int = 5,
                  percentile: float | None = None,
                  threshold: float | None = None,
                  mode: str = "periodization",
                  coeff_dtype: str = "float32",
                  storage: str = "auto") -> EncodedTensor:
    """Encode one tensor into the coefficient domain.

    ``percentile`` in [0, 100] applies the reference's global-percentile
    threshold over the packed mosaic (/root/reference/ResNet/dwt_pruning.py:67-73);
    ``threshold`` applies the legacy absolute threshold
    (/root/reference/ResNet/dwt_pruning_NoEntropy.py:45).  Neither -> lossless.
    """
    if storage not in ("auto", "dense", "sparse"):
        raise ValueError("storage must be auto|dense|sparse")
    w = np.asarray(w)
    orig_dtype = w.dtype
    meta = {
        "shape": list(w.shape), "dtype": str(orig_dtype),
        "coeff_dtype": coeff_dtype, "mode": mode,
    }
    if w.ndim < 2:
        mosaic = w.astype(np.float32)
        meta.update(kind="raw", wavelet=None, level=0)
    else:
        lvl = clamped_level(w.shape, wavelet, level)
        mosaic = np.asarray(
            dj.wavedec2_packed(w.astype(np.float32), wavelet, lvl, mode))
        meta.update(kind="dwt2", wavelet=wavelet, level=lvl)

    thr_value = None
    if percentile is not None:
        mosaic_j, tv = th.percentile_threshold(mosaic, float(percentile))
        mosaic = np.asarray(mosaic_j)
        thr_value = float(tv)
        meta["percentile"] = float(percentile)
    elif threshold is not None:
        mosaic = np.asarray(th.hard_threshold(mosaic, float(threshold)))
        thr_value = float(threshold)
    meta["threshold_value"] = thr_value

    stored, scale = _quantize(mosaic, coeff_dtype)
    meta["scale"] = scale
    meta["mosaic_shape"] = list(mosaic.shape)

    flat = stored.ravel()
    nz = np.flatnonzero(flat)
    # int32 indices only fit mosaics below 2^31 elements; larger tensors
    # store 8-byte indices instead of silently wrapping on decode.
    idx_dtype = np.int32 if flat.size <= np.iinfo(np.int32).max else np.int64
    sparse_bytes = nz.size * (np.dtype(idx_dtype).itemsize + stored.itemsize)
    dense_bytes = stored.nbytes
    use_sparse = (storage == "sparse"
                  or (storage == "auto" and sparse_bytes < dense_bytes))
    meta["nnz"] = int(nz.size)
    if use_sparse:
        meta["storage"] = "sparse"
        arrays = {"v": np.ascontiguousarray(flat[nz]),
                  "i": nz.astype(idx_dtype)}
    else:
        meta["storage"] = "dense"
        arrays = {"v": stored}
    return EncodedTensor(arrays=arrays, meta=meta)


def decode_tensor(entry: EncodedTensor) -> np.ndarray:
    meta = entry.meta
    mosaic_shape = tuple(meta["mosaic_shape"])
    if meta["storage"] == "sparse":
        vals = entry.arrays["v"]
        flat = np.zeros(int(np.prod(mosaic_shape)), dtype=vals.dtype)
        flat[entry.arrays["i"]] = vals
        stored = flat.reshape(mosaic_shape)
    else:
        stored = entry.arrays["v"].reshape(mosaic_shape)
    mosaic = _dequantize(stored, meta["coeff_dtype"], meta.get("scale"))

    shape = tuple(meta["shape"])
    if meta["kind"] == "raw":
        out = mosaic.reshape(shape)
    else:
        h, w_ = shape[-2], shape[-1]
        rec = np.asarray(dj.waverec2_packed(
            mosaic, meta["wavelet"], meta["level"], h, w_, meta["mode"]))
        out = rec.reshape(shape)
    return out.astype(np.dtype(meta["dtype"]))


# ---------------------------------------------------------------------------
# checkpoint-level container
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CompressionReport:
    raw_bytes: int
    encoded_bytes: int
    tensors: dict  # name -> per-tensor meta (+ optional psnr_db)

    @property
    def ratio(self) -> float:
        return self.raw_bytes / max(self.encoded_bytes, 1)

    def summary(self) -> str:
        return (f"{len(self.tensors)} tensors: {self.raw_bytes/1e6:.2f} MB -> "
                f"{self.encoded_bytes/1e6:.2f} MB ({self.ratio:.2f}x)")


def encode_checkpoint(params: dict, path: str, wavelet: str = "bior4.4",
                      level: int = 5, percentile: float | None = None,
                      threshold: float | None = None,
                      mode: str = "periodization",
                      coeff_dtype: str = "float32", storage: str = "auto",
                      verify: bool = False) -> CompressionReport:
    """Encode a whole params dict into one .wtc safetensors container.

    ``verify=True`` decodes every tensor back and records per-tensor PSNR
    (inf for the lossless f32 path).
    """
    from safetensors.numpy import save_file

    tensors_out: dict[str, np.ndarray] = {}
    metas: dict[str, dict] = {}
    raw_bytes = 0
    enc_bytes = 0
    for name, w in params.items():
        w = np.asarray(w)
        raw_bytes += w.nbytes
        entry = encode_tensor(w, wavelet, level, percentile, threshold,
                              mode, coeff_dtype, storage)
        enc_bytes += entry.nbytes
        if verify:
            rec = decode_tensor(entry)
            entry.meta["psnr_db"] = psnr(w, rec)
        for suffix, arr in entry.arrays.items():
            tensors_out[f"{name}::{suffix}"] = arr
        metas[name] = entry.meta

    header = {
        "format": "wtc", "version": FORMAT_VERSION,
        "wavelet": wavelet, "level": level, "mode": mode,
        "percentile": percentile, "threshold": threshold,
        "coeff_dtype": coeff_dtype, "tensors": metas,
    }
    save_file(tensors_out, path, metadata={"wtc": json.dumps(header)})
    return CompressionReport(raw_bytes=raw_bytes, encoded_bytes=enc_bytes,
                             tensors=metas)


def read_header(path: str) -> dict:
    from safetensors import safe_open

    with safe_open(path, framework="np") as f:
        md = f.metadata() or {}
    if "wtc" not in md:
        raise ValueError(f"{path} is not a .wtc coefficient artifact")
    return json.loads(md["wtc"])


def decode_checkpoint(path: str) -> dict:
    """Decode a .wtc artifact back into a params dict."""
    from safetensors import safe_open

    header = read_header(path)
    params = {}
    with safe_open(path, framework="np") as f:
        for name, meta in header["tensors"].items():
            arrays = {"v": f.get_tensor(f"{name}::v")}
            if meta["storage"] == "sparse":
                arrays["i"] = f.get_tensor(f"{name}::i")
            params[name] = decode_tensor(
                EncodedTensor(arrays=arrays, meta=meta))
    return params
