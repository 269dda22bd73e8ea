"""Encoded-coefficient artifact format (.wtc) tests."""
import numpy as np
import pytest

from wavelettransforms_tpu import codec


def test_psnr_basics():
    x = np.ones((8, 8), np.float32)
    assert codec.psnr(x, x) == float("inf")
    noisy = x + 0.1
    assert 0 < codec.psnr(x, noisy) < 100


@pytest.mark.parametrize("wavelet", ["haar", "db2", "bior4.4"])
def test_lossless_roundtrip_f32(rng, wavelet):
    w = rng.standard_normal((6, 5, 16, 16)).astype(np.float32)
    entry = codec.encode_tensor(w, wavelet, level=2)
    rec = codec.decode_tensor(entry)
    np.testing.assert_allclose(rec, w, rtol=0, atol=2e-6)


def test_raw_bypass_1d(rng):
    b = rng.standard_normal((37,)).astype(np.float32)
    entry = codec.encode_tensor(b, "haar", level=3)
    assert entry.meta["kind"] == "raw"
    np.testing.assert_array_equal(codec.decode_tensor(entry), b)


def test_threshold_matches_prune_path(rng):
    """Encoding with a percentile then decoding must equal dwt_prune_tensor."""
    from wavelettransforms_tpu.prune.dwt_prune import dwt_prune_tensor

    w = rng.standard_normal((8, 4, 16, 16)).astype(np.float32)
    entry = codec.encode_tensor(w, "db2", level=2, percentile=50.0)
    rec = codec.decode_tensor(entry)
    expected, _ = dwt_prune_tensor(w, "db2", 2, 50.0)
    np.testing.assert_allclose(rec, np.asarray(expected), rtol=0, atol=1e-6)


def test_sparse_storage_smaller_after_threshold(rng):
    w = rng.standard_normal((16, 16, 8, 8)).astype(np.float32)
    dense = codec.encode_tensor(w, "haar", 1, percentile=90.0,
                                storage="dense")
    auto = codec.encode_tensor(w, "haar", 1, percentile=90.0, storage="auto")
    assert auto.meta["storage"] == "sparse"
    assert auto.nbytes < dense.nbytes
    np.testing.assert_allclose(codec.decode_tensor(auto),
                               codec.decode_tensor(dense), atol=0)


def test_bf16_and_int8_quantization(rng):
    w = rng.standard_normal((4, 4, 32, 32)).astype(np.float32)
    rec_bf16 = codec.decode_tensor(
        codec.encode_tensor(w, "bior2.2", 2, coeff_dtype="bfloat16"))
    rec_int8 = codec.decode_tensor(
        codec.encode_tensor(w, "bior2.2", 2, coeff_dtype="int8"))
    assert codec.psnr(w, rec_bf16) > 40.0
    assert codec.psnr(w, rec_int8) > 25.0
    # zeros survive quantization exactly
    entry = codec.encode_tensor(w, "haar", 1, percentile=80.0,
                                coeff_dtype="int8", storage="dense")
    stored = entry.arrays["v"]
    assert (stored == 0).mean() >= 0.79


def test_level_clamp_and_odd_shapes(rng):
    w = rng.standard_normal((3, 3, 3, 3)).astype(np.float32)  # 3x3 kernels
    entry = codec.encode_tensor(w, "bior4.4", level=5)
    assert entry.meta["level"] == 0  # dec_len 10 clamps to 0 on 3x3
    np.testing.assert_allclose(codec.decode_tensor(entry), w, atol=1e-6)
    odd = rng.standard_normal((5, 9, 7)).astype(np.float32)
    e2 = codec.encode_tensor(odd, "db2", level=2)
    np.testing.assert_allclose(codec.decode_tensor(e2), odd, atol=2e-6)


def test_checkpoint_container_roundtrip(tmp_path, rng):
    params = {
        "stem/conv/kernel": rng.standard_normal((7, 7, 3, 16)).astype(np.float32),
        "block1/conv/kernel": rng.standard_normal((3, 3, 16, 16)).astype(np.float32),
        "head/dense/bias": rng.standard_normal((10,)).astype(np.float32),
    }
    path = str(tmp_path / "ckpt.wtc")
    report = codec.encode_checkpoint(params, path, "haar", 2, verify=True)
    assert set(report.tensors) == set(params)
    assert all(np.isinf(m["psnr_db"]) or m["psnr_db"] > 100
               for m in report.tensors.values())
    header = codec.read_header(path)
    assert header["format"] == "wtc" and header["wavelet"] == "haar"
    decoded = codec.decode_checkpoint(path)
    for k, v in params.items():
        np.testing.assert_allclose(decoded[k], v, rtol=0, atol=2e-6)


def test_checkpoint_compression_wins_when_thresholded(tmp_path, rng):
    params = {"w": rng.standard_normal((32, 32, 16, 16)).astype(np.float32)}
    path = str(tmp_path / "c.wtc")
    report = codec.encode_checkpoint(params, path, "bior4.4", 3,
                                     percentile=90.0, coeff_dtype="bfloat16",
                                     verify=True)
    assert report.ratio > 2.5
    assert report.tensors["w"]["psnr_db"] > 10.0
    decoded = codec.decode_checkpoint(path)
    assert decoded["w"].shape == params["w"].shape


def test_native_reader_interop(tmp_path, rng):
    """The C++ mmap reader must open .wtc containers (it skips metadata)."""
    from wavelettransforms_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    params = {"w": rng.standard_normal((4, 4, 8, 8)).astype(np.float32)}
    path = str(tmp_path / "c.wtc")
    codec.encode_checkpoint(params, path, "haar", 1)
    with native.SafetensorsFile(path) as f:
        assert "w::v" in f.names()
        assert f.tensor("w::v").dtype == np.float32


def test_codec_cli_roundtrip(tmp_path, rng):
    """encode -> decode through the CLI entry point."""
    import json
    import subprocess
    import sys

    from wavelettransforms_tpu.models.hf_io import save_torch_state

    src = tmp_path / "ckpt"
    params = {
        "conv1.weight": rng.standard_normal((8, 3, 3, 3)).astype(np.float32),
        "fc.bias": rng.standard_normal((10,)).astype(np.float32),
    }
    save_torch_state(params, str(src), config={"architectures": ["X"]})
    wtc = tmp_path / "ckpt.wtc"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    out = subprocess.run(
        [sys.executable, "-m", "wavelettransforms_tpu.cli.codec",
         "--mode=encode", f"--model_path={src}", f"--output={wtc}",
         "--wavelet=haar", "--level=1", "--verify"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["tensors"] == 2

    dec = tmp_path / "decoded"
    out = subprocess.run(
        [sys.executable, "-m", "wavelettransforms_tpu.cli.codec",
         "--mode=decode", f"--model_path={wtc}", f"--output={dec}"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    from wavelettransforms_tpu.models.hf_io import load_torch_state

    back = load_torch_state(str(dec))
    for k, v in params.items():
        np.testing.assert_allclose(back[k], v, rtol=0, atol=2e-6)
