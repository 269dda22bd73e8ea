"""C++ native runtime (csrc/) tests: safetensors interop both directions."""
import os

import numpy as np
import pytest

from wavelettransforms_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


@pytest.fixture
def sample(tmp_path, rng):
    data = {
        "x": rng.standard_normal((2, 3, 4)).astype(np.float32),
        "y.weight": rng.standard_normal(5),
        "scalar": np.array(7, dtype=np.int64),
        "u8": np.arange(6, dtype=np.uint8).reshape(2, 3),
    }
    path = str(tmp_path / "m.safetensors")
    from safetensors.numpy import save_file

    save_file(data, path, metadata={"format": "pt"})
    return path, data


def test_native_read_matches(sample):
    path, data = sample
    with native.SafetensorsFile(path) as f:
        assert sorted(f.names()) == sorted(data)
        for k, v in data.items():
            got = f.tensor(k)
            assert got.dtype == v.dtype and got.shape == v.shape
            np.testing.assert_array_equal(got, v)
            assert not got.flags.writeable  # zero-copy view is read-only


def test_native_write_python_read(tmp_path, rng):
    data = {"a": rng.standard_normal((8, 8)).astype(np.float32),
            "b": np.arange(10, dtype=np.int32)}
    path = str(tmp_path / "w.safetensors")
    native.write_safetensors(path, data)
    from safetensors.numpy import load_file

    back = load_file(path)
    for k, v in data.items():
        np.testing.assert_array_equal(back[k], v)


def test_native_roundtrip(tmp_path, rng):
    data = {"k": rng.standard_normal((4, 4))}
    path = str(tmp_path / "r.safetensors")
    native.write_safetensors(path, data)
    with native.SafetensorsFile(path) as f:
        np.testing.assert_array_equal(f.tensor("k"), data["k"])


def test_errors(tmp_path, sample):
    with pytest.raises(OSError):
        native.SafetensorsFile(str(tmp_path / "missing.safetensors"))
    path, _ = sample
    with native.SafetensorsFile(path) as f:
        with pytest.raises(KeyError):
            f.tensor("definitely-not-there")


def test_hf_io_uses_native(tmp_path, rng):
    # load_torch_state prefers the native reader and must agree with python
    from safetensors.numpy import save_file

    from wavelettransforms_tpu.models import load_torch_state

    data = {"w.convolution.weight": rng.standard_normal(
        (4, 3, 3, 3)).astype(np.float32)}
    d = tmp_path / "ck"
    d.mkdir()
    save_file(data, str(d / "model.safetensors"), metadata={"format": "pt"})
    got = load_torch_state(str(d))
    np.testing.assert_array_equal(got["w.convolution.weight"],
                                  data["w.convolution.weight"])
    got["w.convolution.weight"][0, 0, 0, 0] = 99  # detached: writable copy
