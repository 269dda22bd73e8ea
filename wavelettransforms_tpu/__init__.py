"""wavelettransforms_tpu — a TPU-native wavelet compression / pruning
framework (JAX / XLA / Pallas / pjit).

Capabilities mirror the reference repo iAmGiG/WaveletTransforms (multi-level
2-D DWT weight pruning with min-weight and random baselines on HF ResNet,
plus its evaluation suite), redesigned TPU-first:

  * ``wavelets``  — self-contained filter-bank registry (no pywt dependency)
  * ``ops``       — NumPy oracle engine, jittable JAX engine, Pallas TPU
                    filter-bank kernels, numpy-parity thresholding
  * ``prune``     — selective DWT / min-weight / random pruning over
                    parameter pytrees with gang-encoded jitted sweeps
  * ``models``    — flax ResNet family + HF safetensors checkpoint IO
  * ``parallel``  — device meshes, halo-exchange sharded DWT, exact
                    distributed percentiles
  * ``train``     — prune-aware (sparsity-preserving) fine-tuning on meshes
  * ``eval``      — metric engine + concurrent model evaluation harness
  * ``data``      — ImageNet flat-dir pipeline + offline batch prep
  * ``cli``       — prune / evaluate / sweep / bench entry points
  * ``codec``     — encoded-coefficient artifact format (.wtc containers,
                    f32/bf16/int8 coefficients, sparse or dense storage)
"""

__version__ = "0.1.0"

from . import wavelets  # noqa: F401  (lightweight; heavier modules lazy)

__all__ = ["wavelets", "__version__"]
