from .registry import (
    REFERENCE_WAVELETS,
    Wavelet,
    dwt_max_level,
    get_wavelet,
    wavelist,
)

__all__ = [
    "REFERENCE_WAVELETS",
    "Wavelet",
    "dwt_max_level",
    "get_wavelet",
    "wavelist",
]
