from . import (f0, filters, harmonics, interp, lf, pallas_osc,  # noqa: F401
               resample, spectral, stft, warp, windows)
