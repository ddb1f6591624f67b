from . import (f0, filters, harmonics, interp, lf, pallas_osc,  # noqa: F401
               spectral, stft, warp, windows)
