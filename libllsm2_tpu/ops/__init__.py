from . import harmonics, interp, lf, spectral, warp, windows  # noqa: F401
