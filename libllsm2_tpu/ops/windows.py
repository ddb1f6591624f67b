"""Parametric window functions evaluated at arbitrary (continuous) positions.

TPU-native replacement for the reference's fixed-length window tables
(reference: ciglet.h -> hanning/hamming/blackman_harris/nuttall98/mltsine).
Because the analysis windows are pitch-synchronous (length proportional to
1/F0, generally non-integral in samples), we evaluate each window as a
continuous cosine series w(u), u in [0, 1], at the exact normalized sample
positions instead of materializing per-length tables.  This keeps every
shape static under jit while preserving the exact-period-zero property of
the cosine windows (adjacent-harmonic leakage nulls).
"""
from __future__ import annotations

import jax.numpy as jnp

# Cosine-series coefficients: w(u) = sum_m a[m] * cos(2 pi m u).
COSINE_SERIES = {
    "hanning": (0.5, -0.5),
    "hamming": (0.54, -0.46),
    "blackman": (0.42, -0.5, 0.08),
    "blackman_harris": (0.35875, -0.48829, 0.14128, -0.01168),
    "nuttall98": (0.3635819, -0.4891775, 0.1365995, -0.0106411),
}


def window_eval(name: str, u: jnp.ndarray) -> jnp.ndarray:
    """Evaluate window `name` at normalized positions u in [0, 1].

    Positions outside [0, 1] evaluate to 0 (the window has compact support),
    which implements pitch-synchronous masking for free.
    """
    inside = (u >= 0.0) & (u <= 1.0)
    if name == "mltsine":
        w = jnp.sin(jnp.pi * u)
    else:
        coefs = COSINE_SERIES[name]
        w = jnp.zeros_like(u)
        for m, a in enumerate(coefs):
            w = w + a * jnp.cos(2.0 * jnp.pi * m * u)
    return jnp.where(inside, w, 0.0)


def window_centered(name: str, n: jnp.ndarray, halfwidth) -> jnp.ndarray:
    """Window centered at 0 with support [-halfwidth, +halfwidth].

    `n` are (integer) sample offsets from the window center; `halfwidth`
    may be a traced scalar (pitch-synchronous, non-integral).
    """
    u = (n / halfwidth + 1.0) * 0.5
    return window_eval(name, u)
