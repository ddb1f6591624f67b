"""Interpolation primitives (reference: ciglet.h -> interp1 / sincresample /
rresample).  All routines are shape-static and jit/vmap-safe."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interp1(xp: jnp.ndarray, fp: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolation with edge clamping.

    Equivalent to the reference's interp1 (ciglet.h) for monotonically
    increasing xp.  Works on the last axis; broadcastable via vmap.
    """
    return jnp.interp(x, xp, fp)


def interp1_uniform(fp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of fp sampled on the uniform grid 0..len-1 at
    (traced, fractional) positions `pos`, clamped at the edges.

    This is the hot-path variant: no searchsorted, just gather + lerp.
    """
    n = fp.shape[-1]
    pos = jnp.clip(pos, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    frac = pos - i0
    f0 = jnp.take(fp, i0, axis=-1)
    f1 = jnp.take(fp, i0 + 1, axis=-1)
    return f0 + (f1 - f0) * frac


def catmull_rom_uniform(fp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Cubic Catmull-Rom interpolation on a uniform grid (smoother resampling
    for envelopes; higher-quality analog of ciglet's sincresample for the
    smooth spectral curves we resample)."""
    n = fp.shape[-1]
    pos = jnp.clip(pos, 0.0, n - 1.0)
    i1 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    t = pos - i1
    i0 = jnp.clip(i1 - 1, 0, n - 1)
    i2 = jnp.clip(i1 + 1, 0, n - 1)
    i3 = jnp.clip(i1 + 2, 0, n - 1)
    p0 = jnp.take(fp, i0, axis=-1)
    p1 = jnp.take(fp, i1, axis=-1)
    p2 = jnp.take(fp, i2, axis=-1)
    p3 = jnp.take(fp, i3, axis=-1)
    a = 2.0 * p1
    b = p2 - p0
    c = 2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3
    d = -p0 + 3.0 * p1 - 3.0 * p2 + p3
    return 0.5 * (a + b * t + c * t * t + d * t * t * t)


def fetch_frame(x: jnp.ndarray, center: jnp.ndarray, halfwidth: int) -> jnp.ndarray:
    """Gather x[center-halfwidth : center+halfwidth+1] with zero padding
    outside the signal (reference: ciglet.h -> fetch_frame).

    `center` is a traced integer scalar; the output length 2*halfwidth+1 is
    static.  Implemented as a dynamic_slice into a zero-padded copy to stay
    gather-free (dynamic_slice lowers better on TPU than arbitrary gathers).
    """
    xp = jnp.pad(x, (halfwidth, halfwidth + 1))
    return jax.lax.dynamic_slice(xp, (center,), (2 * halfwidth + 1,))


def fetch_frames(x: jnp.ndarray, centers: jnp.ndarray, halfwidth: int) -> jnp.ndarray:
    """Batched fetch_frame: returns [len(centers), 2*halfwidth+1]."""
    xp = jnp.pad(x, (halfwidth, halfwidth + 1))
    idx = centers[:, None] + jnp.arange(2 * halfwidth + 1)[None, :]
    return xp[idx]
