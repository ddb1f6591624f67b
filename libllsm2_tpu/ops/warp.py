"""Frequency-axis warping for the noise PSD (reference: dsputils.c ->
llsm_warp_frequency and its inverse).  The warped axis compresses high
frequencies logarithmically, spending more PSD bins where hearing is more
sensitive; `noswarp` is the warping constant carried in the chunk conf."""
from __future__ import annotations

import jax.numpy as jnp

from ..fp import FP


def warp_frequency(f, warp_const):
    """Linear frequency [Hz] -> warped coordinate."""
    return warp_const * jnp.log1p(f / warp_const)


def unwarp_frequency(fw, warp_const):
    """Warped coordinate -> linear frequency [Hz] (exact inverse)."""
    return warp_const * jnp.expm1(fw / warp_const)


def warped_bin_centers(npsd: int, fnyq: float, warp_const: float):
    """Linear-frequency centers [Hz] of npsd bins uniform on the warped axis
    spanning [0, fnyq]."""
    wmax = warp_frequency(fnyq, warp_const)
    wc = (jnp.arange(npsd) + 0.5) * (wmax / npsd)
    return unwarp_frequency(wc, warp_const)


def warped_band_matrix(npsd: int, nbin: int, fs: float, warp_const: float):
    """[npsd, nbin] row-normalized averaging matrix taking a linear-axis
    half-spectrum (nbin rfft bins, 0..fs/2) to npsd warped-axis band means.

    Static given the conf, so it folds into a single matmul on the MXU.
    Every linear bin contributes to exactly one warped band; rows are
    normalized to average (not sum) so the PSD level is preserved.
    """
    f = jnp.arange(nbin) * (fs / 2.0) / (nbin - 1)
    wmax = warp_frequency(fs / 2.0, warp_const)
    band = jnp.floor(warp_frequency(f, warp_const) / wmax * npsd)
    band = jnp.clip(band, 0, npsd - 1).astype(jnp.int32)
    onehot = (band[None, :] == jnp.arange(npsd)[:, None]).astype(FP)
    counts = jnp.maximum(onehot.sum(axis=1, keepdims=True), 1.0)
    return onehot / counts


def unwarp_interp_positions(nbin: int, npsd: int, fs: float, warp_const: float):
    """Fractional positions into the npsd warped-bin array for each of nbin
    linear rfft bins (for synthesis-side PSD unwarping via interp)."""
    f = jnp.arange(nbin) * (fs / 2.0) / (nbin - 1)
    wmax = warp_frequency(fs / 2.0, warp_const)
    return jnp.clip(warp_frequency(f, warp_const) / wmax * npsd - 0.5, 0.0, npsd - 1.0)
