"""Liljencrants-Fant (LF) glottal flow model, Rd-parameterized.

TPU-native reimplementation of the reference's LF routines (reference:
ciglet.h -> lfmodel_from_rd / lfmodel_spectrum / lfmodel_flow).  All
solvers use fixed iteration counts (bisection / Newton under lax.fori_loop)
so they are jit/vmap-safe with static shapes; everything is differentiable
in Rd except through the implicit solves.

Conventions: time is normalized to the period T0 = 1; the model describes
the glottal flow *derivative* U'(t) with U'(te) = -Ee (Ee > 0).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fp import FP


class LFParams(NamedTuple):
    tp: jnp.ndarray   # instant of max flow (normalized to T0=1)
    te: jnp.ndarray   # instant of max excitation (U' = -Ee)
    ta: jnp.ndarray   # return-phase time constant
    alpha: jnp.ndarray  # growth rate of the open-phase sinusoid
    eps: jnp.ndarray    # return-phase decay rate
    e0: jnp.ndarray     # open-phase amplitude scale (for Ee = 1)


def _solve_eps(ta, te, iters: int = 12):
    """Solve eps * ta = 1 - exp(-eps * (1 - te)) by Newton iteration."""
    t2 = 1.0 - te

    def body(_, e):
        f = e * ta - 1.0 + jnp.exp(-e * t2)
        df = ta - t2 * jnp.exp(-e * t2)
        return jnp.clip(e - f / df, 1e-3, 1e7)

    return jax.lax.fori_loop(0, iters, body, 1.0 / ta)


def _flow_balance(alpha, tp, te, ta, eps):
    """Net flow integral of U' over one period with Ee = 1 and E0 tied to
    alpha by the continuity condition U'(te) = -1.

    Written with exp(alpha*te) divided out so large |alpha| (explored by
    the bisection bracket) cannot overflow float32.
    """
    wg = jnp.pi / tp
    s = jnp.sin(wg * te)
    c = jnp.cos(wg * te)
    a1 = -(alpha * s - wg * c + wg * jnp.exp(-alpha * te)) / (
        s * (alpha**2 + wg**2))
    t2 = 1.0 - te
    expet = jnp.exp(-eps * t2)
    a2 = -(1.0 / (eps * ta)) * ((1.0 - expet) / eps - t2 * expet)
    return a1 + a2


def lf_from_rd(rd, iters: int = 60) -> LFParams:
    """Rd -> LF shape parameters via Fant's 1994 regression, then implicit
    solves for eps and alpha (reference: ciglet.h -> lfmodel_from_rd).

    rd may be any shape; all outputs broadcast with it.
    """
    rd = jnp.asarray(rd, FP)
    rd = jnp.clip(rd, 0.05, 6.0)
    rap = (-1.0 + 4.8 * rd) / 100.0
    rkp = (22.4 + 11.8 * rd) / 100.0
    rgp = 0.25 * rkp / ((0.11 * rd / (0.5 + 1.2 * rkp)) - rap)
    tp = 0.5 / rgp
    te = tp * (1.0 + rkp)
    ta = jnp.clip(rap, 1e-4, 1.0 - te - 1e-4)
    te = jnp.clip(te, 1e-3, 0.995)
    tp = jnp.clip(tp, 1e-3, te - 1e-4)
    eps = _solve_eps(ta, te)

    # Bisection for alpha: the net-flow balance is monotone DECREASING in
    # alpha (with U'(te) pinned at -1, larger alpha shrinks the early
    # positive hump).  Bracket sized so exp(-alpha*te) stays finite in
    # float32.
    lo = jnp.full_like(rd, -50.0)
    hi = jnp.full_like(rd, 300.0)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        f = _flow_balance(mid, tp, te, ta, eps)
        gt = f > 0.0   # balance still positive -> root is above mid
        return jnp.where(gt, mid, lo), jnp.where(gt, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    alpha = 0.5 * (lo + hi)
    # e0 is kept in the "per exp(alpha*te)" form implicitly: downstream
    # formulas fold the 1/exp(alpha*te) factor in analytically, so we store
    # only the stable part -1/sin(wg*te) and the exponent separately.
    wg = jnp.pi / tp
    e0 = -1.0 / jnp.sin(wg * te)
    return LFParams(tp=tp, te=te, ta=ta, alpha=alpha, eps=eps, e0=e0)


def lf_spectrum(f_norm, p: LFParams, ee=1.0) -> jnp.ndarray:
    """Analytic Fourier transform of the LF flow derivative at normalized
    frequencies f_norm (cycles per period; harmonic k sits at f_norm = k).
    Reference: ciglet.h -> lfmodel_spectrum.  Broadcasts f_norm against the
    (already broadcast-compatible) LFParams.
    """
    w = 2.0 * jnp.pi * jnp.asarray(f_norm, FP)
    w = jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
    wg = jnp.pi / p.tp
    s = p.alpha - 1j * w
    # E0 = e0 * exp(-alpha*te); folding that factor in analytically turns
    # exp(s*te) into exp(-1j*w*te) (unit modulus -- overflow-free).
    i1 = (p.e0 * ee) * (
        jnp.exp(-1j * w * p.te)
        * (s * jnp.sin(wg * p.te) - wg * jnp.cos(wg * p.te))
        + wg * jnp.exp(-p.alpha * p.te)
    ) / (s**2 + wg**2)
    t2 = 1.0 - p.te
    ejwte = jnp.exp(-1j * w * p.te)
    term1 = (1.0 - jnp.exp(-(p.eps + 1j * w) * t2)) / (p.eps + 1j * w)
    term2 = jnp.exp(-p.eps * t2) * (1.0 - jnp.exp(-1j * w * t2)) / (1j * w)
    i2 = -(ee / (p.eps * p.ta)) * ejwte * (term1 - term2)
    return i1 + i2


def lf_flow_deriv(t_norm, p: LFParams, ee=1.0) -> jnp.ndarray:
    """LF glottal flow derivative sampled at normalized times t_norm in
    [0, 1) (reference: ciglet.h -> lfmodel_flow; we return the derivative,
    which is what excites the vocal tract in PbP synthesis)."""
    t = jnp.asarray(t_norm, FP)
    wg = jnp.pi / p.tp
    # E0*exp(alpha*t) = e0*exp(alpha*(t-te)): t <= te keeps this bounded.
    open_phase = p.e0 * ee * jnp.exp(p.alpha * (t - p.te)) * jnp.sin(wg * t)
    t2 = 1.0 - p.te
    ret = -(ee / (p.eps * p.ta)) * (
        jnp.exp(-p.eps * (t - p.te)) - jnp.exp(-p.eps * t2)
    )
    inside = (t >= 0.0) & (t < 1.0)
    return jnp.where(inside, jnp.where(t <= p.te, open_phase, ret), 0.0)
