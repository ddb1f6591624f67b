"""Pallas kernel equivalence tests: the fused kernels must match the jnp
reference implementations bit-closely (SURVEY.md section 7 design rule 3:
"Pallas behind a flag with equality tests").  On CPU the kernels run in
interpreter mode, exercising the same code path the TPU compiles."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import layer0
from libllsm2_tpu.ops import harmonics, pallas_osc
from libllsm2_tpu.utils import testsig


def test_osc_bank_matches_jnp():
    rng = np.random.default_rng(0)
    N, K, T = 13, 24, 160
    dc = jnp.asarray(rng.uniform(-0.5, 0.5, (N, T)), jnp.float32)
    ampl = jnp.asarray(rng.uniform(0, 1, (N, K)), jnp.float32)
    phse = jnp.asarray(rng.uniform(-3, 3, (N, K)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (N, K)), jnp.float32)

    got = np.asarray(pallas_osc.osc_bank_pallas(dc, ampl, phse, mask))
    kh = np.arange(1, K + 1, dtype=np.float32)
    ph = kh[None, :, None] * np.asarray(dc)[:, None, :]
    ph -= np.round(ph)
    ref = np.einsum("nkt,nk->nt",
                    np.cos(2 * np.pi * ph + np.asarray(phse)[:, :, None]),
                    np.asarray(ampl * mask))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_harmonic_project_matches_jnp():
    rng = np.random.default_rng(1)
    N, W, K = 9, 321, 16
    dc = jnp.asarray(rng.uniform(-2, 2, (N, W)), jnp.float32)
    xw = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    re, im = pallas_osc.harmonic_project_pallas(dc, xw, K)
    kh = np.arange(1, K + 1, dtype=np.float32)
    ph = kh[None, :, None] * np.asarray(dc)[:, None, :]
    ph -= np.round(ph)
    ref_re = np.einsum("nkw,nw->nk", np.cos(2 * np.pi * ph), np.asarray(xw))
    ref_im = np.einsum("nkw,nw->nk", -np.sin(2 * np.pi * ph), np.asarray(xw))
    np.testing.assert_allclose(np.asarray(re), ref_re, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref_im, atol=2e-3)


def test_harmonic_project_mxu_matches_rotation():
    """The MXU-matmul projection (frame-independent modulated signal +
    banded matmul + host-side phase rotation) must match the rotation
    kernel through harmonic_analysis for every conf shape: default
    (hh=10), small-window (hh=5), N smaller than one frame block, and
    unvoiced frames with and without the DC row."""
    for dur, floor, tail, with_dc in ((0.6, 40.0, 0.0, True),
                                      (0.6, 90.0, 0.3, False),
                                      (0.12, 40.0, 0.0, True)):
        x, f0 = testsig.make_test_utterance(duration=dur, seed=8,
                                            noise_level=0.03,
                                            unvoiced_tail_frac=tail)
        opt = create_aoptions(f0_floor=floor)
        conf = opt.conf
        nhop, nfrm = conf.nhop, len(f0)
        nx = nfrm * nhop
        xj = jnp.asarray(x[:nx], jnp.float32)
        f0j = jnp.asarray(f0, jnp.float32)
        centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop
        cyc = harmonics.sample_cycles(f0j, nhop, conf.fs, nx)
        kw = dict(fs=conf.fs, max_k=conf.maxnhar,
                  halfwin_max=conf.halfwin_max,
                  rel_winsize=conf.rel_winsize, fnyq=conf.fnyq,
                  nhop=nhop, use_pallas=True, with_dc=with_dc)
        out_r = harmonics.harmonic_analysis(xj, f0j, centers, cyc,
                                            mxu=False, **kw)
        out_m = harmonics.harmonic_analysis(xj, f0j, centers, cyc,
                                            mxu=True, **kw)
        scale = float(np.abs(np.asarray(out_r[0])).max())
        np.testing.assert_allclose(np.asarray(out_m[0]),
                                   np.asarray(out_r[0]),
                                   atol=2e-3 * scale)
        # wrapping-safe phase comparison on the complex vectors
        z_r = np.asarray(out_r[0]) * np.exp(1j * np.asarray(out_r[1]))
        z_m = np.asarray(out_m[0]) * np.exp(1j * np.asarray(out_m[1]))
        np.testing.assert_allclose(z_m, z_r, atol=3e-3 * scale)
        np.testing.assert_allclose(np.asarray(out_m[2]),
                                   np.asarray(out_r[2]))
        if with_dc:
            np.testing.assert_allclose(np.asarray(out_m[3]),
                                       np.asarray(out_r[3]), atol=1e-6)


def test_full_pipeline_pallas_flag():
    """analyze+synthesize with use_pallas=True matches the jnp path.

    f0_refine is disabled for the strict amplitude equality: the Pallas
    path measures the fundamental on a lowpass-decimated grid (same
    estimator, slightly different numerics -- see refine test below)."""
    x, f0 = testsig.make_test_utterance(duration=0.4)
    opt_ref = dataclasses.replace(create_aoptions(), f0_refine=False)
    opt_pl = dataclasses.replace(opt_ref, use_pallas=True)
    ch_ref = layer0.analyze(opt_ref, x, f0)
    ch_pl = layer0.analyze(opt_pl, x, f0)
    np.testing.assert_allclose(np.asarray(ch_pl.ampl),
                               np.asarray(ch_ref.ampl), atol=1e-3)
    sopt_ref = create_soptions()
    sopt_pl = dataclasses.replace(sopt_ref, use_pallas=True)
    y_ref = np.asarray(layer0.synthesize(sopt_ref, ch_ref).y_sin)
    y_pl = np.asarray(layer0.synthesize(sopt_pl, ch_ref).y_sin)
    np.testing.assert_allclose(y_pl, y_ref, atol=1e-3)


def test_harmonic_project_win_fused_matches_unfused():
    """The fused-window kernel (window evaluated in-kernel) must match
    window_centered + harmonic_project_pallas + explicit wsum."""
    from libllsm2_tpu.ops import windows

    rng = np.random.default_rng(7)
    N, W, K = 70, 300, 24
    C = W // 2
    dc = jnp.asarray(rng.uniform(-2, 2, (N, W)), jnp.float32)
    fr = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    hw = jnp.asarray(rng.uniform(2.0, C, N), jnp.float32)
    hw_int = jnp.ceil(hw).astype(jnp.int32)
    lo, hi = C - hw_int, C + hw_int + 1
    noff = jnp.arange(W, dtype=jnp.float32)[None, :] - C
    for win in ("hanning", "blackman_harris"):
        w = windows.window_centered(win, noff, hw[:, None])
        re_r, im_r = pallas_osc.harmonic_project_pallas(
            dc, fr * w, K, lo=lo, hi=hi)
        ws_r = jnp.sum(w, axis=-1)
        re_f, im_f, ws_f, xs_f = pallas_osc.harmonic_project_win_pallas(
            dc, fr, hw, K, lo=lo, hi=hi, center=C, window=win)
        np.testing.assert_allclose(np.asarray(re_f), np.asarray(re_r),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(im_f), np.asarray(im_r),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(ws_f), np.asarray(ws_r),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(xs_f),
                                   np.asarray(jnp.sum(fr * w, axis=-1)),
                                   atol=2e-3)


def test_harmonic_project_win_kl_skip_is_exact():
    """Live-harmonic chunk skipping: with kl passed, slots below each
    frame's own count must match the kl=None call to float-reassociation
    noise (the skip is whole-chunk predication, not an approximation, but
    the two calls are separately compiled programs), and slots at/above
    the frame-block maximum must come back exactly zero."""
    rng = np.random.default_rng(21)
    N, W, K = 70, 300, 24
    C = W // 2
    dc = jnp.asarray(rng.uniform(-2, 2, (N, W)), jnp.float32)
    fr = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    hw = jnp.asarray(rng.uniform(2.0, C, N), jnp.float32)
    hw_int = jnp.ceil(hw).astype(jnp.int32)
    lo, hi = C - hw_int, C + hw_int + 1
    # cap below 2*KCHUNK so the top chunk of K=3*KCHUNK really skips
    kl = jnp.asarray(rng.integers(0, 2 * pallas_osc.KCHUNK - 2, N),
                     jnp.int32)
    re0, im0, ws0, xs0 = pallas_osc.harmonic_project_win_pallas(
        dc, fr, hw, K, lo=lo, hi=hi, center=C, window="hanning")
    re1, im1, ws1, xs1 = pallas_osc.harmonic_project_win_pallas(
        dc, fr, hw, K, lo=lo, hi=hi, center=C, window="hanning", kl=kl)
    # wsum / windowed-DC rows are outside the k loop: always identical
    np.testing.assert_array_equal(np.asarray(ws1), np.asarray(ws0))
    np.testing.assert_array_equal(np.asarray(xs1), np.asarray(xs0))
    # one shared block (N < FRAME_BLOCK): the block max governs the skip.
    # Live slots match to float-reassociation noise (the two calls are
    # separately compiled programs; XLA:CPU orders them differently),
    # and every slot at/above the rounded-up block max is exactly zero.
    kb = int(np.asarray(kl).max())
    kb_chunks = -(-kb // pallas_osc.KCHUNK) * pallas_osc.KCHUNK
    live = min(kb_chunks, K)
    assert live < K, "fixture must actually skip a chunk"
    np.testing.assert_allclose(np.asarray(re1[:, :live]),
                               np.asarray(re0[:, :live]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(im1[:, :live]),
                               np.asarray(im0[:, :live]), atol=1e-4)
    assert not np.any(np.asarray(re1[:, live:]))
    assert not np.any(np.asarray(im1[:, live:]))
    # kl = 0 everywhere: every harmonic row zero, DC rows still live
    reZ, imZ, wsZ, _ = pallas_osc.harmonic_project_win_pallas(
        dc, fr, hw, K, lo=lo, hi=hi, center=C, window="hanning",
        kl=jnp.zeros((N,), jnp.int32))
    assert not np.any(np.asarray(reZ)) and not np.any(np.asarray(imZ))
    np.testing.assert_array_equal(np.asarray(wsZ), np.asarray(ws0))


def test_harmonic_project_win_kl_skip_multi_block():
    """N > FRAME_BLOCK with a different kl maximum per frame block: each
    block's skip must be governed by its OWN rounded-up max (live slots
    match the kl=None call; slots at/above the block max are exact
    zeros), not by the global max."""
    rng = np.random.default_rng(33)
    FB, KC = pallas_osc.FRAME_BLOCK, pallas_osc.KCHUNK
    N, W, K = FB + 60, 300, 4 * KC
    C = W // 2
    dc = jnp.asarray(rng.uniform(-2, 2, (N, W)), jnp.float32)
    fr = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    hw = jnp.asarray(rng.uniform(2.0, C, N), jnp.float32)
    hw_int = jnp.ceil(hw).astype(jnp.int32)
    lo, hi = C - hw_int, C + hw_int + 1
    # block 0: maxima just under 3*KCHUNK (skips the top chunk);
    # block 1: maxima just under KCHUNK (skips the top three chunks)
    kl_np = np.concatenate([
        rng.integers(1, 3 * KC - 1, FB), rng.integers(1, KC - 1, N - FB),
    ]).astype(np.int32)
    kl = jnp.asarray(kl_np)
    re0, im0, _, _ = pallas_osc.harmonic_project_win_pallas(
        dc, fr, hw, K, lo=lo, hi=hi, center=C, window="hanning")
    re1, im1, _, _ = pallas_osc.harmonic_project_win_pallas(
        dc, fr, hw, K, lo=lo, hi=hi, center=C, window="hanning", kl=kl)
    re0, im0 = np.asarray(re0), np.asarray(im0)
    re1, im1 = np.asarray(re1), np.asarray(im1)
    for b, (blo, bhi) in enumerate([(0, FB), (FB, N)]):
        kb = int(kl_np[blo:bhi].max())
        live = -(-kb // KC) * KC
        assert live < K, "fixture must skip at least one chunk per block"
        np.testing.assert_allclose(re1[blo:bhi, :live], re0[blo:bhi, :live],
                                   atol=1e-4)
        np.testing.assert_allclose(im1[blo:bhi, :live], im0[blo:bhi, :live],
                                   atol=1e-4)
        assert not np.any(re1[blo:bhi, live:]), f"block {b} live rows leak"
        assert not np.any(im1[blo:bhi, live:]), f"block {b} live rows leak"
    # the two blocks genuinely differ in live-chunk count
    assert (-(-int(kl_np[:FB].max()) // KC)) > (-(-int(kl_np[FB:].max()) // KC))


def test_env_render_pallas_matches_jnp():
    """The fused envelope renderer must match _render_envelopes (the
    frame-structured lerp + rotation-recurrence jnp reference)."""
    import jax.numpy as jnp
    from libllsm2_tpu import ChunkConf, create_chunk
    from libllsm2_tpu.ops import harmonics

    rng = np.random.default_rng(11)
    conf = ChunkConf()
    nhop = conf.nhop
    N, C, Ke = 37, conf.nchannel, conf.maxnhar_e
    nx = N * nhop
    ch = create_chunk(conf, N)
    f0 = rng.uniform(100, 300, N).astype(np.float32)
    f0[5:8] = 0.0
    ch = dataclasses.replace(
        ch,
        f0=jnp.asarray(f0),
        edc=jnp.asarray(rng.uniform(0, 1, (N, C)), jnp.float32),
        eenv_a=jnp.asarray(rng.uniform(0, 0.5, (N, C, Ke)), jnp.float32),
        eenv_p=jnp.asarray(rng.uniform(-3, 3, (N, C, Ke)), jnp.float32))
    centers = jnp.arange(N, dtype=jnp.int32) * nhop
    cyc = harmonics.sample_cycles(ch.f0, nhop, conf.fs, nx)
    env_r, base_r = layer0._render_envelopes(ch, cyc, centers, nx, nhop)
    env_p, base_p = layer0._render_envelopes(ch, cyc, centers, nx, nhop,
                                             use_pallas=True)
    np.testing.assert_allclose(np.asarray(env_p), np.asarray(env_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(base_p), np.asarray(base_r),
                               atol=2e-6)


def test_deconv_full_pallas_matches_jnp():
    """The fully fused deconvolution kernel (band build + alignment +
    banded Neumann step + back-conversion in one grid step) must match
    the jnp formulation of _deconv_correction end-to-end."""
    import jax.numpy as jnp
    from libllsm2_tpu.ops import harmonics as hm

    x, f0 = testsig.make_test_utterance(duration=0.7, seed=6,
                                        noise_level=0.05,
                                        unvoiced_tail_frac=0.2)
    opt_j = dataclasses.replace(create_aoptions(), use_pallas=False)
    opt_p = dataclasses.replace(create_aoptions(), use_pallas=True)
    conf = opt_j.conf
    nhop = conf.nhop
    nfrm = len(f0)
    nx = nfrm * nhop
    xj = jnp.asarray(x[:nx], jnp.float32)
    f0j = jnp.asarray(f0, jnp.float32)
    centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop
    cyc = hm.sample_cycles(f0j, nhop, conf.fs, nx)
    ampl, phse, mask = hm.harmonic_analysis(
        xj, f0j, centers, cyc, fs=conf.fs, max_k=conf.maxnhar,
        halfwin_max=conf.halfwin_max, rel_winsize=conf.rel_winsize,
        fnyq=conf.fnyq, nhop=nhop)
    a_j, p_j = layer0._deconv_correction(opt_j, f0j, centers, cyc,
                                         ampl, phse, mask)
    a_p, p_p = layer0._deconv_correction(opt_p, f0j, centers, cyc,
                                         ampl, phse, mask)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_j),
                               atol=2e-4)
    # compare phases via the complex vectors (wrapping-safe)
    z_j = np.asarray(a_j) * np.exp(1j * np.asarray(p_j))
    z_p = np.asarray(a_p) * np.exp(1j * np.asarray(p_p))
    np.testing.assert_allclose(z_p, z_j, atol=5e-4)


def test_synth_noise_fused_matches_jnp():
    """The fused noise path (env render + band OLA + modulation + band
    sum in one kernel) must match the jnp reference bit-closely -- the
    keyed PRNG makes the comparison deterministic."""
    import jax

    x, f0 = testsig.make_test_utterance(duration=0.5, seed=4,
                                        noise_level=0.1,
                                        unvoiced_tail_frac=0.2)
    opt = create_aoptions()
    ch = layer0.analyze(opt, x, f0)
    conf = ch.conf
    nhop = conf.nhop
    nx = ch.nfrm * nhop
    from libllsm2_tpu.ops import harmonics as hm
    cyc = hm.sample_cycles(ch.f0, nhop, conf.fs, nx)
    key = jax.random.PRNGKey(7)
    y_ref = np.asarray(layer0._synth_noise(ch, cyc, nx, key, conf.fs,
                                           nhop, use_pallas=False))
    y_pl = np.asarray(layer0._synth_noise(ch, cyc, nx, key, conf.fs,
                                          nhop, use_pallas=True))
    np.testing.assert_allclose(y_pl, y_ref, atol=5e-5)


def test_harmonic_project_skip_matches_full():
    """[lo, hi) window-block skipping must be exact when the entries
    outside the interval are zero (centered pitch-synchronous windows)."""
    rng = np.random.default_rng(2)
    N, W, K = 300, 915, 24
    dc = jnp.asarray(rng.uniform(-2, 2, (N, W)), jnp.float32)
    xw = np.asarray(rng.standard_normal((N, W)), np.float32)
    c = W // 2
    hw = rng.integers(2, c + 1, N).astype(np.int32)
    lo, hi = c - hw, c + hw + 1
    col = np.arange(W)[None, :]
    xw[(col < lo[:, None]) | (col >= hi[:, None])] = 0.0
    xw = jnp.asarray(xw)
    re_f, im_f = pallas_osc.harmonic_project_pallas(dc, xw, K)
    re_s, im_s = pallas_osc.harmonic_project_pallas(
        dc, xw, K, lo=jnp.asarray(lo), hi=jnp.asarray(hi))
    np.testing.assert_allclose(np.asarray(re_s), np.asarray(re_f),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(im_s), np.asarray(im_f),
                               atol=2e-3)


def test_osc_bank_kl_matches_full():
    rng = np.random.default_rng(3)
    N, K, T = 260, 24, 160
    dc = jnp.asarray(rng.uniform(-0.5, 0.5, (N, T)), jnp.float32)
    ampl = jnp.asarray(rng.uniform(0, 1, (N, K)), jnp.float32)
    phse = jnp.asarray(rng.uniform(-3, 3, (N, K)), jnp.float32)
    kl = rng.integers(1, K + 1, N).astype(np.int32)
    # mask mirrors the real call sites: 1 for k < kl, 0 beyond
    mask = jnp.asarray(np.arange(K)[None, :] < kl[:, None], jnp.float32)
    full = np.asarray(pallas_osc.osc_bank_pallas(dc, ampl, phse, mask))
    skip = np.asarray(pallas_osc.osc_bank_pallas(dc, ampl, phse, mask,
                                                 kl=jnp.asarray(kl)))
    np.testing.assert_allclose(skip, full, atol=2e-4)


def test_pallas_pipeline_with_unvoiced_tail():
    """Unvoiced frames take the minimal-window path; outputs must still
    match the jnp reference (they are masked in both)."""
    x, f0 = testsig.make_test_utterance(duration=0.5,
                                        unvoiced_tail_frac=0.3)
    opt_ref = dataclasses.replace(create_aoptions(), f0_refine=False)
    opt_pl = dataclasses.replace(opt_ref, use_pallas=True)
    ch_ref = layer0.analyze(opt_ref, x, f0)
    ch_pl = layer0.analyze(opt_pl, x, f0)
    np.testing.assert_allclose(np.asarray(ch_pl.ampl),
                               np.asarray(ch_ref.ampl), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ch_pl.f0),
                               np.asarray(ch_ref.f0), rtol=1e-4)


def test_refine_decimated_matches_full_rate():
    """The Pallas path's lowpass-decimated F0 refine is the same
    estimator at 1/4 the sample density: it must agree with the full-
    rate jnp refine to a fraction of a Hz on typical voiced frames."""
    import jax.numpy as jnp
    from libllsm2_tpu import create_aoptions

    conf = create_aoptions().conf
    x, f0 = testsig.make_test_utterance(duration=0.6)
    nhop, nfrm = conf.nhop, len(f0)
    xj = jnp.asarray(x[:nfrm * nhop], jnp.float32)
    f0j = jnp.asarray(f0, jnp.float32)
    centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop
    kw = dict(fs=conf.fs, halfwin_max=conf.halfwin_max,
              rel_winsize=conf.rel_winsize)
    r_full = np.asarray(harmonics.refine_f0(xj, f0j, centers, **kw))
    r_dec = np.asarray(harmonics.refine_f0(xj, f0j, centers,
                                           use_pallas=True, nhop=nhop,
                                           **kw))
    v = np.asarray(f0) > 0
    d = np.abs(r_dec - r_full)[v]
    assert np.median(d) < 0.2, np.median(d)
    assert np.percentile(d, 95) < 1.0, np.percentile(d, 95)


def test_pallas_frame_chunk_matches_unchunked():
    x, f0 = testsig.make_test_utterance(duration=0.5)
    opt0 = dataclasses.replace(create_aoptions(), use_pallas=True)
    opt1 = dataclasses.replace(opt0, frame_chunk=32)
    ch0 = layer0.analyze(opt0, x, f0)
    ch1 = layer0.analyze(opt1, x, f0)
    np.testing.assert_allclose(np.asarray(ch1.ampl), np.asarray(ch0.ampl),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ch1.phse), np.asarray(ch0.phse),
                               atol=1e-3)


def test_osc_bank_interior_mask_notch():
    """kl must bound by the HIGHEST live harmonic: an edited chunk can
    notch interior harmonics and the top one must still render."""
    cyc = jnp.asarray(np.linspace(0, 50.0, 800) % 1.0, jnp.float32)
    centers = jnp.arange(10, dtype=jnp.int32) * 80
    N, K = 10, 12
    ampl = jnp.ones((N, K), jnp.float32)
    phse = jnp.zeros((N, K), jnp.float32)
    mask = np.ones((N, K), np.float32)
    mask[:, 4] = 0.0                      # interior notch
    mask[:, 9:] = 0.0                     # top live slot = 8 (harmonic 9)
    mask = jnp.asarray(mask)
    s_pl = np.asarray(harmonics.oscillator_bank(
        cyc, centers, ampl, phse, mask, nhop=80, use_pallas=True))
    s_ref = np.asarray(harmonics.oscillator_bank(
        cyc, centers, ampl, phse, mask, nhop=80, use_pallas=False))
    np.testing.assert_allclose(s_pl, s_ref, atol=2e-4)


@pytest.mark.parametrize("spectral", [False, True])
def test_track_denoise_fused_matches_jnp(spectral):
    """The fused two-pass track denoiser (stats kernel + apply kernel,
    ops.pallas_osc.denoise_*_pallas) must match the jnp formulation on a
    noisy stressed fixture including unvoiced regions -- in BOTH the
    time-gate-only and the default SPECTRAL mode (the spectral branch
    consumes pass A's pp for the round-5 local-noisiness blend; a
    convention mismatch between the kernel's pp and the jnp pp would
    silently skew the blend on TPU only)."""
    import jax.numpy as jnp

    x, f0, xh = testsig.synth_hard_utterance(
        duration=0.8, register="female", seed=3, noise_level=0.05,
        unvoiced_tail_frac=0.2)
    opt = dataclasses.replace(create_aoptions(f0_floor=65.0),
                              track_denoise=False)
    conf = opt.conf
    ch = layer0.analyze(opt, x, f0)
    nhop, nfrm = conf.nhop, ch.nfrm
    centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop
    cyc = harmonics.sample_cycles(jnp.asarray(ch.f0), nhop, conf.fs,
                                  nfrm * nhop)
    a_j, p_j = layer0._track_denoise(conf, ch.f0, cyc, centers, ch.ampl,
                                     ch.phse, ch.hm_mask, 15.0, 8.0,
                                     use_pallas=False, spectral=spectral)
    a_p, p_p = layer0._track_denoise(conf, ch.f0, cyc, centers, ch.ampl,
                                     ch.phse, ch.hm_mask, 15.0, 8.0,
                                     use_pallas=True, spectral=spectral)
    scale = float(np.abs(np.asarray(a_j)).max())
    # tolerance: the fit-weight clip boundaries can flip a borderline
    # track between the two arithmetically-reassociated paths
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_j),
                               atol=2e-3 * scale)
    z_j = np.asarray(a_j) * np.exp(1j * np.asarray(p_j))
    z_p = np.asarray(a_p) * np.exp(1j * np.asarray(p_p))
    np.testing.assert_allclose(z_p, z_j, atol=3e-3 * scale)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_track_denoise_complex_handoff_matches(use_pallas):
    """The complex handoff (c_complex=(re, im) straight from the deconv,
    skipping the sqrt/arctan2 <-> a e^{j phi} round trip) must reproduce
    the (ampl, phse) entry point on both backends: the two differ only
    in trig decomposition order, so everything downstream (slow-track
    FIR, fit, gate, spectral mode) is shared."""
    import jax.numpy as jnp

    x, f0, xh = testsig.synth_hard_utterance(
        duration=0.8, register="female", seed=3, noise_level=0.05,
        unvoiced_tail_frac=0.2)
    opt = dataclasses.replace(create_aoptions(f0_floor=65.0),
                              track_denoise=False)
    conf = opt.conf
    ch = layer0.analyze(opt, x, f0)
    nhop, nfrm = conf.nhop, ch.nfrm
    centers = jnp.arange(nfrm, dtype=jnp.int32) * nhop
    cyc = harmonics.sample_cycles(jnp.asarray(ch.f0), nhop, conf.fs,
                                  nfrm * nhop)
    a_ref, p_ref = layer0._track_denoise(
        conf, ch.f0, cyc, centers, ch.ampl, ch.phse, ch.hm_mask, 15.0,
        8.0, use_pallas=use_pallas, spectral=True)
    cr = ch.ampl * jnp.cos(ch.phse)
    ci = ch.ampl * jnp.sin(ch.phse)
    a_c, p_c = layer0._track_denoise(
        conf, ch.f0, cyc, centers, None, None, ch.hm_mask, 15.0, 8.0,
        use_pallas=use_pallas, spectral=True, c_complex=(cr, ci))
    scale = float(np.abs(np.asarray(a_ref)).max())
    np.testing.assert_allclose(np.asarray(a_c), np.asarray(a_ref),
                               atol=2e-3 * scale)
    z_r = np.asarray(a_ref) * np.exp(1j * np.asarray(p_ref))
    z_c = np.asarray(a_c) * np.exp(1j * np.asarray(p_c))
    np.testing.assert_allclose(z_c, z_r, atol=3e-3 * scale)


def test_fir_frames_pallas_matches_numpy():
    """fir_frames_pallas (generic frame-axis FIR utility) must match a
    zero-padded numpy FIR exactly -- kept as the reference halo-FIR
    helper even though the denoiser now fuses its own FIRs."""
    rng = np.random.default_rng(5)
    v = rng.standard_normal((137, 30)).astype(np.float32)
    taps = np.hanning(9)[1:-1]
    taps = taps / taps.sum()
    got = np.asarray(pallas_osc.fir_frames_pallas(jnp.asarray(v),
                                                  tuple(taps)))
    ref = np.zeros_like(v)
    h = len(taps) // 2
    for j, t in enumerate(taps):
        d = j - h
        sh = np.zeros_like(v)
        if d >= 0:
            sh[:v.shape[0] - d] = v[d:]
        else:
            sh[-d:] = v[:v.shape[0] + d]
        ref += t * sh
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_denoise_stats_halo_free_matches_padded():
    """The halo-free stats path (clamped prev/next index maps +
    in-kernel edge masking; taken whenever the block divides N) must be
    bit-comparable to the physical-zero-halo path on the same inputs --
    the edge masking must exactly reproduce the zero-padded FIR edges."""
    import jax.numpy as jnp
    from libllsm2_tpu.ops import pallas_osc

    rng = np.random.default_rng(11)
    N, K = 160, 24
    ampl = jnp.asarray(rng.uniform(0.0, 1.0, (N, K)).astype(np.float32))
    phse = jnp.asarray(rng.uniform(-3.1, 3.1, (N, K)).astype(np.float32))
    cyc_c = jnp.asarray(np.cumsum(
        rng.uniform(0.4, 0.6, (N,))).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(N, K)) > 0.1)
                       .astype(np.float32))
    voiced = jnp.asarray(
        (np.arange(N) < int(0.85 * N)).astype(np.float32))
    taps1 = tuple(np.hanning(13)[1:-1] / np.hanning(13)[1:-1].sum())
    taps2 = tuple(np.hanning(9)[1:-1] / np.hanning(9)[1:-1].sum())
    free = pallas_osc.denoise_stats_pallas(ampl, phse, cyc_c, mask,
                                           voiced, taps1, taps2)
    padded = pallas_osc.denoise_stats_pallas(ampl, phse, cyc_c, mask,
                                             voiced, taps1, taps2,
                                             _force_pad=True)
    for a, b in zip(free, padded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
