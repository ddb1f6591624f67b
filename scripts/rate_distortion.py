"""Rate-distortion measurement for the coder transports and the VQ token
codec (VERDICT r3 next-round #7).

Points measured (bits PER FRAME on the default 118-dim coder vector):
  float32      3776   reference transport (lossless)
  int16        1888   per-slot affine
  int8         944    per-slot affine
  int8+DPCM    944    affine + closed-loop delta coding of the Rd slot
                      (models.coder.default_dpcm_mask; the documented
                      8-bit failure mode is Rd steps near LF source
                      nulls -- docs/STATUS.md item 34)
  VQ 4x16      16     product VQ-VAE tokens (models.vq)
  VQ 4x64      24
  VQ 4x256     32

Distortion metrics, all against the FLOAT-vector decode render (the
transparent reference; waveform SNR vs the analysis input confounds
transport loss with codec loss):
  mcd_db        mel-cepstral distortion of the rendered audio
                (utils.metrics.mel_cepstral_distortion_db)
  track_snr_db  harmonic amplitude-track SNR: re-analyze both renders at
                the true F0 and compare ampl tracks (phase-free -- the
                phase-propagated waveform decorrelates under ppm-level
                F0 quantization drift, so waveform SNR measures the
                wrong thing; same argument as tests/test_pbp.py).

Writes the table to stdout; paste into BASELINE.md when re-measured.
Runs on CPU (forced) in ~3 minutes.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from libllsm2_tpu import create_aoptions, create_soptions
from libllsm2_tpu.models import coder, layer0, layer1, neural, vq
from libllsm2_tpu.utils import metrics, testsig


def build_corpus(n_utt=6, duration=1.0):
    """LF-speech utterances over varied register/Rd/noise; returns
    (vectors per utt, f0 per utt, coder config, analysis options)."""
    opt = create_aoptions()
    cc = coder.CoderConfig(conf=opt.conf)
    specs = [
        dict(f0=120.0, rd=0.6, noise_level=0.02),
        dict(f0=150.0, rd=1.0, noise_level=0.02),
        dict(f0=200.0, rd=1.4, noise_level=0.05),
        dict(f0=260.0, rd=1.8, noise_level=0.02),
        dict(f0=100.0, rd=2.4, noise_level=0.05),
        dict(f0=170.0, rd=0.9, noise_level=0.08),
    ]
    vecs, f0s = [], []
    nfrm = int(duration / 0.005)
    for i, s in enumerate(specs[:n_utt]):
        f0t = np.asarray(testsig.make_f0_track(nfrm, 0.005))
        f0t = f0t * (s["f0"] / 150.0)
        x, f0t = testsig.synth_lf_speech(f0t, rd=s["rd"],
                                         noise_level=s["noise_level"],
                                         seed=i)
        l1 = layer1.chunk_to_layer1(layer0.analyze(opt, x, f0t))
        vecs.append(np.asarray(coder.encode(cc, l1)))
        f0s.append(np.asarray(f0t))
    return vecs, f0s, cc, opt


def render(cc, sopt, vectors):
    return np.asarray(
        layer0.synthesize(sopt, coder.decode(cc, jnp.asarray(
            vectors, jnp.float32))).y_sin)


def track_snr(opt, y_ref, y, f0):
    ca = layer0.analyze(opt, y_ref.astype(np.float64), jnp.asarray(f0))
    cb = layer0.analyze(opt, y.astype(np.float64), jnp.asarray(f0))
    aa, ab = np.asarray(ca.ampl), np.asarray(cb.ampl)
    m = ((np.asarray(ca.hm_mask) * np.asarray(cb.hm_mask)) > 0) \
        & (f0 > 0)[:, None]
    m[:4] = False
    m[len(m) - 4:] = False
    return 10 * np.log10(np.sum(aa[m] ** 2)
                         / max(np.sum((aa - ab)[m] ** 2), 1e-12))


def measure(name, bits, vec_list, ref_renders, f0s, cc, opt, sopt):
    mcds, snrs = [], []
    for v, y_ref, f0 in zip(vec_list, ref_renders, f0s):
        y = render(cc, sopt, v)
        mcds.append(metrics.mel_cepstral_distortion_db(
            y_ref, y, fs=cc.conf.fs))
        snrs.append(track_snr(opt, y_ref, y, f0))
    print(f"{name:<12} {bits:>6}   mcd {np.mean(mcds):5.2f} dB   "
          f"track-snr {np.mean(snrs):5.1f} dB")
    return float(np.mean(mcds)), float(np.mean(snrs))


def main(quick=False):
    sopt = create_soptions()
    vecs, f0s, cc, opt = build_corpus(n_utt=3 if quick else 6)
    # STACK, do not concatenate: the DPCM delta range is fitted from
    # frame-to-frame diffs along axis -2, and concatenation would let
    # cross-utterance jumps (e.g. Rd 0.6 -> 2.4 between voices) inflate
    # it ~100x (measured round 5: DPCM coded WORSE than absolute)
    data = np.stack(vecs, axis=0)
    ref_renders = [render(cc, sopt, v) for v in vecs]
    print(f"{'transport':<12} {'bits/f':>6}   (vs float32 decode render)")

    # affine transports (shared codebook across the corpus)
    for bits in (16, 8):
        q = coder.fit_quantizer(data, bits=bits)
        dq = [coder.dequantize(q, coder.quantize(q, v)) for v in vecs]
        measure(f"int{bits}", cc.dims * bits, dq, ref_renders, f0s,
                cc, opt, sopt)
    q = coder.fit_quantizer(data, bits=8,
                            dpcm=coder.default_dpcm_mask(cc),
                            f0_slot=coder.f0_slot(cc))
    dq = [coder.dequantize(q, coder.quantize(q, v)) for v in vecs]
    measure("int8+dpcm", cc.dims * 8, dq, ref_renders, f0s, cc, opt, sopt)

    # the archive transport: + a 16-bit F0 side array (slot ablation
    # measured the 8-bit F0 step as THE waveform bottleneck: decode
    # re-propagates phases from F0, so a ~1 Hz step decorrelates the
    # render; +2 bytes/frame buys waveform coherence back)
    import os
    import tempfile
    from libllsm2_tpu.utils import serialize
    dq = []
    with tempfile.TemporaryDirectory() as td:
        for i, v in enumerate(vecs):
            p = os.path.join(td, f"u{i}.npz")
            serialize.coded_save(p, cc, v, bits=8, quant=q)
            dq.append(serialize.coded_load(p)[1])
    measure("int8+f0_16", cc.dims * 8 + 8, dq, ref_renders, f0s,
            cc, opt, sopt)
    # waveform SNR for the F0-sensitive transports (the metric the
    # parametric table above cannot see)
    for name, dql in (("int8", [coder.dequantize(
            coder.fit_quantizer(data, bits=8),
            coder.quantize(coder.fit_quantizer(data, bits=8), v))
            for v in vecs]),
                      ("int8+f0_16", dq)):
        snrs = []
        for v, y_ref, f0 in zip(dql, ref_renders, f0s):
            y = render(cc, sopt, v)
            n = min(len(y), len(y_ref))
            snrs.append(metrics.snr_db(y_ref[:n], y[:n]))
        print(f"{name:<12} waveform snr {np.mean(snrs):5.1f} dB")

    # VQ token codec at three bit budgets (frame-set training: flat view)
    flat = data.reshape(-1, data.shape[-1])
    norm = neural.Normalizer(flat)
    dn = jnp.asarray(norm.fwd(flat), jnp.float32)
    for codebook in (16, 64, 256):
        cfg = vq.VQConfig(dims=cc.dims, hidden=96, latent=16, depth=1,
                          groups=4, codebook=codebook, lr=2e-3)
        params = vq.init_params(cfg, jax.random.PRNGKey(0))
        opt_state = vq.make_optimizer(cfg).init(params)
        for _ in range(120 if quick else 400):
            params, opt_state, _ = vq.train_step(cfg, params, opt_state, dn)
        dq = []
        for v in vecs:
            t = vq.encode_tokens(cfg, params, jnp.asarray(norm.fwd(v),
                                                          jnp.float32))
            dq.append(norm.inv(np.asarray(vq.decode_tokens(cfg, params, t))))
        measure(f"vq 4x{codebook}", cfg.bits_per_frame, dq, ref_renders,
                f0s, cc, opt, sopt)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
