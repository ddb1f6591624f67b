"""End-to-end acoustic-model workload: synthetic phone corpus ->
analysis -> coder targets -> phoneme-conditioned model -> streaming
vector decode -> rendered audio (the TTS loop the reference's coder
exists for -- reference: coder.c; SURVEY.md 3.5 -- with the model and
data halves the reference leaves to the user).

The corpus is fully synthetic with known ground truth (utils.ttsdata),
so the oracles are physical: the predicted F0 contour must track the
generator's declination, predicted vocal-tract slots must identify the
phone, and the served render of an UNSEEN sentence must be periodic at
the predicted F0 in vowels and band-shaped in fricatives.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libllsm2_tpu import create_soptions
from libllsm2_tpu.models import acoustic, coder, neural
from libllsm2_tpu.utils import ttsdata


def _slot(cc, name):
    for n, off, size in cc.layout():
        if n == name:
            return slice(off, off + size)
    raise KeyError(name)


@pytest.fixture(scope="module")
def trained():
    """Small corpus + a few hundred training steps (module-scoped: the
    contour/identity/serving tests share one trained model)."""
    corp = ttsdata.build_corpus(8, seed=0, total_frames=192,
                                n_seg=(5, 8), dur=(16, 34))
    cc = corp["cc"]
    norm = neural.Normalizer(corp["targets"].reshape(-1,
                                                     corp["targets"].shape[-1]))
    tgt_n = jnp.asarray(norm.fwd(corp["targets"]), jnp.float32)
    cfg = acoustic.AcousticConfig(dims=cc.dims, n_phones=ttsdata.N_PHONES,
                                  embed=24, hidden=48, dilations=(1, 2, 4),
                                  lr=3e-3)
    params = acoustic.init_params(cfg, jax.random.PRNGKey(0))
    opt_state = acoustic.make_optimizer(cfg).init(params)
    batch = (jnp.asarray(corp["ids"]), jnp.asarray(corp["feats"]),
             tgt_n, jnp.asarray(corp["mask"]))
    # emphasize the F0 slot: its contour drives the downstream render
    w = np.ones(cc.dims, np.float32)
    w[_slot(cc, "f0")] = 4.0
    w = jnp.asarray(w)
    losses = []
    for step in range(240):
        params, opt_state, loss = acoustic.train_step(
            cfg, params, opt_state, batch, w)
        losses.append(float(loss))
    return corp, cc, norm, cfg, params, losses


def test_training_reduces_loss(trained):
    _, _, _, _, _, losses = trained
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])


def test_f0_contour_recovered(trained):
    """On a held-out sentence the predicted F0 slot must track the
    generator's declination contour in the voiced regions."""
    corp, cc, norm, cfg, params, _ = trained
    held = ttsdata.build_corpus(2, seed=99, total_frames=192,
                                n_seg=(5, 8), dur=(16, 34))
    pred = acoustic.predict_vectors(
        cfg, params, jnp.asarray(held["ids"]), jnp.asarray(held["feats"]),
        norm)
    f0_pred = pred[..., _slot(cc, "f0")][..., 0]
    f0_true = held["f0"]
    v = f0_true > 0
    assert v.sum() > 50
    err = np.abs(f0_pred[v] - f0_true[v]) / f0_true[v]
    assert np.median(err) < 0.05, np.median(err)
    c = np.corrcoef(f0_pred[v], f0_true[v])[0, 1]
    assert c > 0.85, c


def test_phone_identity_in_vt_slots(trained):
    """Mid-phone vowel frames: the predicted vocal-tract magnitude must
    be closer to its own phone's training centroid than to any other
    vowel's (nearest-centroid classification).  The log-VT slots are
    mean-centered first: overall gain tracks utterance position (the
    declination) and would otherwise dominate the distance -- verified
    on ground-truth targets (50% raw vs 100% gain-removed)."""
    corp, cc, norm, cfg, params, _ = trained
    sl = _slot(cc, "vtmagn")

    def feat(v):
        x = v[..., sl]
        return x - x.mean(axis=-1, keepdims=True)
    vowels = [i for i, ph in enumerate(ttsdata.PHONE_SET)
              if ph.kind == "vowel"]
    cents = {}
    ids_t, pos_t = corp["ids"], corp["feats"][..., 0]
    mid_t = (pos_t > 0.3) & (pos_t < 0.7)
    for pid in vowels:
        m = (ids_t == pid) & mid_t
        if m.sum():
            cents[pid] = feat(corp["targets"][m]).mean(axis=0)
    held = ttsdata.build_corpus(2, seed=123, total_frames=192)
    pred = acoustic.predict_vectors(
        cfg, params, jnp.asarray(held["ids"]), jnp.asarray(held["feats"]),
        norm)
    mid = (held["feats"][..., 0] > 0.3) & (held["feats"][..., 0] < 0.7)
    hits = tot = 0
    for pid in vowels:
        m = (held["ids"] == pid) & mid
        for vec in feat(pred[m]):
            d = {q: np.linalg.norm(vec - c) for q, c in cents.items()}
            hits += min(d, key=d.get) == pid
            tot += 1
    assert tot > 30
    assert hits / tot > 0.75, (hits, tot)


def test_tts_serving_render(trained):
    """A sentence never seen in training, rendered through the full
    serving path (predict -> decode_frames blocks -> RTSynthesizer with
    phase_mode='propagate'): vowels come out periodic near the predicted
    F0, the fricative comes out band-shaped, silence stays quiet."""
    from scipy import signal as sps

    from libllsm2_tpu.runtime import rtsynth

    corp, cc, norm, cfg, params, _ = trained
    fs = cc.conf.fs
    nhop = cc.conf.nhop
    seq = [1, 6, 2, 0]                         # aa  s  iy  sil
    durs = [56, 40, 56, 40]
    N = sum(durs)
    ids = np.zeros((1, N), np.int32)
    feats = np.zeros((1, N, 2), np.float32)
    a = 0
    for pi, d in zip(seq, durs):
        ids[0, a:a + d] = pi
        feats[0, a:a + d, 0] = (np.arange(d) + 0.5) / d
        a += d
    feats[0, :, 1] = np.arange(N) / (N - 1)
    pred = acoustic.predict_vectors(cfg, params, jnp.asarray(ids),
                                    jnp.asarray(feats), norm,
                                    unvoiced_below=cc.conf.f0_floor)[0]

    sopt = create_soptions()
    rt = rtsynth.RTSynthesizer(sopt, cc.conf, capacity_frames=N + 8,
                               phase_mode="propagate")
    out = []
    for s in range(0, N, 16):
        rt.feed_many(coder.decode_frames(cc, jnp.asarray(pred[s:s + 16])))
        out.append(rt.fetch(rt.readable()))
    rt.flush()
    out.append(rt.fetch(rt.readable()))
    y = np.concatenate(out)
    assert np.isfinite(y).all()

    # vowel 'aa': periodic at the predicted F0 (autocorrelation at the
    # predicted period dominates)
    mid = slice(20 * nhop, 48 * nhop)
    f0m = float(np.median(pred[20:48, 0]))
    assert f0m > 80.0, f0m
    seg = y[mid] - y[mid].mean()
    lag = int(round(fs / f0m))
    r = np.correlate(seg, seg, "full")[len(seg) - 1:]
    r0 = r[0]
    rl = r[lag - 2:lag + 3].max()
    assert rl / max(r0, 1e-12) > 0.4, rl / r0

    # fricative 's': spectral centroid in the band, well above vowels
    fr = slice((56 + 8) * nhop, (56 + 36) * nhop)
    f, P = sps.welch(y[fr], fs=fs, nperseg=512)
    cent = float((f * P).sum() / max(P.sum(), 1e-12))
    assert cent > 2500.0, cent

    # final silence: at least 20 dB below the vowel
    sil = y[(N - 24) * nhop:(N - 4) * nhop]
    assert np.std(sil) < 0.1 * np.std(y[mid]) + 1e-9


def test_dp_sharded_train_step(trained):
    """The training step runs data-parallel over the 8-device mesh with
    replicated parameters (same recipe as models.neural)."""
    from libllsm2_tpu.parallel import mesh as meshlib

    corp, cc, norm, cfg, params, _ = trained
    tgt_n = jnp.asarray(norm.fwd(corp["targets"]), jnp.float32)
    m = meshlib.make_mesh(8)
    batch = tuple(meshlib.shard_batch(jnp.asarray(a), m)
                  for a in (corp["ids"], corp["feats"], tgt_n,
                            corp["mask"]))
    opt_state = acoustic.make_optimizer(cfg).init(params)
    params2, _, loss = acoustic.train_step(cfg, params, opt_state, batch)
    assert np.isfinite(float(loss))
    assert jax.tree.leaves(params2)[0].sharding.is_fully_replicated
