"""CLI smoke tests (the user-facing analog of the reference's demo
binaries): each command must run end-to-end in-process and produce a
plausible artifact.  Kept to a handful of commands on one short
utterance -- the DSP behind them is oracle-tested elsewhere; this pins
the argparse surface, file I/O, and command wiring that no other test
exercises."""
import json
import os

import numpy as np
import pytest

from libllsm2_tpu import cli
from libllsm2_tpu.utils import audio, testsig


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    x, f0 = testsig.make_test_utterance(duration=0.4, seed=3)
    p = str(d / "in.wav")
    audio.wavwrite(p, x.astype(np.float32), 16000)
    return p, str(d)


def _dur(path):
    y, fs = audio.wavread(path)
    return len(y) / fs, y


def test_cli_roundtrip(wav):
    p, d = wav
    out = os.path.join(d, "rt.wav")
    cli.main(["roundtrip", p, out])
    dur, y = _dur(out)
    assert abs(dur - 0.4) < 0.02 and float(np.std(y)) > 1e-3


def test_cli_pitch_shift_ratio(wav):
    p, d = wav
    out = os.path.join(d, "ps.wav")
    cli.main(["pitch-shift", p, out, "--ratio", "1.5"])
    _, y = _dur(out)
    assert float(np.std(y)) > 1e-3


def test_cli_track_f0(wav):
    p, d = wav
    out = os.path.join(d, "f0.txt")
    cli.main(["track-f0", p, out])
    f0 = np.loadtxt(out)
    v = f0[f0 > 0]
    assert len(v) > 0.8 * len(f0)          # glide fixture, mostly voiced
    assert 100 < np.median(v) < 200


def test_cli_code_decode(wav):
    p, d = wav
    npz = os.path.join(d, "c.npz")
    out = os.path.join(d, "dec.wav")
    cli.main(["code", p, npz])
    assert os.path.exists(npz)
    cli.main(["decode", npz, out])
    _, y = _dur(out)
    assert float(np.std(y)) > 1e-3


def test_cli_code_decode_quantized(wav):
    """--bits 8 writes the quantized coder-vector archive (4x smaller
    than the float chunk) and decode sniffs the format."""
    p, d = wav
    npz = os.path.join(d, "cq.npz")
    out = os.path.join(d, "decq.wav")
    cli.main(["code", p, npz, "--bits", "8"])
    with np.load(npz) as z:
        assert "__coded__" in z.files and z["codes"].dtype == np.uint8
    cli.main(["decode", npz, out])
    _, y = _dur(out)
    assert float(np.std(y)) > 1e-3


def test_cli_batch_report(wav):
    p, d = wav
    bdir = os.path.join(d, "batchin")       # isolated from the other
    os.makedirs(bdir, exist_ok=True)        # tests' output WAVs
    import shutil
    shutil.copy(p, os.path.join(bdir, "a.wav"))
    rep = os.path.join(d, "report.json")
    cli.main(["batch", bdir, rep, "--batch-size", "2"])
    r = json.load(open(rep))
    assert r["n_files"] == 1 and r["n_failed"] == 0
    assert r["mean_snr_db"] > 15.0
