"""Native audio loader (native/wavio.cpp) vs the scipy reference path:
numeric parity across formats/rates, threaded corpus load, error handling."""

import numpy as np
import pytest
from scipy.io import wavfile

from privacy_preserve_federated_asr_tpu.data import native_audio
from privacy_preserve_federated_asr_tpu.data.audio import load_audio
from privacy_preserve_federated_asr_tpu.data.dataset import _load_all_audio

pytestmark = pytest.mark.skipif(
    not native_audio.available(), reason="native library not buildable here")


def _write(tmp_path, name, sr, data):
    p = str(tmp_path / name)
    wavfile.write(p, sr, data)
    return p


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_exact_parity_at_16k(tmp_path, rng):
    mono = (rng.normal(0, 0.2, 16000) * 32767).astype(np.int16)
    stereo = (rng.normal(0, 0.2, (8000, 2)) * 32767).astype(np.int16)
    for name, data in (("m.wav", mono), ("s.wav", stereo)):
        p = _write(tmp_path, name, 16000, data)
        np.testing.assert_array_equal(
            native_audio.load_audio_native(p), load_audio(p))


@pytest.mark.parametrize("sr,dtype", [(22050, np.float32), (44100, np.int16),
                                      (8000, np.int32)])
def test_resample_parity(tmp_path, rng, sr, dtype):
    x = rng.normal(0, 0.2, sr)  # 1 second
    if np.issubdtype(dtype, np.integer):
        data = (x * np.iinfo(dtype).max * 0.5).astype(dtype)
    else:
        data = x.astype(dtype)
    p = _write(tmp_path, "r.wav", sr, data)
    a = native_audio.load_audio_native(p)
    b = load_audio(p)
    assert len(a) == len(b) == 16000
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_load_many_matches_single_and_flags_errors(tmp_path, rng):
    paths = []
    for i in range(5):
        data = (rng.normal(0, 0.2, 3200 + 320 * i) * 32767).astype(np.int16)
        paths.append(_write(tmp_path, f"f{i}.wav", 16000, data))
    bad = str(tmp_path / "missing.wav")
    notwav = str(tmp_path / "notwav.wav")
    with open(notwav, "wb") as f:
        f.write(b"not a riff file at all")
    out = native_audio.load_many_native(paths + [bad, notwav], n_threads=4)
    for p, s in zip(paths, out):
        np.testing.assert_array_equal(s, native_audio.load_audio_native(p))
    assert out[5] is None and out[6] is None


def test_dataset_loader_uses_native_with_fallback_semantics(tmp_path, rng):
    good = _write(tmp_path, "g.wav", 16000,
                  (rng.normal(0, 0.2, 4800) * 32767).astype(np.int16))
    sigs = _load_all_audio([good, str(tmp_path / "nope.wav")], 16000)
    assert sigs[1] is None
    np.testing.assert_array_equal(sigs[0], load_audio(good))


def test_dataset_loader_retries_native_failures_with_scipy(tmp_path, rng):
    """Formats the C++ parser skips (e.g. float64 WAV) must still load via
    the scipy retry — a corpus must not shrink because the native loader
    was buildable."""
    f64 = _write(tmp_path, "f64.wav", 16000,
                 rng.normal(0, 0.2, 4800).astype(np.float64))
    # confirm the premise: native alone rejects it
    assert native_audio.load_many_native([f64])[0] is None
    sigs = _load_all_audio([f64], 16000)
    assert sigs[0] is not None
    np.testing.assert_array_equal(sigs[0], load_audio(f64))
