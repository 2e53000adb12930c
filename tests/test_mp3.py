"""mp3 input path: ctypes libmpg123 decode + resample + read_audio
dispatch.

Verification strategy: the image's libmp3lame is used as an *encode
oracle* — synthesize known tones, encode to real mp3 bytes in-process,
then check our decoder recovers frequency content, duration, channel
downmix, and rate conversion. No vendored fixtures.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from qwen2_audio_tpu.audio import have_mp3, read_audio, read_mp3, resample
from qwen2_audio_tpu.audio.filters import resample as _resample

pytestmark = pytest.mark.skipif(not have_mp3(),
                                reason="libmpg123 not available")


def _lame():
    name = ctypes.util.find_library("mp3lame") or "libmp3lame.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.lame_init.restype = ctypes.c_void_p
    for fn in ("lame_set_in_samplerate", "lame_set_num_channels",
               "lame_set_brate", "lame_set_mode"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int]
        getattr(lib, fn).restype = ctypes.c_int
    lib.lame_init_params.argtypes = [ctypes.c_void_p]
    lib.lame_init_params.restype = ctypes.c_int
    lib.lame_encode_buffer_interleaved.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    lib.lame_encode_buffer_interleaved.restype = ctypes.c_int
    lib.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    lib.lame_encode_buffer.restype = ctypes.c_int
    lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int]
    lib.lame_encode_flush.restype = ctypes.c_int
    lib.lame_close.argtypes = [ctypes.c_void_p]
    return lib


LAME = _lame()
needs_lame = pytest.mark.skipif(LAME is None,
                                reason="libmp3lame not available")


def encode_mp3(path: str, x: np.ndarray, rate: int) -> None:
    """Test-only mp3 writer over libmp3lame. x: (n,) or (n, 2) float32."""
    lib = LAME
    gfp = lib.lame_init()
    stereo = x.ndim == 2
    lib.lame_set_in_samplerate(gfp, rate)
    lib.lame_set_num_channels(gfp, 2 if stereo else 1)
    lib.lame_set_brate(gfp, 128)
    if not stereo:
        lib.lame_set_mode(gfp, 3)           # MONO
    assert lib.lame_init_params(gfp) >= 0
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    n = pcm.shape[0]
    out = ctypes.create_string_buffer(int(1.25 * n) + 7200)
    if stereo:
        m = lib.lame_encode_buffer_interleaved(
            gfp, pcm.ctypes.data, n, out, len(out))
    else:
        m = lib.lame_encode_buffer(
            gfp, pcm.ctypes.data, pcm.ctypes.data, n, out, len(out))
    assert m >= 0
    data = out.raw[:m]
    m = lib.lame_encode_flush(gfp, out, len(out))
    data += out.raw[:m]
    lib.lame_close(gfp)
    with open(path, "wb") as f:
        f.write(data)


def dominant_hz(x: np.ndarray, rate: int) -> float:
    # skip codec warm-up/padding at both ends
    x = x[rate // 4: -rate // 4 or None]
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return float(np.fft.rfftfreq(len(x), 1.0 / rate)[spec.argmax()])


def tone(freq: float, rate: int, seconds: float = 1.5) -> np.ndarray:
    t = np.arange(int(rate * seconds)) / rate
    return (0.45 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@needs_lame
def test_mp3_roundtrip_16k_mono(tmp_path):
    path = str(tmp_path / "tone16.mp3")
    encode_mp3(path, tone(440.0, 16000), 16000)
    x, sr = read_mp3(path)
    assert sr == 16000
    assert abs(len(x) / sr - 1.5) < 0.2          # encoder delay + flush pad
    assert abs(dominant_hz(x, sr) - 440.0) < 5.0
    assert 0.2 < float(np.abs(x).max()) < 0.6


@needs_lame
def test_mp3_44k_resampled_to_16k(tmp_path):
    path = str(tmp_path / "tone44.mp3")
    encode_mp3(path, tone(1000.0, 44100), 44100)
    x, sr = read_mp3(path)                       # expect_rate defaults 16k
    assert sr == 16000
    assert abs(dominant_hz(x, sr) - 1000.0) < 8.0
    assert abs(len(x) / sr - 1.5) < 0.2


@needs_lame
def test_mp3_stereo_downmix(tmp_path):
    path = str(tmp_path / "stereo.mp3")
    left = tone(400.0, 16000)
    right = tone(400.0, 16000)
    encode_mp3(path, np.stack([left, right], axis=1), 16000)
    mono, _ = read_mp3(path)
    assert mono.ndim == 1
    both, _ = read_mp3(path, to_mono=False)
    assert both.ndim == 2 and both.shape[1] == 2
    np.testing.assert_allclose(mono, both.mean(axis=1), atol=1e-6)


@needs_lame
def test_read_audio_dispatch(tmp_path):
    from qwen2_audio_tpu.audio import write_wav
    w = str(tmp_path / "t.wav")
    m = str(tmp_path / "t.mp3")
    sig = tone(440.0, 16000)
    write_wav(w, sig)
    encode_mp3(m, sig, 16000)
    xw, srw = read_audio(w)
    xm, srm = read_audio(m)
    assert srw == srm == 16000
    assert abs(dominant_hz(xw, 16000) - dominant_hz(xm, 16000)) < 5.0


def test_resample_tone_quality():
    rate = 44100
    x = tone(1000.0, rate, 2.0)
    y = _resample(x, rate, 16000)
    assert abs(len(y) - 2 * 16000) <= 2
    assert abs(dominant_hz(y, 16000) - 1000.0) < 4.0
    # amplitude preserved within 1%
    mid = slice(4000, -4000)
    assert abs(float(np.abs(y[mid]).max()) - 0.45) < 0.005
    # identity when rates match
    assert _resample(x, rate, rate) is not None
    np.testing.assert_array_equal(_resample(x, rate, rate), x)


def test_resample_rejects_aliasing():
    """Content above the target Nyquist must be attenuated, not folded."""
    rate = 44100
    t = np.arange(rate) / rate
    hi = (0.45 * np.sin(2 * np.pi * 15000.0 * t)).astype(np.float32)
    y = resample(hi, rate, 16000)
    assert float(np.sqrt((y[2000:-2000] ** 2).mean())) < 0.01


def test_read_mp3_missing_file():
    with pytest.raises((ValueError, OSError)):
        read_mp3("/nonexistent/x.mp3")
