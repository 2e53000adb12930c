"""Native library vs pure-Python implementations (built on demand)."""

import numpy as np
import pytest

from qwen2_audio_tpu import native
from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.quant import codecs


@pytest.fixture(scope="module", autouse=True)
def lib():
    lib = native.load(auto_build=True)
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_version(lib):
    assert lib.qa_version() == 1


@pytest.mark.parametrize("ttype", [GGMLType.Q4_0, GGMLType.Q4_1,
                                   GGMLType.Q5_0, GGMLType.Q5_1,
                                   GGMLType.Q8_0])
def test_native_quantize_matches_python(ttype, rng):
    x = rng.standard_normal(32 * 33).astype(np.float32)
    got = native.quantize(x, ttype, n_threads=3)
    want = codecs.quantize(x, ttype)
    np.testing.assert_array_equal(got, want)

    deq_native = native.dequantize(got, ttype, x.size, n_threads=3)
    deq_py = codecs.dequantize(want, ttype, x.size)
    np.testing.assert_array_equal(deq_native, deq_py)


def test_native_wav_roundtrip(tmp_path, rng):
    from qwen2_audio_tpu.audio import write_wav
    path = str(tmp_path / "t.wav")
    x = (0.5 * np.sin(np.linspace(0, 100, 8000))).astype(np.float32)
    write_wav(path, x)
    got, rate = native.wav_read(path)
    assert rate == 16000
    assert got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=1e-4)


def test_native_mel_matches_python(rng):
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.audio.mel import log_mel_spectrogram
    filters = mel_filterbank(80)
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
         + 0.05 * rng.standard_normal(16000)).astype(np.float32)
    want = log_mel_spectrogram(x, filters)
    data, n_len_org = native.log_mel(x, filters, n_threads=3)
    assert data.shape == want.data.shape
    assert n_len_org == want.n_len_org
    np.testing.assert_allclose(data, want.data, atol=5e-4)


def test_native_memcpy_bench(lib):
    gbps = native.bench_memcpy_gbps(bytes_=1 << 24, n_threads=2)
    assert gbps > 0.1


def test_mp3_read_matches_python_binding(tmp_path):
    """qa_mp3_read (dlopen libmpg123 in C++) == audio/mp3.py (ctypes from
    Python): both pin s16 output, so samples must be bit-identical."""
    from qwen2_audio_tpu.audio.mp3 import have_mp3, read_mp3
    if not native.available() or not have_mp3():
        pytest.skip("native lib or libmpg123 missing")
    if not hasattr(native.load(), "qa_mp3_read"):
        pytest.skip("lib built before qa_mp3_read")
    from tests.test_mp3 import LAME, encode_mp3, tone
    if LAME is None:
        pytest.skip("libmp3lame not available")
    path = str(tmp_path / "t.mp3")
    encode_mp3(path, tone(523.0, 16000), 16000)
    got, rate = native.mp3_read(path)
    ref, ref_rate = read_mp3(path, expect_rate=None)
    assert rate == ref_rate == 16000
    np.testing.assert_array_equal(got, ref.astype(np.float32))
