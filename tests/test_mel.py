"""Mel frontend tests: jitted XLA path vs the numpy oracle that transcribes
the C loop structure (src/qwen2-whisper.cpp:2402-2665)."""

import numpy as np
import pytest

from qwen2_audio_tpu.audio import mel_filterbank
from qwen2_audio_tpu.audio.mel import (
    frame_counts,
    hann_window,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    mel_input_window,
)


@pytest.fixture(scope="module")
def filters():
    return mel_filterbank(n_mels=80)


def test_hann_periodic():
    w = hann_window(400)
    assert w[0] == 0.0
    # periodic window: w[k] uses denominator N, not N-1
    np.testing.assert_allclose(w[200], 1.0, atol=1e-7)
    np.testing.assert_allclose(w[100], 0.5, atol=1e-7)


def test_filterbank_shape_and_mass(filters):
    assert filters.shape == (80, 201)
    assert filters.dtype == np.float32
    assert (filters >= 0).all()
    # each interior filter has nonzero mass
    assert (filters.sum(axis=1)[1:-1] > 0).all()


def test_frame_counts_30s():
    n = 16000 * 30
    n_len, n_len_org, n_content = frame_counts(n)
    assert n_len == (n + 480000) // 160 == 6000
    assert n_len_org == 1 + (n + 200 - 400) // 160 == 2999
    assert n_content == min(n // 160 + 2, n_len)


def test_frame_counts_short():
    # < 1 s input: the <100-frame guard in whisper_full relies on this
    n_len, n_len_org, _ = frame_counts(3200)
    assert n_len_org == 1 + (3200 + 200 - 400) // 160 == 19


def test_mel_matches_oracle(filters, rng):
    n = 16000  # 1 s
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    got = log_mel_spectrogram(x, filters)
    want = log_mel_spectrogram_np(x, filters)
    assert got.data.shape == want.data.shape
    assert got.n_len_org == want.n_len_org
    np.testing.assert_allclose(got.data, want.data, atol=2e-4)


def test_mel_silence(filters):
    x = np.zeros(16000, dtype=np.float32)
    got = log_mel_spectrogram(x, filters)
    # all-silence: every value is log10(1e-10), clamped to max-8=-18 -> (x+4)/4
    np.testing.assert_allclose(got.data, (-10.0 + 4.0) / 4.0, atol=1e-5)


def test_mel_tail_frames_constant(filters, rng):
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    got = log_mel_spectrogram(x, filters)
    # frames past the content cutoff are the normalized log10(1e-10) constant
    _, _, n_content = frame_counts(16000)
    tail = got.data[:, n_content + 1:]
    assert np.allclose(tail, tail[0, 0])


def test_mel_input_window(filters, rng):
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    m = log_mel_spectrogram(x, filters)
    win = mel_input_window(m, 0, n_ctx=1500)
    assert win.shape == (80, 3000)
    np.testing.assert_array_equal(win[:, :m.n_len if m.n_len < 3000 else 3000],
                                  m.data[:, :3000])
    if m.n_len < 3000:
        assert (win[:, m.n_len:] == 0).all()

    # offset beyond the end -> all zeros
    win2 = mel_input_window(m, m.n_len + 10, n_ctx=1500)
    assert (win2 == 0).all()
