"""Fused Pallas mel kernel vs the XLA reference path."""

import numpy as np
import pytest

from qwen2_audio_tpu.audio import mel_filterbank
from qwen2_audio_tpu.audio.mel import log_mel_spectrogram
from qwen2_audio_tpu.ops.mel_kernel import log_mel_spectrogram_fused


@pytest.fixture(scope="module")
def filters():
    return mel_filterbank(80)


@pytest.mark.parametrize("seconds", [1.0, 2.7, 30.0])
def test_fused_matches_reference(filters, seconds, rng):
    n = int(16000 * seconds)
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    want = log_mel_spectrogram(x, filters)
    got = log_mel_spectrogram_fused(x, filters)
    assert got.data.shape == want.data.shape
    assert got.n_len_org == want.n_len_org
    np.testing.assert_allclose(got.data, want.data, atol=3e-4)


def test_fused_silence(filters):
    got = log_mel_spectrogram_fused(np.zeros(16000, np.float32), filters)
    np.testing.assert_allclose(got.data, -1.5, atol=1e-5)


@pytest.mark.parametrize("seconds", [1.0, 30.0])
def test_mel_window_device_matches_host(filters, seconds, rng):
    """The device-resident encoder window (fused kernel + clamp/normalize
    /transpose in one jittable graph — the wav->embedding pipeline's mel
    stage) must equal host mel + mel_input_window at offset 0."""
    import jax.numpy as jnp
    from qwen2_audio_tpu.audio.mel import mel_input_window
    from qwen2_audio_tpu.ops.mel_kernel import (frame_rows, mel_tables,
                                                mel_window_device)
    n = int(16000 * seconds)
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    n_ctx = 1500
    want = mel_input_window(log_mel_spectrogram(x, filters), 0, n_ctx)

    rows, _n_len, _org, n_content = frame_rows(x)
    bc, bs, filt, n_mel = mel_tables(filters)
    got = np.asarray(mel_window_device(
        jnp.asarray(rows), bc, bs, filt,
        n_frames=2 * n_ctx, n_content=n_content, n_mels=n_mel))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_fused_128_mels(rng):
    filters = mel_filterbank(128)
    x = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    want = log_mel_spectrogram(x, filters)
    got = log_mel_spectrogram_fused(x, filters)
    np.testing.assert_allclose(got.data, want.data, atol=3e-4)
