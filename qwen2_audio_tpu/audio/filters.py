"""Slaney-normalized mel filterbank, equivalent to the `mel_filters.npz` asset
the reference converter embeds into ggml-model.bin
(models/convert-pt-to-ggml.py:219-222; those npz files are generated with
librosa.filters.mel(sr=16000, n_fft=400, norm="slaney", htk=False)).

Generating the bank directly removes the dependency on the openai/whisper
repo checkout the converter requires.
"""

from __future__ import annotations

import numpy as np


def _hz_to_mel(freq: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


def mel_filterbank(
    n_mels: int = 80,
    n_fft: int = 400,
    sample_rate: int = 16000,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft // 2 + 1), float32.

    Matches librosa's slaney-norm filterbank, which is what whisper's
    mel_filters.npz contains for mel_80 / mel_128.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)

    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: each filter integrates to ~1 in Hz
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]

    return weights.astype(np.float32)


def resample(x: np.ndarray, sr_in: int, sr_out: int, *, width: int = 32,
             beta: float = 8.6) -> np.ndarray:
    """Windowed-sinc resampler (Kaiser window), numpy-vectorized.

    Role parity: the reference's ffmpeg input path transcodes any source
    rate to 16 kHz before the mel stage (examples/common.cpp:677-683 via
    ffmpeg_decode_audio); this is the in-process equivalent for mp3 and
    other non-16 kHz sources. Direct evaluation of the interpolation
    kernel at each output instant (no rational L/M factorization needed):
    anti-aliasing cutoff at min(sr_in, sr_out)/2, ``width`` taps per side.
    """
    if sr_in == sr_out or x.size == 0:
        return np.asarray(x, np.float32)
    x = np.asarray(x, np.float32)
    ratio = sr_out / sr_in
    c = min(1.0, ratio)                      # cutoff in input-Nyquist units
    n_out = int(round(x.shape[0] * ratio))
    t = np.arange(n_out, dtype=np.float64) / ratio   # output instants, input units
    i0 = np.floor(t).astype(np.int64)
    frac = (t - i0).astype(np.float32)
    k = np.arange(-width + 1, width + 1, dtype=np.float32)   # (2W,)
    u = k[None, :] - frac[:, None]                           # (n_out, 2W)
    kern = c * np.sinc(c * u)
    kern *= np.i0(beta * np.sqrt(np.maximum(
        0.0, 1.0 - (u / width) ** 2))) / np.i0(beta)
    idx = np.clip(i0[:, None] + k.astype(np.int64)[None, :], 0,
                  x.shape[0] - 1)
    y = np.einsum("ot,ot->o", x[idx], kern, optimize=True)
    return y.astype(np.float32)
