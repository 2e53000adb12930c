"""Log-mel spectrogram frontend.

Re-implements the reference's mel pipeline (src/qwen2-whisper.cpp:2402-2665)
TPU-first: instead of a threadpool of scalar FFT workers, the whole
frame/window/DFT/filterbank/log/normalize chain is one jitted XLA program of
MXU matmuls (the 400-point DFT is a (frames,400)x(400,402) matmul — far more
MXU-friendly at this size than an FFT butterfly).

Exact semantics carried over:
- Hann window: periodic, length 400         (:2428-2436)
- padding: 200-sample reflect at the front, 30 s of zeros + 200 at the end
                                            (:2596-2606)
- n_len   = (n + 480000) // 160             (:2611)
- n_len_org = 1 + trunc((n + 200 - 400)/160)  (:2613, C truncating division)
- frames whose window is entirely past the content are log10(1e-10) (:2566-2572)
- power -> mel filter -> log10(max(.,1e-10)) (:2538-2560)
- global max-8 clamp, (x+4)/4 normalization (:2633-2649)

Output layout matches the C `whisper_mel`: data[n_mel, n_len].
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import (
    WHISPER_HOP_LENGTH,
    WHISPER_N_FFT,
    WHISPER_SAMPLE_RATE,
)


@dataclasses.dataclass
class LogMelSpectrogram:
    """Mirror of `whisper_mel` (src/qwen2-whisper.cpp:402-410)."""

    data: np.ndarray        # (n_mel, n_len) float32, normalized
    n_len_org: int          # frames covering the real (unpadded) content

    @property
    def n_mel(self) -> int:
        return self.data.shape[0]

    @property
    def n_len(self) -> int:
        return self.data.shape[1]


def hann_window(n: int = WHISPER_N_FFT) -> np.ndarray:
    """Periodic Hann, float32 (reference fill_hann_window :2428-2436)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def _dft_matrices(n_fft: int = WHISPER_N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases restricted to the n_fft//2+1 real bins."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)
    t = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def frame_counts(n_samples: int) -> tuple[int, int, int]:
    """(n_len, n_len_org, n_content) for an input of n_samples."""
    stage_1_pad = WHISPER_SAMPLE_RATE * 30
    stage_2_pad = WHISPER_N_FFT // 2
    n_len = (n_samples + stage_1_pad) // WHISPER_HOP_LENGTH
    # C truncating division (negative operand possible for very short input)
    n_len_org = 1 + int(np.trunc((n_samples + stage_2_pad - WHISPER_N_FFT)
                                 / WHISPER_HOP_LENGTH))
    # frames that see any real content; the rest are exactly log10(1e-10)
    n_content = min((n_samples + stage_2_pad) // WHISPER_HOP_LENGTH + 1, n_len)
    return n_len, n_len_org, n_content


@functools.partial(jax.jit, static_argnames=("n_content",))
def _mel_content_frames(
    padded: jax.Array,            # (>= n_content*160 + 400,) float32
    filters: jax.Array,           # (n_mel, n_bins) float32
    window: jax.Array,            # (400,) float32
    cos_m: jax.Array,             # (400, n_bins)
    sin_m: jax.Array,
    n_content: int,
) -> jax.Array:
    """log10 mel energies for the frames that overlap real content.

    Returns (n_content, n_mel), un-normalized (pre max-8 clamp).
    """
    starts = jnp.arange(n_content) * WHISPER_HOP_LENGTH
    idx = starts[:, None] + jnp.arange(WHISPER_N_FFT)[None, :]
    frames = padded[idx] * window[None, :]
    # full f32 accumulation: TPU matmuls default to bf16 inputs otherwise,
    # which costs ~0.5% in the power spectrum and shifts the global max clamp
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_m, preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, sin_m, preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    mel = jnp.dot(power, filters.T, preferred_element_type=jnp.float32, precision=hi)
    return jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram(
    samples: np.ndarray,
    filters: np.ndarray,
) -> LogMelSpectrogram:
    """PCM f32 mono @16 kHz -> normalized log-mel, matching the C pipeline."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    n = samples.size
    if n < 1 + WHISPER_N_FFT // 2:
        # reference reads samples[1:201] for the reflect pad; zero-extend first
        samples = np.pad(samples, (0, 1 + WHISPER_N_FFT // 2 - n))
    stage_2_pad = WHISPER_N_FFT // 2

    n_len, n_len_org, n_content = frame_counts(n)

    front = samples[1:stage_2_pad + 1][::-1]
    tail = np.zeros(
        max(0, n_content * WHISPER_HOP_LENGTH + WHISPER_N_FFT - (stage_2_pad + n)),
        dtype=np.float32)
    padded = np.concatenate([front, samples, tail])

    window = hann_window()
    cos_m, sin_m = _dft_matrices()

    data = np.full((n_len, filters.shape[0]), np.float32(np.log10(1e-10)),
                   dtype=np.float32)
    if n_content > 0:
        content = np.asarray(_mel_content_frames(
            jnp.asarray(padded), jnp.asarray(filters, dtype=jnp.float32),
            jnp.asarray(window), jnp.asarray(cos_m), jnp.asarray(sin_m),
            n_content))
        data[:n_content] = content

    # global clamp + normalize (reference :2633-2649, in double)
    mmax = data.max() - 8.0
    data = np.maximum(data, np.float32(mmax))
    data = (data + 4.0) / 4.0

    return LogMelSpectrogram(data=np.ascontiguousarray(data.T), n_len_org=n_len_org)


def log_mel_spectrogram_np(samples: np.ndarray, filters: np.ndarray) -> LogMelSpectrogram:
    """Pure-numpy oracle following the C loop structure (for tests)."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    n = samples.size
    stage_2_pad = WHISPER_N_FFT // 2
    n_len, n_len_org, _ = frame_counts(n)
    n_mel = filters.shape[0]

    padded = np.concatenate([
        samples[1:stage_2_pad + 1][::-1],
        samples,
        np.zeros(WHISPER_SAMPLE_RATE * 30 + stage_2_pad, dtype=np.float32),
    ])
    window = hann_window()

    data = np.empty((n_mel, n_len), dtype=np.float32)
    n_valid = n + stage_2_pad  # worker's n_samples argument (:2622-2628)
    cutoff = min(n_valid // WHISPER_HOP_LENGTH + 1, n_len)
    for i in range(n_len):
        if i >= cutoff:
            data[:, i] = np.log10(1e-10)
            continue
        off = i * WHISPER_HOP_LENGTH
        frame = padded[off:off + WHISPER_N_FFT] * window
        spec = np.fft.rfft(frame.astype(np.float64))
        power = (spec.real ** 2 + spec.imag ** 2).astype(np.float64)
        mel = filters.astype(np.float64) @ power
        data[:, i] = np.log10(np.maximum(mel, 1e-10))

    mmax = data.max() - 8.0
    data = np.maximum(data, mmax)
    data = ((data + 4.0) / 4.0).astype(np.float32)
    return LogMelSpectrogram(data=data, n_len_org=n_len_org)


def mel_input_window(mel: LogMelSpectrogram, mel_offset: int, n_ctx: int) -> np.ndarray:
    """Slice the 2*n_ctx-frame window fed to the conv stem, zero-padded at the
    tail (reference whisper_encode_qwen2_internal :2261-2285)."""
    out = np.zeros((mel.n_mel, 2 * n_ctx), dtype=np.float32)
    i0 = min(mel_offset, mel.n_len)
    i1 = min(mel_offset + 2 * n_ctx, mel.n_len)
    out[:, :i1 - i0] = mel.data[:, i0:i1]
    return out
