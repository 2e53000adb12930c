"""Fused log-mel spectrogram Pallas kernel.

One kernel does framing + Hann window + 400-point DFT + power + mel
filterbank + log10 without materializing the (n_frames, 400) frame matrix in
HBM (the reference's threaded CPU pipeline src/qwen2-whisper.cpp:2402-2665
re-imagined for the MXU; the XLA fallback in audio/mel.py materializes
frames via gather).

Layout trick: with hop 160 and window 400, viewing the padded samples as
rows of 160 makes frame f exactly

    [row f | row f+1 | row f+2 (first 80)]

so a frame block is three sublane-shifted views of one VMEM buffer — no
gather. The Hann window is folded into the DFT bases (wcos/wsin), the DFT
and the filterbank are two MXU matmuls, bins are lane-padded 201 -> 256 and
mel channels to a multiple of 128.

The global max-8 clamp + (x+4)/4 normalization stay in XLA (they need the
max over all frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen2_audio_tpu.audio.mel import _dft_matrices, frame_counts, hann_window
from qwen2_audio_tpu.config import WHISPER_HOP_LENGTH, WHISPER_N_FFT

_BF = 256          # frames per block
_BINS_PAD = 256    # 201 rfft bins padded to lanes
_HOP = WHISPER_HOP_LENGTH


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


_ROW = 256         # samples per row: one hop (160) zero-padded to lanes


def _mel_kernel(rows_ref, bc_ref, bs_ref, filt_ref, o_ref, s_ref,
                sem, *, n_rows_total: int):
    i = pl.program_id(0)

    # DMA the BF+2 sample rows this block needs (+6 sublane alignment; rows
    # are lane-padded 160 -> 256 so the copy is fully tile-aligned;
    # overlapping reads between blocks make a plain BlockSpec impossible)
    row0 = i * _BF
    dma = pltpu.make_async_copy(
        rows_ref.at[pl.ds(row0, _BF + 8), :], s_ref, sem)
    dma.start()
    dma.wait()

    s = s_ref[...]                                   # (BF+8, 256)
    # frame f = [row f | row f+1 | row f+2 (:80)]: each row-shifted view is
    # contracted against its own zero-row-padded basis slice, so no lane
    # slicing or concatenation happens in the kernel at all — the padded
    # lanes (160:256) and padded basis rows contribute exact zeros
    hi = jax.lax.Precision.HIGHEST

    def dft(b_ref):
        return (jnp.dot(s[:_BF], b_ref[0],
                        preferred_element_type=jnp.float32, precision=hi)
                + jnp.dot(s[1:_BF + 1], b_ref[1],
                          preferred_element_type=jnp.float32, precision=hi)
                + jnp.dot(s[2:_BF + 2], b_ref[2],
                          preferred_element_type=jnp.float32, precision=hi))

    re = dft(bc_ref)
    im = dft(bs_ref)
    power = re * re + im * im                        # (BF, 256), bins>201 = 0

    mel = jnp.dot(power, filt_ref[...], preferred_element_type=jnp.float32,
                  precision=hi)                      # (BF, n_mel_pad)
    o_ref[...] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_content",))
def _mel_pallas(rows: jax.Array, bc: jax.Array, bs: jax.Array,
                filt: jax.Array, n_content: int) -> jax.Array:
    n_blocks = pl.cdiv(n_content, _BF)
    n_mel_pad = filt.shape[1]
    return pl.pallas_call(
        functools.partial(_mel_kernel, n_rows_total=rows.shape[0]),
        out_shape=jax.ShapeDtypeStruct((n_blocks * _BF, n_mel_pad),
                                       jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),        # rows stay in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BF, n_mel_pad), lambda i: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((_BF + 8, _ROW), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        interpret=_use_interpret(),
    )(rows, bc, bs, filt)


@functools.lru_cache(maxsize=4)
def _tables(n_mel_key: int, filters_bytes: bytes) -> tuple:
    filters = np.frombuffer(filters_bytes, np.float32).reshape(n_mel_key, -1)
    window = hann_window()
    cos_m, sin_m = _dft_matrices()
    n_bins = cos_m.shape[1]
    wcos = np.zeros((WHISPER_N_FFT, _BINS_PAD), np.float32)
    wsin = np.zeros((WHISPER_N_FFT, _BINS_PAD), np.float32)
    wcos[:, :n_bins] = window[:, None] * cos_m
    wsin[:, :n_bins] = window[:, None] * sin_m
    # split each 400-row basis into three (_ROW, bins) slices matching the
    # row-shifted frame views; rows beyond each slice's real span are zero
    def split3(w):
        out = np.zeros((3, _ROW, _BINS_PAD), np.float32)
        out[0, :_HOP] = w[:_HOP]
        out[1, :_HOP] = w[_HOP:2 * _HOP]
        out[2, :WHISPER_N_FFT - 2 * _HOP] = w[2 * _HOP:]
        return out
    n_mel = filters.shape[0]
    n_mel_pad = -(-n_mel // 128) * 128
    filt = np.zeros((_BINS_PAD, n_mel_pad), np.float32)
    filt[:n_bins, :n_mel] = filters.T
    return (jnp.asarray(split3(wcos)), jnp.asarray(split3(wsin)),
            jnp.asarray(filt), n_mel)


def frame_rows(samples: np.ndarray) -> tuple[np.ndarray, int, int, int]:
    """Host framing prep shared by the fused mel and the device pipeline:
    reflect-pad the front, lay samples out as lane-padded hop rows.
    Returns (rows (R, 256) f32, n_len, n_len_org, n_content)."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    n = samples.size
    pad_front = WHISPER_N_FFT // 2
    if n < 1 + pad_front:
        samples = np.pad(samples, (0, 1 + pad_front - n))

    n_len, n_len_org, n_content = frame_counts(n)
    if n_content <= 0:
        return np.zeros((0, _ROW), np.float32), n_len, n_len_org, 0

    n_blocks = -(-n_content // _BF)
    rows_needed = n_blocks * _BF + 8
    total = rows_needed * _HOP
    padded = np.zeros(total, np.float32)
    padded[:pad_front] = samples[1:pad_front + 1][::-1]
    m = min(samples.size, total - pad_front)
    padded[pad_front:pad_front + m] = samples[:m]
    rows = np.zeros((rows_needed, _ROW), np.float32)
    rows[:, :_HOP] = padded.reshape(-1, _HOP)   # lane-pad 160 -> 256
    return rows, n_len, n_len_org, n_content


@functools.partial(jax.jit, static_argnames=("n_frames", "n_content",
                                             "n_mels"))
def mel_window_device(rows: jax.Array, bc, bs, filt, *, n_frames: int,
                      n_content: int, n_mels: int) -> jax.Array:
    """DEVICE-RESIDENT encoder mel window: fused mel kernel + the global
    max-8 clamp + (x+4)/4 normalization + transpose, all in one jittable
    graph — no host round trip between mel and encoder (the composed
    wav->embedding pipeline; ≙ the reference's mel + encode phases,
    src/qwen2-whisper.cpp:2341-2383, minus its host staging copies).

    Returns (n_mels, n_frames) for window offset 0. Frames past
    ``n_content`` take the log10(1e-10) fill, exactly like the host path
    (audio/mel.py), so the clamp/normalize semantics match."""
    out = _mel_pallas(rows, bc, bs, filt, n_content)     # (R, n_mel_pad)
    if out.shape[0] < n_frames:
        out = jnp.pad(out, ((0, n_frames - out.shape[0]), (0, 0)),
                      constant_values=-10.0)
    m = out[:n_frames, :n_mels]
    k = min(n_content, n_frames)
    if k < n_frames:
        row = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
        m = jnp.where(row < k, m, jnp.float32(-10.0))
    mmax = jnp.max(m) - 8.0
    m = (jnp.maximum(m, mmax) + 4.0) / 4.0
    return m.T                                           # (n_mels, n_frames)


def mel_tables(filters: np.ndarray):
    """Public access to the precomputed DFT/filterbank device tables
    (memoized): (wcos, wsin, filt, n_mel)."""
    return _tables(filters.shape[0],
                   np.ascontiguousarray(filters, np.float32).tobytes())


def log_mel_spectrogram_fused(samples: np.ndarray, filters: np.ndarray):
    """Drop-in replacement for audio.mel.log_mel_spectrogram running the
    fused Pallas kernel; identical output layout and semantics."""
    from qwen2_audio_tpu.audio.mel import LogMelSpectrogram

    rows_np, n_len, n_len_org, n_content = frame_rows(samples)
    if n_content <= 0:
        data = np.full((filters.shape[0], n_len),
                       np.float32((-10.0 + 4.0) / 4.0), np.float32)
        return LogMelSpectrogram(data=data, n_len_org=n_len_org)
    rows = jnp.asarray(rows_np)

    bc, bs, filt, n_mel = _tables(filters.shape[0],
                                  np.ascontiguousarray(
                                      filters, np.float32).tobytes())

    out = np.asarray(_mel_pallas(rows, bc, bs, filt, n_content))
    data = np.full((n_len, filters.shape[0]),
                   np.float32(np.log10(1e-10)), np.float32)
    data[:n_content] = out[:n_content, :n_mel]

    mmax = data.max() - 8.0
    data = np.maximum(data, np.float32(mmax))
    data = (data + 4.0) / 4.0
    return LogMelSpectrogram(data=np.ascontiguousarray(data.T),
                             n_len_org=n_len_org)
