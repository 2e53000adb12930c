"""WAV I/O (reference: examples/common.cpp read_wav :642-746 on top of the
vendored dr_wav.h — here a compact RIFF parser, numpy-vectorized).

Supports PCM 8/16/24/32-bit and IEEE float, mono or stereo (stereo is
averaged to mono like the reference). The engine consumes mono f32 @16 kHz.
"""

from __future__ import annotations

import struct
import wave

import numpy as np

from qwen2_audio_tpu.config import WHISPER_SAMPLE_RATE


def read_wav(path: str, expect_rate: int = WHISPER_SAMPLE_RATE,
             to_mono: bool = True) -> tuple[np.ndarray, int]:
    """Returns (samples float32 in [-1, 1], sample_rate).

    Raises ValueError if the file's rate differs from expect_rate
    (the reference refuses non-16 kHz input, common.cpp:683-686).
    Pass expect_rate=None to skip the check.
    """
    with open(path, "rb") as f:
        riff, _size, wave_id = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave_id != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        fmt_payload = b""
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, csize = struct.unpack("<4sI", hdr)
            payload = f.read(csize + (csize & 1))
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
                fmt_payload = payload
            elif cid == b"data":
                data = payload[:csize]
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")

    audio_format, n_channels, rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # real format tag = first two bytes of the SubFormat GUID at
        # offset 24 of the fmt payload (1 = PCM, 3 = IEEE float)
        if len(fmt_payload) >= 26:
            audio_format = struct.unpack("<H", fmt_payload[24:26])[0]
        else:
            raise ValueError(f"{path}: truncated WAVE_FORMAT_EXTENSIBLE fmt")

    if audio_format == 3:  # IEEE float
        if bits != 32:
            raise ValueError(f"{path}: unsupported float bit depth {bits}")
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_format == 1:
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            v = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            v = np.where(v & 0x800000, v - 0x1000000, v)
            x = v.astype(np.float32) / 8388608.0
        else:
            raise ValueError(f"{path}: unsupported bit depth {bits}")
    else:
        raise ValueError(f"{path}: unsupported WAV format {audio_format}")

    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels)
        x = x.mean(axis=1) if to_mono else x

    if expect_rate is not None and rate != expect_rate:
        raise ValueError(
            f"{path}: sample rate {rate} != required {expect_rate} Hz")
    return np.ascontiguousarray(x, dtype=np.float32), rate


def write_wav(path: str, samples: np.ndarray,
              rate: int = WHISPER_SAMPLE_RATE) -> None:
    """16-bit PCM mono writer (reference wav_writer, examples/common.h)."""
    samples = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    pcm = (samples * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
