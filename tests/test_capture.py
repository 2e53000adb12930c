"""Pipe/stdin PCM capture source (audio/capture.py).

TPU-native stand-in for the reference's SDL microphone loop
(/root/reference/examples/common-sdl.cpp:1-229 audio_async): a blocking
chunk reader over a pipe carries the same capture-loop shape in this
no-audio-device environment. The e2e test drives examples/stream.py with
raw s16le PCM on stdin — the `arecord | stream` usage from its docstring.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from qwen2_audio_tpu.audio.capture import (
    decode_pcm,
    is_pipe_source,
    pcm_chunks,
)


def test_decode_pcm_s16le_roundtrip():
    x = np.array([0, 16384, -16384, 32767, -32768], np.int16)
    f = decode_pcm(x.tobytes(), "s16le")
    assert f.dtype == np.float32
    np.testing.assert_allclose(
        f, [0.0, 0.5, -0.5, 32767 / 32768.0, -1.0], atol=1e-7)


def test_decode_pcm_f32le_passthrough():
    x = np.array([0.25, -1.0, 0.5], np.float32)
    np.testing.assert_array_equal(decode_pcm(x.tobytes(), "f32le"), x)


def test_decode_pcm_unknown_format():
    with pytest.raises(ValueError, match="unknown PCM format"):
        decode_pcm(b"\x00\x00", "u8")


def test_pcm_chunks_sizes_and_eof_tail():
    # 16 kHz, 100 ms chunks = 1600 samples; feed 2.5 chunks worth
    rate, ms = 16000, 100
    n = 1600 * 2 + 800
    pcm = (np.linspace(-1, 1, n) * 1000).astype("<i2").tobytes()
    got = list(pcm_chunks(io.BytesIO(pcm), rate=rate, chunk_ms=ms))
    assert [len(g) for g in got] == [1600, 1600, 800]


def test_pcm_chunks_drops_partial_trailing_sample():
    # 3 full samples + 1 stray byte: the stray byte cannot decode
    pcm = np.array([1, 2, 3], "<i2").tobytes() + b"\x7f"
    got = list(pcm_chunks(io.BytesIO(pcm), rate=16000, chunk_ms=1000))
    assert len(got) == 1 and len(got[0]) == 3


def test_pcm_chunks_short_reads(tmp_path):
    """Pipes hand read() whatever is buffered; the reader must loop to
    fill a chunk (the ring-buffer-accumulate role of audio_async's
    capture callback)."""

    class Dribble(io.RawIOBase):
        def __init__(self, data):
            self.data, self.off = data, 0

        def read(self, n=-1):
            if self.off >= len(self.data):
                return b""
            take = min(7, n if n > 0 else 7)   # never a full chunk at once
            b = self.data[self.off:self.off + take]
            self.off += len(b)
            return b

    pcm = np.arange(3200, dtype="<i2").tobytes()
    got = list(pcm_chunks(Dribble(pcm), rate=16000, chunk_ms=100))
    assert [len(g) for g in got] == [1600, 1600]
    np.testing.assert_array_equal(
        np.concatenate(got) * 32768.0, np.arange(3200, dtype=np.float32))


def test_is_pipe_source(tmp_path):
    assert is_pipe_source("-")
    assert not is_pipe_source(str(tmp_path / "missing.wav"))
    reg = tmp_path / "a.wav"
    reg.write_bytes(b"RIFF")
    assert not is_pipe_source(str(reg))
    fifo = str(tmp_path / "mic.fifo")
    os.mkfifo(fifo)
    assert is_pipe_source(fifo)


def test_pcm_chunks_reads_fifo(tmp_path):
    """Named-pipe source end to end: writer process feeds the FIFO while
    pcm_chunks blocks on it — the live-capture topology."""
    fifo = str(tmp_path / "mic.fifo")
    os.mkfifo(fifo)
    pcm = np.arange(4800, dtype="<i2").tobytes()
    # the CHILD opens the FIFO write end (an open("wb") here would block
    # until the read end exists — classic FIFO deadlock)
    writer = subprocess.Popen(
        [sys.executable, "-c",
         "import sys\n"
         "with open(sys.argv[1], 'wb') as f:\n"
         "    f.write(sys.stdin.buffer.read())\n", fifo],
        stdin=subprocess.PIPE)
    writer.stdin.write(pcm)
    writer.stdin.close()
    try:
        got = list(pcm_chunks(fifo, rate=16000, chunk_ms=100))
    finally:
        writer.wait(timeout=30)
    assert [len(g) for g in got] == [1600, 1600, 1600]


def test_stream_example_stdin_pipe(tmp_path):
    """e2e: raw s16le PCM piped into examples/stream.py '-' transcribes
    through the same VAD/flush path as the file source (encoder-only
    tiny model -> '<encoded ...>' segment lines)."""
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params

    hp = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_mels=16)
    model = str(tmp_path / "model.bin")
    write_encoder_checkpoint(model,
                             random_encoder_params(np.random.default_rng(0),
                                                   hp),
                             hp, mel_filterbank(hp.n_mels),
                             [b"t%d" % i for i in range(60)])

    # 2 s of tone then 1 s of near-silence so vad_simple fires a flush
    rate = 16000
    t = np.arange(2 * rate) / rate
    tone = 0.3 * np.sin(2 * np.pi * 330 * t)
    quiet = np.zeros(rate, np.float32)
    pcm = np.clip(np.concatenate([tone, quiet]) * 32768.0,
                  -32768, 32767).astype("<i2").tobytes()

    r = subprocess.run(
        [sys.executable, "examples/stream.py", model, "-"],
        input=pcm, capture_output=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
        timeout=300)
    assert r.returncode == 0, r.stderr.decode()
    out = r.stdout.decode()
    assert "<encoded" in out, out
