"""Round-trip tests for the ggml-model.bin reader/writer."""

import io

import numpy as np
import pytest

from qwen2_audio_tpu.config import GGMLType, WhisperHParams
from qwen2_audio_tpu.io import GGMLTensor, read_ggml_file, write_ggml_file


def make_file(rng, ttype=GGMLType.F16):
    hp = WhisperHParams(n_vocab=64, n_audio_state=32, n_audio_head=4,
                        n_audio_layer=2, n_mels=8, ftype=1)
    filters = rng.standard_normal((8, 201)).astype(np.float32)
    vocab = [f"tok{i}".encode() for i in range(60)] + [b""]
    tensors = [
        GGMLTensor("embed_positions.weight", (1500, 32), GGMLType.F32,
                   rng.standard_normal((1500, 32)).astype(np.float32)),
        GGMLTensor("layers.0.fc1.weight", (128, 32), ttype,
                   rng.standard_normal((128, 32)).astype(
                       np.float16 if ttype == GGMLType.F16 else np.float32)),
    ]
    return hp, filters, vocab, tensors


def test_roundtrip_f16(rng):
    hp, filters, vocab, tensors = make_file(rng)
    buf = io.BytesIO()
    write_ggml_file(buf, hp, filters, vocab, tensors)
    buf.seek(0)
    m = read_ggml_file(buf)

    assert m.hparams.n_vocab == 64
    assert m.hparams.ftype == 1
    assert m.qntvr == 0
    np.testing.assert_array_equal(m.filters, filters)
    assert m.vocab == vocab
    assert set(m.tensors) == {"embed_positions.weight", "layers.0.fc1.weight"}
    t = m.tensors["embed_positions.weight"]
    assert t.shape == (1500, 32)
    np.testing.assert_array_equal(t.to_f32(), tensors[0].raw)
    t2 = m.tensors["layers.0.fc1.weight"]
    assert t2.ttype == GGMLType.F16
    np.testing.assert_array_equal(t2.to_f32(),
                                  tensors[1].raw.astype(np.float32))


def test_roundtrip_quantized(rng):
    from qwen2_audio_tpu.quant import codecs
    hp = WhisperHParams(ftype=2)  # MOSTLY_Q4_0
    w = rng.standard_normal((64, 32)).astype(np.float32)
    raw = codecs.quantize(w, GGMLType.Q4_0)
    tensors = [GGMLTensor("layers.0.fc2.weight", (64, 32), GGMLType.Q4_0, raw)]
    buf = io.BytesIO()
    write_ggml_file(buf, hp, np.zeros((80, 201), np.float32),
                    [b"a"], tensors, raw_ftype=2 + 2000)
    buf.seek(0)
    m = read_ggml_file(buf)
    assert m.qntvr == 2
    assert m.hparams.ftype == 2
    t = m.tensors["layers.0.fc2.weight"]
    assert t.ttype == GGMLType.Q4_0
    np.testing.assert_array_equal(t.raw, raw)
    got = t.to_f32()
    assert got.shape == (64, 32)
    np.testing.assert_allclose(
        got, codecs.dequantize(raw, GGMLType.Q4_0, w.size).reshape(64, 32))


def test_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        read_ggml_file(b"\x00\x00\x00\x00rest")
