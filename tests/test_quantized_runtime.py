"""Quantized checkpoints running through the Pallas quant-matmul path
(keep_quantized=True) vs the dense dequant path — the logits-parity
criterion at the runtime level (BASELINE config #3)."""

import io

import numpy as np
import pytest

from qwen2_audio_tpu.audio import mel_filterbank
from qwen2_audio_tpu.config import GGMLFType, WhisperHParams
from qwen2_audio_tpu.io.export import quantize_checkpoint, write_encoder_checkpoint
from qwen2_audio_tpu.models.encoder import random_encoder_params
from qwen2_audio_tpu.runtime import ContextParams, WhisperContext, full_default_params

HP = WhisperHParams(n_vocab=64, n_audio_ctx=256, n_audio_state=64,
                    n_audio_head=4, n_audio_layer=2, n_mels=16)


@pytest.fixture(scope="module", params=[GGMLFType.MOSTLY_Q8_0,
                                        GGMLFType.MOSTLY_Q4_0])
def quantized_buf(request, tmp_path_factory):
    rng = np.random.default_rng(0)
    src = io.BytesIO()
    write_encoder_checkpoint(src, random_encoder_params(rng, HP), HP,
                             mel_filterbank(HP.n_mels), [b"x"] * 60)
    src.seek(0)
    dst = io.BytesIO()
    quantize_checkpoint(src, dst, request.param)
    return dst.getvalue()


def test_quant_kernel_path_matches_dense_dequant(quantized_buf, rng):
    samples = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)

    dense = WhisperContext.init_from_buffer_with_params(
        quantized_buf, ContextParams(keep_quantized=False))
    assert dense.full(full_default_params(), samples) == 0

    qkern = WhisperContext.init_from_buffer_with_params(
        quantized_buf, ContextParams(keep_quantized=True))
    # the quantized layer weights are stored as block dicts
    assert {"qs", "qs4"} & set(qkern.encoder_params["layers"][0]["qkv"])
    assert "w" not in qkern.encoder_params["layers"][0]["qkv"]
    # conv/norm/pos stay dense
    assert "w" in qkern.encoder_params["conv1"]
    assert qkern.full(full_default_params(), samples) == 0

    # identical dequantized values -> near-identical outputs (kernel
    # accumulation order differs from the dense XLA matmul)
    np.testing.assert_allclose(qkern.state.embd_enc, dense.state.embd_enc,
                               atol=2e-3, rtol=1e-3)


def test_q4_sym_default_engages_through_loader():
    """The symmetric q4_0 default (no mins leaf; e2e +6.3% on chip, r4
    queue I) must engage on the public checkpoint-load path: quantize to
    MOSTLY_Q4_0, load keep_quantized, and the packed dicts carry exactly
    {qs4, scales} (+bias) — then full() still transcribes."""
    rng = np.random.default_rng(3)
    src = io.BytesIO()
    write_encoder_checkpoint(src, random_encoder_params(rng, HP), HP,
                             mel_filterbank(HP.n_mels), [b"x"] * 60)
    src.seek(0)
    dst = io.BytesIO()
    quantize_checkpoint(src, dst, GGMLFType.MOSTLY_Q4_0)
    ctx = WhisperContext.init_from_buffer_with_params(
        dst.getvalue(), ContextParams(keep_quantized=True))
    qkv = ctx.encoder_params["layers"][0]["qkv"]
    assert "qs4" in qkv and "mins" not in qkv, sorted(qkv)
    samples = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    assert ctx.full(full_default_params(), samples) == 0


def test_q4_i8_stream_default_engages_through_loader(monkeypatch):
    """The int8-stored nibble stream is the production q4_0 default (e2e
    116.9 vs 112.2 tok/s u8 on 7B --panel, r4g/r5a grid): on the public
    checkpoint-load path the packed payload must come out int8-typed with
    NO mins leaf — and full() still transcribes. (On TPU the default
    additionally gates on the qmm_q4i8 hardware-validation marker; CPU is
    unconditional, which is what this suite runs.)"""
    monkeypatch.delenv("QA_Q4_I8", raising=False)
    rng = np.random.default_rng(4)
    src = io.BytesIO()
    write_encoder_checkpoint(src, random_encoder_params(rng, HP), HP,
                             mel_filterbank(HP.n_mels), [b"x"] * 60)
    src.seek(0)
    dst = io.BytesIO()
    quantize_checkpoint(src, dst, GGMLFType.MOSTLY_Q4_0)
    ctx = WhisperContext.init_from_buffer_with_params(
        dst.getvalue(), ContextParams(keep_quantized=True))
    qkv = ctx.encoder_params["layers"][0]["qkv"]
    assert "qs4" in qkv and "mins" not in qkv, sorted(qkv)
    assert np.dtype(qkv["qs4"].dtype) == np.int8, qkv["qs4"].dtype
    samples = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    assert ctx.full(full_default_params(), samples) == 0
