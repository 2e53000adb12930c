"""Quant codec tests: block layout sizes, round-trip error bounds, and
scalar oracles transcribing the exact C semantics
(ggml/src/ggml-quants.c quantize_row_*_ref)."""

import numpy as np
import pytest

from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.quant import codecs

ALL_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0]


def scalar_q4_0(x):
    """Literal transcription of quantize_row_q4_0_ref for oracle checking."""
    x = x.reshape(-1, 32)
    out = []
    for blk in x:
        amax, maxv = 0.0, 0.0
        for v in blk:
            if amax < abs(v):
                amax, maxv = abs(v), v
        d = maxv / -8.0
        inv = 1.0 / d if d else 0.0
        bs = bytearray(np.float16(d).tobytes())
        for j in range(16):
            x0 = np.float32(blk[j] * inv) + np.float32(8.5)
            x1 = np.float32(blk[j + 16] * inv) + np.float32(8.5)
            xi0 = min(15, int(x0))
            xi1 = min(15, int(x1))
            bs.append(xi0 | (xi1 << 4))
        out.append(bytes(bs))
    return np.frombuffer(b"".join(out), dtype=np.uint8)


def scalar_q8_0(x):
    """Literal transcription of quantize_row_q8_0_ref (roundf = half away from 0)."""
    import math
    x = x.reshape(-1, 32)
    out = []
    for blk in x:
        amax = max(abs(v) for v in blk)
        d = amax / 127.0
        inv = 1.0 / d if d else 0.0
        qs = []
        for v in blk:
            s = float(np.float32(v * inv))
            qs.append(int(math.floor(abs(s) + 0.5) * (1 if s >= 0 else -1)))
        out.append(bytes(np.float16(d).tobytes()
                         + np.array(qs, dtype=np.int8).tobytes()))
    return np.frombuffer(b"".join(out), dtype=np.uint8)


def test_q4_0_matches_scalar_oracle(rng):
    x = rng.standard_normal(32 * 17).astype(np.float32)
    got = codecs.quantize_q4_0(x)
    want = scalar_q4_0(x)
    np.testing.assert_array_equal(got, want)


def test_q8_0_matches_scalar_oracle(rng):
    x = rng.standard_normal(32 * 17).astype(np.float32)
    got = codecs.quantize_q8_0(x)
    want = scalar_q8_0(x)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_block_bytes(ttype, rng):
    x = rng.standard_normal(32 * 5).astype(np.float32)
    raw = codecs.quantize(x, ttype)
    assert raw.size == 5 * codecs.BLOCK_BYTES[ttype]
    assert raw.size == codecs.type_size_bytes(ttype, x.size)


@pytest.mark.parametrize("ttype,max_rel", [
    (GGMLType.Q4_0, 0.20), (GGMLType.Q4_1, 0.12),
    (GGMLType.Q5_0, 0.10), (GGMLType.Q5_1, 0.06), (GGMLType.Q8_0, 0.01),
])
def test_roundtrip_error(ttype, max_rel, rng):
    x = rng.standard_normal(32 * 64).astype(np.float32)
    y = codecs.dequantize(codecs.quantize(x, ttype), ttype, x.size)
    rms = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x ** 2))
    assert rms < max_rel, f"{ttype}: rms rel err {rms}"


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_requantize_is_stable(ttype, rng):
    """quantize(dequantize(quantize(x))) == quantize(x) byte-for-byte."""
    x = rng.standard_normal(32 * 8).astype(np.float32)
    raw1 = codecs.quantize(x, ttype)
    y = codecs.dequantize(raw1, ttype, x.size)
    raw2 = codecs.quantize(y, ttype)
    np.testing.assert_array_equal(raw1, raw2)


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_zero_block(ttype):
    x = np.zeros(64, dtype=np.float32)
    y = codecs.dequantize(codecs.quantize(x, ttype), ttype, 64)
    np.testing.assert_allclose(y, 0.0, atol=1e-7)


def test_q4_0_nibble_layout(rng):
    """Element j pairs with j+16 in one byte (ggml-common.h:144-149)."""
    x = np.zeros(32, dtype=np.float32)
    x[0] = -8.0   # becomes the signed absmax -> d = 1.0, q = 0
    x[16] = 7.0   # q = 15
    raw = codecs.quantize_q4_0(x)
    d = raw[:2].view(np.float16)[0]
    assert d == np.float16(1.0)
    assert raw[2] & 0x0F == 0
    assert raw[2] >> 4 == 15


def test_kquant_roundtrip_bounds(rng):
    """All five k-quants: 256-super-block codecs stay inside the expected
    error envelope and byte budget (block sizes from ggml-common.h)."""
    from qwen2_audio_tpu.quant import codecs
    from qwen2_audio_tpu.config import GGMLType
    x = (rng.standard_normal(8 * 256) * 0.2).astype(np.float32)
    for t, bpb, tol in ((GGMLType.Q2_K, 84, 0.45),
                        (GGMLType.Q3_K, 110, 0.25),
                        (GGMLType.Q4_K, 144, 0.08),
                        (GGMLType.Q5_K, 176, 0.05),
                        (GGMLType.Q6_K, 210, 0.03)):
        raw = codecs.quantize(x, t)
        assert raw.size == 8 * bpb
        assert codecs.type_size_bytes(t, x.size) == raw.size
        y = codecs.dequantize(raw, t, x.size)
        rel = np.abs(y - x).max() / np.abs(x).max()
        assert rel < tol, (t, rel)


def test_kquant_double_roundtrip_bounded(rng):
    """A second quantize∘dequantize round does not compound the error
    beyond the first round's envelope. (Exact idempotence does NOT hold —
    ggml's own search re-picks scales on requantized data; verified the
    second-pass bytes still match the reference oracle.)"""
    from qwen2_audio_tpu.quant import codecs
    from qwen2_audio_tpu.config import GGMLType
    x = (rng.standard_normal(4 * 256) * 1.3).astype(np.float32)
    for t in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
              GGMLType.Q5_K, GGMLType.Q6_K):
        y = codecs.dequantize(codecs.quantize(x, t), t, x.size)
        y2 = codecs.dequantize(codecs.quantize(y, t), t, x.size)
        e1 = np.abs(y - x).max()
        e2 = np.abs(y2 - x).max()
        assert e2 <= 2.0 * e1 + 1e-6, (t, e1, e2)


def test_kquant_device_weight_bit_exact(rng):
    """q4_K / q5_K device dicts (32-group scales+mins) dequantize
    bit-exactly to the codec dequantization — the parity invariant the
    matmul rests on."""
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.io.ggml_format import GGMLTensor
    from qwen2_audio_tpu.ops.quant_matmul import dequantize_weight, quant_linear
    from qwen2_audio_tpu.quant import codecs
    from qwen2_audio_tpu.quant.qparams import device_weight_from_ggml_tensor
    N, K = 16, 512   # torch [out, in]; K % 256 == 0
    for t in (GGMLType.Q4_K, GGMLType.Q5_K):
        w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
        raw = codecs.quantize(w, t)
        gt = GGMLTensor("w", (N, K), t, raw)
        qw = device_weight_from_ggml_tensor(gt)
        assert "mins" in qw and qw["scales"].shape == (K // 32, N)

        want = codecs.dequantize(raw, t, w.size).reshape(N, K).T
        got = np.asarray(dequantize_weight(qw))
        np.testing.assert_array_equal(got, want, err_msg=str(t))

        x = rng.standard_normal((4, K)).astype(np.float32)
        y = np.asarray(quant_linear(jnp.asarray(x), qw))
        np.testing.assert_allclose(y, x @ want, atol=2e-3, rtol=1e-3,
                                   err_msg=str(t))


@pytest.mark.parametrize("ftype_name", ["Q2_K", "Q3_K", "Q4_K", "Q5_K",
                                         "Q6_K"])
def test_quantize_checkpoint_kquants(ftype_name):
    """The quantize tool re-encodes 2-D weights to each k-quant
    (256-divisible rows, q8_0 fallback otherwise, like llama.cpp) — then
    the checkpoint loads and runs end-to-end."""
    import io as _io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import GGMLFType, GGMLType, WhisperHParams
    from qwen2_audio_tpu.io.export import quantize_checkpoint, write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=256, n_audio_state=256,
                        n_audio_head=4, n_audio_layer=1, n_mels=16)
    params = random_encoder_params(np.random.default_rng(0), hp)
    buf = _io.BytesIO()
    write_encoder_checkpoint(buf, params, hp, mel_filterbank(16),
                             [b"x"] * 60)
    buf.seek(0)
    out = _io.BytesIO()
    result = quantize_checkpoint(buf, out,
                                 GGMLFType[f"MOSTLY_{ftype_name}"])
    assert GGMLType[ftype_name] in set(result.values())

    ctx = WhisperContext.init_from_buffer_with_params(out.getvalue())
    rc = ctx.full(full_default_params(),
                  (0.1 * np.random.default_rng(1).standard_normal(32000)
                   ).astype(np.float32))
    assert rc == 0


def test_codec_oracle_vs_reference_libggml():
    """Byte-level bit-exactness vs the reference's OWN ggml-quants.c
    (strict-FP compile; see tools/crosscheck_ggml.py --codec-oracle).
    Skips when the CPU cmake build of the reference is absent."""
    import os
    import pytest
    if not os.path.exists("/tmp/ggml_cpu_build/ggml/src/libggml.so"):
        pytest.skip("reference CPU build missing (cmake -DGGML_CUDA=OFF)")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from crosscheck_ggml import build_codec_oracle, run_codec_oracle
    assert run_codec_oracle(build_codec_oracle()) == 0
