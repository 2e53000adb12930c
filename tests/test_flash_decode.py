"""flash_decode (decode-step attention over the KV cache) vs the XLA
einsum reference paths in models/qwen2_decoder.py — interpret mode on the
CPU test mesh; hardware validation lives in tools/validate_tpu_kernels.py."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from qwen2_audio_tpu.models.qwen2_decoder import (_gqa_attention,
                                                  _gqa_attention_quant,
                                                  _quantize_kv)
from qwen2_audio_tpu.ops.flash_decode import flash_decode, flash_decode_quant


def _mk(rng, B, S, Hq, Hkv, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("B,S,Hq,Hkv,pos", [
    (1, 256, 12, 2, 255),        # full cache valid
    (1, 256, 12, 2, 17),         # short prefix inside first block
    (2, 640, 8, 4, 500),         # non-power-of-two S, partial block
    (1, 128, 4, 4, 64),          # MHA (g = 1)
    (1, 96, 28, 4, 95),          # S smaller than one block, g = 7 (7B shape)
])
def test_flash_decode_matches_einsum(B, S, Hq, Hkv, pos):
    rng = np.random.default_rng(0)
    d = 128
    q, k, v = _mk(rng, B, S, Hq, Hkv, d)
    want = _gqa_attention(q, k, v, pos, S)                # (B, 1, Hq*d)
    got = flash_decode(q[:, 0], k, v, jnp.full((B,), pos, jnp.int32),
                       sm_scale=d ** -0.5, block_k=256)
    np.testing.assert_allclose(np.asarray(got).reshape(B, -1),
                               np.asarray(want)[:, 0], rtol=2e-5, atol=2e-5)


def test_flash_decode_per_stream_positions():
    """Continuous batching: every stream at its own depth."""
    rng = np.random.default_rng(1)
    B, S, Hq, Hkv, d = 4, 384, 8, 2, 128
    q, k, v = _mk(rng, B, S, Hq, Hkv, d)
    pos = jnp.asarray([3, 127, 128, 383], jnp.int32)
    want = _gqa_attention(q, k, v, pos, S)
    got = flash_decode(q[:, 0], k, v, pos, sm_scale=d ** -0.5, block_k=128)
    np.testing.assert_allclose(np.asarray(got).reshape(B, -1),
                               np.asarray(want)[:, 0], rtol=2e-5, atol=2e-5)


def test_flash_decode_quant_matches_quant_einsum():
    rng = np.random.default_rng(2)
    B, S, Hq, Hkv, d = 2, 320, 12, 2, 128
    q, k, v = _mk(rng, B, S, Hq, Hkv, d)
    k_q, k_s = _quantize_kv(k)
    v_q, v_s = _quantize_kv(v)
    pos = jnp.asarray([100, 319], jnp.int32)
    want = _gqa_attention_quant(q, k_q, k_s, v_q, v_s, pos)
    got = flash_decode_quant(q[:, 0], k_q, k_s, v_q, v_s, pos,
                             sm_scale=d ** -0.5, block_k=128)
    np.testing.assert_allclose(np.asarray(got).reshape(B, -1),
                               np.asarray(want)[:, 0], rtol=2e-4, atol=2e-4)


def test_flash_decode_reads_only_valid_prefix():
    """Junk (NaN/huge) past the valid prefix must not leak into the
    output — the masked/unfetched region is never part of the softmax."""
    rng = np.random.default_rng(3)
    B, S, Hq, Hkv, d = 1, 512, 8, 2, 128
    q, k, v = _mk(rng, B, S, Hq, Hkv, d)
    pos = 200
    kj = k.at[:, pos + 1:].set(jnp.nan)
    vj = v.at[:, pos + 1:].set(1e30)
    want = _gqa_attention(q, k, v, pos, S)
    got = flash_decode(q[:, 0], kj, vj, jnp.full((B,), pos, jnp.int32),
                       sm_scale=d ** -0.5, block_k=128)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got).reshape(B, -1),
                               np.asarray(want)[:, 0], rtol=2e-5, atol=2e-5)


def test_flash_decode_bf16():
    rng = np.random.default_rng(4)
    B, S, Hq, Hkv, d = 1, 256, 12, 2, 128
    q, k, v = _mk(rng, B, S, Hq, Hkv, d, dtype=jnp.bfloat16)
    pos = 200
    want = np.asarray(_gqa_attention(q, k, v, pos, S), np.float32)
    got = np.asarray(
        flash_decode(q[:, 0], k, v, jnp.full((B,), pos, jnp.int32),
                     sm_scale=d ** -0.5), np.float32).reshape(B, -1)
    np.testing.assert_allclose(got, want[:, 0], rtol=3e-2, atol=3e-2)


def _run_decode_steps(monkeypatch, flag):
    """Prefill + 3 decode steps of a d=128 decoder with the flash-decode
    gate forced on/off; returns the final-step logits."""
    import jax

    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (create_cache,
                                                      decoder_forward,
                                                      random_decoder_params)
    monkeypatch.setenv("QA_FLASH_DECODE", flag)
    # the gate is read at trace time; drop compiled programs between flips
    decoder_forward.clear_cache()
    cfg = Qwen2DecoderConfig(
        vocab_size=64, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, tie_word_embeddings=False)
    rng = np.random.default_rng(7)
    params = random_decoder_params(rng, cfg)
    outs = {}
    for cache_dtype in (jnp.float32, "q8"):
        cache = create_cache(cfg, 2, 160, dtype=cache_dtype)
        x = jnp.asarray(rng.standard_normal((2, 9, 256)) * 0.1, jnp.float32)
        logits, cache = decoder_forward(params, cfg, x, cache, 0,
                                        block_only=True,
                                        logits_last_only=True)
        for i in range(3):
            step = jnp.asarray(
                np.random.default_rng(20 + i).standard_normal(
                    (2, 1, 256)) * 0.1, jnp.float32)
            logits, cache = decoder_forward(params, cfg, step, cache, 9 + i)
        outs[str(cache_dtype)] = np.asarray(logits, np.float32)
    decoder_forward.clear_cache()
    jax.clear_caches()
    return outs


def test_decoder_step_flash_matches_einsum(monkeypatch):
    """decoder_forward decode steps: flash-decode path == einsum path,
    for both the bf16/f32 cache and the int8 quant cache."""
    on = _run_decode_steps(monkeypatch, "1")
    off = _run_decode_steps(monkeypatch, "0")
    for key in off:
        np.testing.assert_allclose(on[key], off[key], rtol=2e-4, atol=2e-4)


def test_generate_on_device_flash_matches(monkeypatch):
    """Full while_loop generation with the kernel inside the loop body."""
    import jax

    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    from qwen2_audio_tpu.runtime.generate import generate_on_device

    cfg = Qwen2DecoderConfig(
        vocab_size=64, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, tie_word_embeddings=False)
    params = random_decoder_params(np.random.default_rng(11), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(12).standard_normal((1, 6, 256)) * 0.1,
        jnp.float32)
    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("QA_FLASH_DECODE", flag)
        generate_on_device.clear_cache()
        from qwen2_audio_tpu.models.qwen2_decoder import decoder_forward
        decoder_forward.clear_cache()
        toks, lps, count, _, _ = generate_on_device(
            params, cfg, prefill, None, max_new_tokens=8,
            eos_token_id=63, cache_max_ctx=32)
        results[flag] = (np.asarray(toks), int(count))
        jax.clear_caches()
    np.testing.assert_array_equal(results["1"][0], results["0"][0])
    assert results["1"][1] == results["0"][1]


def test_decode_chunk_slots_flash_matches(monkeypatch):
    """Continuous-batching chunk decode (fori_loop + per-slot positions):
    flash-decode path == einsum path."""
    import jax

    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (create_cache,
                                                      decoder_forward,
                                                      random_decoder_params)
    from qwen2_audio_tpu.runtime.generate import (decode_chunk_slots,
                                                  prefill_slot)

    cfg = Qwen2DecoderConfig(
        vocab_size=64, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=128, tie_word_embeddings=False)
    params = random_decoder_params(np.random.default_rng(21), cfg)
    pre_a = jnp.asarray(
        np.random.default_rng(22).standard_normal((1, 5, 256)) * 0.1,
        jnp.float32)
    pre_b = jnp.asarray(
        np.random.default_rng(23).standard_normal((1, 9, 256)) * 0.1,
        jnp.float32)
    out = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("QA_FLASH_DECODE", flag)
        decoder_forward.clear_cache()
        prefill_slot.clear_cache()
        decode_chunk_slots.clear_cache()
        cache = create_cache(cfg, 2, 64, dtype=jnp.float32)
        slot_pos = jnp.zeros((2,), jnp.int32)
        slot_logits = jnp.zeros((2, cfg.vocab_size), jnp.float32)
        slot_active = jnp.zeros((2,), bool)
        for s, pre in enumerate((pre_a, pre_b)):
            cache, slot_pos, slot_logits, slot_active = prefill_slot(
                params, cfg, cache, slot_pos, slot_logits, slot_active,
                jnp.int32(s), pre)
        cache, slot_pos, slot_logits, slot_active, toks, lps = \
            decode_chunk_slots(params, cfg, cache, slot_pos, slot_logits,
                               slot_active, chunk=6, eos_token_id=-1)
        out[flag] = (np.asarray(toks), np.asarray(slot_logits),
                     np.asarray(slot_pos))
        jax.clear_caches()
    np.testing.assert_array_equal(out["1"][0], out["0"][0])
    np.testing.assert_array_equal(out["1"][2], out["0"][2])
    np.testing.assert_allclose(out["1"][1], out["0"][1],
                               rtol=2e-4, atol=2e-4)


class TestDecodeFlashGate:
    """_decode_flash selection logic (models/qwen2_decoder.py): the env
    override wins outright; otherwise TPU backend + hardware marker +
    the measured FLASH_DECODE_MIN_CTX capacity crossover must all hold
    (≙ ggml's size-based fattn dispatch, ggml/src/ggml-cuda/fattn.cu:298)."""

    def _arm(self, monkeypatch, tmp_path, backend="tpu", marker=True):
        import qwen2_audio_tpu.models.qwen2_decoder as qd
        monkeypatch.delenv("QA_FLASH_DECODE", raising=False)
        monkeypatch.setattr(qd.jax, "default_backend", lambda: backend)
        mark = tmp_path / "qa_kernel_ok_fd_loop"
        if marker:
            mark.write_text("ok")
        real_exists = os.path.exists
        # _decode_flash does `import os` locally, so patch the global module
        monkeypatch.setattr(
            os.path, "exists",
            lambda p: (mark.exists() if p == "/tmp/qa_kernel_ok_fd_loop"
                       else real_exists(p)))
        return qd

    def test_env_override_wins(self, monkeypatch, tmp_path):
        qd = self._arm(monkeypatch, tmp_path, backend="cpu", marker=False)
        monkeypatch.setenv("QA_FLASH_DECODE", "1")
        assert qd._decode_flash(1, 128, cache_len=64)
        monkeypatch.setenv("QA_FLASH_DECODE", "0")
        assert not qd._decode_flash(1, 128, cache_len=1 << 20)

    def test_shape_preconditions_beat_override(self, monkeypatch, tmp_path):
        qd = self._arm(monkeypatch, tmp_path)
        monkeypatch.setenv("QA_FLASH_DECODE", "1")
        assert not qd._decode_flash(2, 128, cache_len=1 << 20)   # T != 1
        assert not qd._decode_flash(1, 64, cache_len=1 << 20)    # d % 128

    def test_auto_needs_marker_and_crossover(self, monkeypatch, tmp_path):
        qd = self._arm(monkeypatch, tmp_path)
        mc = qd.FLASH_DECODE_MIN_CTX
        assert qd._decode_flash(1, 128, cache_len=mc)
        assert not qd._decode_flash(1, 128, cache_len=mc - 1)

    def test_auto_off_without_marker_or_tpu(self, monkeypatch, tmp_path):
        qd = self._arm(monkeypatch, tmp_path, marker=False)
        assert not qd._decode_flash(1, 128, cache_len=1 << 20)
        qd = self._arm(monkeypatch, tmp_path, backend="cpu", marker=True)
        assert not qd._decode_flash(1, 128, cache_len=1 << 20)
