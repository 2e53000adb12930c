"""Tensor-parallel decode through the production quant kernels
(parallel/tp.py): shard_map + per-layer psums must reproduce the
single-device decoder_forward for every weight form, on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import (create_cache,
                                                  decoder_forward,
                                                  embed_tokens,
                                                  random_decoder_params)
from qwen2_audio_tpu.parallel.mesh import make_mesh
from qwen2_audio_tpu.parallel.tp import (shard_decoder_for_tp, tp_local_cfg,
                                         tp_decoder_forward)
from qwen2_audio_tpu.quant.qparams import quantize_decoder_params

CFG = Qwen2DecoderConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32, tie_word_embeddings=False)

# tp=4-divisible geometry (kv heads % 4 == 0, like the 7B's 28q/4kv);
# the dryrun exercises the literal 28/4 ratio, tests keep shapes small
CFG4 = Qwen2DecoderConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    head_dim=16, tie_word_embeddings=False)


def _params(rng, quant=None, cfg=CFG):
    p = random_decoder_params(rng, cfg)
    if quant == "fast":                  # per-channel w8a8 (scale_n leaves)
        p = quantize_decoder_params(p, GGMLType.Q8_0, mode="fast")
    elif quant is not None:
        p = quantize_decoder_params(p, quant)
    return p


@pytest.mark.parametrize("tp", [2, 4])
@pytest.mark.parametrize("quant", [None, GGMLType.Q8_0, GGMLType.Q4_0,
                                   "fast"])
def test_tp_matches_single_device(quant, tp, rng):
    cfg = CFG if tp == 2 else CFG4
    params = _params(np.random.default_rng(31), quant, cfg)
    toks = jnp.asarray(np.random.default_rng(32).integers(0, 128, (2, 5)))
    dense = random_decoder_params(np.random.default_rng(31), cfg)
    x = embed_tokens(dense, toks)

    cache = create_cache(cfg, 2, 16, dtype=jnp.float32)
    want, wcache = decoder_forward(params, cfg, x, cache, 0,
                                   block_only=True)

    mesh = make_mesh(dp=1, tp=tp)
    sp = shard_decoder_for_tp(params, mesh)
    cache2 = create_cache(cfg, 2, 16, dtype=jnp.float32)
    got, gcache = tp_decoder_forward(sp, cfg, mesh, x, cache2, 0,
                                     block_only=True)
    if quant == "fast":
        # w8a8 TP is NOT bit-matched to single-chip w8a8: row-parallel
        # o/down quantize their LOCAL activation half, so the per-token
        # activation scales differ by shard (a finer grouping, standard
        # TP-w8a8 semantics). Contract: the TP output's error vs the
        # DENSE reference stays within ~the single-chip w8a8 error.
        ref, _ = decoder_forward(dense, cfg, x,
                                 create_cache(cfg, 2, 16,
                                              dtype=jnp.float32),
                                 0, block_only=True)
        e_single = float(np.abs(np.asarray(want) - np.asarray(ref)).max())
        e_tp = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
        assert e_tp <= 2.0 * e_single + 1e-4, (e_tp, e_single)
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)
    # the sharded cache must hold the same K/V (gather and compare).
    # For w8a8 only layer 0 is comparable: deeper layers see the slightly
    # different residual stream from the per-shard activation scales.
    gk, wk = np.asarray(gcache.k), np.asarray(wcache.k)
    if quant == "fast":
        np.testing.assert_allclose(gk[0], wk[0], atol=1e-4, rtol=1e-4)
    else:
        np.testing.assert_allclose(gk, wk, atol=1e-4, rtol=1e-4)


def test_tp_decode_step_vec_pos(rng):
    """Per-stream positions (continuous batching) under TP."""
    params = _params(np.random.default_rng(41), GGMLType.Q8_0)
    dense = random_decoder_params(np.random.default_rng(41), CFG)
    B, S = 2, 16
    toks_pre = jnp.asarray(np.random.default_rng(42).integers(0, 128, (B, 6)))
    xp = embed_tokens(dense, toks_pre)
    tok1 = jnp.asarray(np.random.default_rng(43).integers(0, 128, (B, 1)))
    x1 = embed_tokens(dense, tok1)
    pos = jnp.asarray([6, 3], jnp.int32)

    cache = create_cache(CFG, B, S, dtype=jnp.float32)
    _, cache = decoder_forward(params, CFG, xp, cache, 0, block_only=True)
    want, _ = decoder_forward(params, CFG, x1, cache, pos)

    mesh = make_mesh(dp=1, tp=2)
    sp = shard_decoder_for_tp(params, mesh)
    cache2 = create_cache(CFG, B, S, dtype=jnp.float32)
    _, cache2 = tp_decoder_forward(sp, CFG, mesh, xp, cache2, 0,
                                   block_only=True)
    got, _ = tp_decoder_forward(sp, CFG, mesh, x1, cache2, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_quant_cache(tp, rng):
    """int8 KV cache sharded on the kv-head axis under TP."""
    cfg = CFG if tp == 2 else CFG4
    params = _params(np.random.default_rng(51), GGMLType.Q8_0, cfg)
    dense = random_decoder_params(np.random.default_rng(51), cfg)
    toks = jnp.asarray(np.random.default_rng(52).integers(0, 128, (2, 5)))
    x = embed_tokens(dense, toks)

    cache = create_cache(cfg, 2, 16, dtype="q8")
    want, _ = decoder_forward(params, cfg, x, cache, 0, block_only=True)

    mesh = make_mesh(dp=1, tp=tp)
    sp = shard_decoder_for_tp(params, mesh)
    cache2 = create_cache(cfg, 2, 16, dtype="q8")
    got, _ = tp_decoder_forward(sp, cfg, mesh, x, cache2, 0,
                                block_only=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_tp_rejects_fused_and_bad_tp():
    from qwen2_audio_tpu.models.qwen2_decoder import fuse_decoder_params
    params = _params(np.random.default_rng(61))
    mesh = make_mesh(dp=1, tp=2)
    with pytest.raises(ValueError, match="unfused"):
        shard_decoder_for_tp(fuse_decoder_params(params), mesh)
    with pytest.raises(ValueError, match="divide"):
        tp_local_cfg(CFG, 3)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_spec_slot_pool_matches_single(tp, rng):
    """Multi-chip batched-speculative serving: the TP slot pool (prefill +
    spec chunk decode under shard_map) must emit the same streams as the
    single-device pool — at tp=2 and tp=4."""
    from qwen2_audio_tpu.runtime.generate import (decode_chunk_slots_spec,
                                                  prefill_slot)
    from qwen2_audio_tpu.parallel.tp import (tp_decode_chunk_slots_spec,
                                             tp_prefill_slot)

    cfg = Qwen2DecoderConfig(
        vocab_size=64, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4 if tp == 2 else 8,
        num_key_value_heads=2 if tp == 2 else 4,
        head_dim=32 if tp == 2 else 16, tie_word_embeddings=False)
    params = quantize_decoder_params(
        random_decoder_params(np.random.default_rng(71), cfg), GGMLType.Q8_0)
    prefills = [
        jnp.asarray(np.random.default_rng(80 + i).standard_normal(
            (1, t0, 128)) * 0.1, jnp.float32)
        for i, t0 in enumerate((4, 6))]
    B, S, HB = 2, 128, 64

    def run(tp_mesh=None):
        cache = create_cache(cfg, B, S, dtype=jnp.float32)
        pos = jnp.zeros((B,), jnp.int32)
        logits = jnp.zeros((B, cfg.vocab_size), jnp.float32)
        active = jnp.zeros((B,), bool)
        for s, pre in enumerate(prefills):
            if tp_mesh is None:
                cache, pos, logits, active = prefill_slot(
                    params, cfg, cache, pos, logits, active,
                    jnp.int32(s), pre)
            else:
                sp = run.sp
                cache, pos, logits, active = tp_prefill_slot(
                    sp, cfg, tp_mesh, cache, pos, logits, active,
                    jnp.int32(s), pre)
        hist = jnp.zeros((B, HB), jnp.int32)
        hlen = jnp.zeros((B,), jnp.int32)
        streams = [[] for _ in range(B)]
        for _ in range(2):
            if tp_mesh is None:
                (cache, pos, logits, active, hist, hlen, toks, _l, n_new,
                 _it) = decode_chunk_slots_spec(
                    params, cfg, cache, pos, logits, active, hist, hlen,
                    chunk=10, eos_token_id=-1, spec_k=5)
            else:
                (cache, pos, logits, active, hist, hlen, toks, _l, n_new,
                 _it) = tp_decode_chunk_slots_spec(
                    run.sp, cfg, tp_mesh, cache, pos, logits, active,
                    hist, hlen, chunk=10, eos_token_id=-1, spec_k=5)
            t, n = np.asarray(toks), np.asarray(n_new)
            for b in range(B):
                streams[b].extend(int(x) for x in t[b, :n[b]])
        return streams

    want = run()
    mesh = make_mesh(dp=1, tp=tp)
    run.sp = shard_decoder_for_tp(params, mesh)
    got = run(mesh)
    assert got == want


def test_transcribe_continuous_tp_mesh(rng):
    """transcribe_continuous(mesh=tp2) must yield the same segments as the
    single-device pool — the serving-level TP plumbing end to end."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, FullParams
    from qwen2_audio_tpu.runtime.serving import transcribe_continuous

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    samples = (0.1 * np.random.default_rng(8).standard_normal(16000 * 5)
               ).astype(np.float32)

    def run(mesh):
        ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        ctx.decoder = random_bundle(np.random.default_rng(3), CFG,
                                    enc_state=64, max_ctx=512)
        p = FullParams(max_new_tokens=6, temperature_inc=0.0,
                       speculative_k=5)
        return sorted(
            ((s.t0_cs, tuple(s.tokens)) for s in transcribe_continuous(
                ctx, samples, p, max_streams=2, chunk_tokens=3, mesh=mesh)))

    single = run(None)
    tp2 = run(make_mesh(dp=1, tp=2))
    assert single == tp2
