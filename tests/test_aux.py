"""Auxiliary subsystem tests: DTW timestamps, VAD, UTF-8 streaming,
long-form serving."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.audio.vad import high_pass_filter, similarity, vad_simple
from qwen2_audio_tpu.models.dtw import (
    ALIGNMENT_HEADS_PRESETS,
    dtw_and_backtrace,
    median_filter,
    token_timestamps_from_attention,
)
from qwen2_audio_tpu.utils.utf8 import PartialUtf8, StreamingTextDecoder, decode_utf8


# ---- DTW ----

def test_median_filter():
    x = jnp.asarray([1.0, 9.0, 1.0, 1.0, 9.0, 1.0, 1.0])
    y = np.asarray(median_filter(x, 3))
    assert y[1] == 1.0 and y[4] == 1.0   # spikes removed


def test_dtw_identity_path():
    # strongly diagonal cost -> diagonal alignment
    N = 6
    cost = np.ones((N, N)) - 2 * np.eye(N)
    path = dtw_and_backtrace(cost)
    np.testing.assert_array_equal(path[0], path[1])


def test_dtw_monotonic():
    rng = np.random.default_rng(0)
    cost = rng.standard_normal((5, 12))
    path = dtw_and_backtrace(cost)
    assert (np.diff(path[0]) >= 0).all()
    assert (np.diff(path[1]) >= 0).all()
    assert path[0][0] == 0 and path[1][0] == 0
    assert path[0][-1] == 4 and path[1][-1] == 11


def test_token_timestamps_monotonic(rng):
    n_heads, n_tokens, n_frames = 4, 8, 50
    # synth attention: token i attends around frame 6*i
    attn = np.zeros((n_heads, n_tokens, n_frames), np.float32)
    for i in range(n_tokens):
        attn[:, i, min(6 * i, n_frames - 1)] = 5.0
    times = token_timestamps_from_attention(attn, n_frames)
    assert (np.diff(times) >= 0).all()
    assert times[0] == 0.0


def test_aheads_presets_shapes():
    assert set(ALIGNMENT_HEADS_PRESETS) >= {"tiny", "base", "small",
                                            "medium", "large"}
    for heads in ALIGNMENT_HEADS_PRESETS.values():
        assert all(len(h) == 2 for h in heads)


# ---- VAD ----

def test_high_pass_removes_dc():
    x = np.ones(16000, np.float32)
    y = high_pass_filter(x, 100.0, 16000)
    assert abs(y[-100:].mean()) < 1e-3
    assert y[0] == pytest.approx(1.0)


def test_vad_detects_trailing_silence():
    rng = np.random.default_rng(0)
    speech = 0.5 * rng.standard_normal(16000).astype(np.float32)
    silence = 0.001 * rng.standard_normal(8000).astype(np.float32)
    clip = np.concatenate([speech, silence])
    assert vad_simple(clip, 16000, last_ms=300, vad_thold=0.6,
                      freq_thold=100.0)
    # all speech -> not ended
    assert not vad_simple(speech, 16000, last_ms=300, vad_thold=0.6,
                          freq_thold=100.0)


def test_similarity():
    assert similarity("hello", "hello") == 1.0
    assert similarity("", "") == 1.0
    assert similarity("abc", "abd") == pytest.approx(2 / 3)
    assert similarity("abc", "") == 0.0


# ---- UTF-8 ----

def test_decode_utf8_whole():
    cps, partial = decode_utf8("héllo✓".encode(), PartialUtf8())
    assert cps == [ord(c) for c in "héllo✓"]
    assert partial.n_remain == -1


def test_decode_utf8_split_codepoint():
    data = "✓".encode()  # 3 bytes
    cps1, p = decode_utf8(data[:2], PartialUtf8())
    assert cps1 == [] and p.n_remain == 1
    cps2, p2 = decode_utf8(data[2:], p)
    assert cps2 == [ord("✓")]
    assert p2.n_remain == -1


def test_decode_utf8_invalid():
    # a bare continuation byte is invalid (lookup -> 0 -> n_remain -1),
    # matching the C table's semantics (src/qwen2-whisper.cpp:3610-3626)
    cps, p = decode_utf8(b"\x80", PartialUtf8())
    assert p.n_remain == -1
    # 0xff parses leniently as a 4-byte lead, again like the C table
    cps, p = decode_utf8(b"\xff", PartialUtf8())
    assert p.n_remain == 3


def test_streaming_text_decoder():
    d = StreamingTextDecoder()
    data = "日本語".encode()
    out = d.push(data[:4])       # 1 full char + 1 partial byte
    assert out == "日"
    out += d.push(data[4:])
    assert out == "日本語"
    assert d.flush() == ""


# ---- long-form serving ----

def test_transcribe_long_form(rng):
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import Qwen2DecoderConfig, WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, FullParams
    from qwen2_audio_tpu.runtime.serving import transcribe_long_form

    # n_audio_ctx=64 -> 128-frame (1.28 s) windows keep the test fast
    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    cfg = Qwen2DecoderConfig(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, tie_word_embeddings=False)
    ctx.decoder = random_bundle(rng, cfg, enc_state=64, max_ctx=1024)

    samples = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)  # 5 s
    p = FullParams(max_new_tokens=4, temperature_inc=0.0)
    segs = list(transcribe_long_form(ctx, samples, p, batch_size=2))

    n_len_org = ctx.state.mel.n_len_org
    expected = -(-n_len_org // 128)
    assert len(segs) == expected
    assert segs[0].t0_cs == 0
    # non-overlapping, ordered windows
    for a, b in zip(segs, segs[1:]):
        assert b.t0_cs == a.t0_cs + 128
    assert all(s.tokens for s in segs)
    assert ctx.full_n_segments() == expected


def test_transcribe_continuous_matches_lockstep(rng):
    """Continuous batching (slot pool + per-slot positions) produces the
    SAME tokens per window as the lockstep batched decode, in completion
    order."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import Qwen2DecoderConfig, WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, FullParams
    from qwen2_audio_tpu.runtime.serving import (transcribe_continuous,
                                                 transcribe_long_form)

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    cfg = Qwen2DecoderConfig(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, tie_word_embeddings=False)
    samples = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)
    p = FullParams(max_new_tokens=6, temperature_inc=0.0)

    def run(fn, **kw):
        ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        ctx.decoder = random_bundle(np.random.default_rng(3), cfg,
                                    enc_state=64, max_ctx=512)
        return list(fn(ctx, samples, p, **kw))

    ref = run(transcribe_long_form, batch_size=2)
    got = run(transcribe_continuous, max_streams=2, chunk_tokens=3)

    assert len(got) == len(ref)
    by_t0_ref = {s.t0_cs: s for s in ref}
    for s in got:
        r = by_t0_ref[s.t0_cs]
        assert s.tokens == r.tokens, (s.t0_cs, s.tokens, r.tokens)
        assert s.t1_cs == r.t1_cs
    # completion order covers every window exactly once
    assert sorted(s.t0_cs for s in got) == sorted(by_t0_ref)


def test_transcribe_continuous_slot_reuse(rng):
    """More windows than slots: slots are refilled (the continuous part)
    and every window still decodes correctly."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import Qwen2DecoderConfig, WhisperHParams
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
    cfg = Qwen2DecoderConfig(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, tie_word_embeddings=False)
    ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    ctx.decoder = random_bundle(np.random.default_rng(3), cfg,
                                enc_state=64, max_ctx=512)
    samples = (0.1 * rng.standard_normal(16000 * 10)).astype(np.float32)
    p = FullParams(max_new_tokens=5, temperature_inc=0.0)
    segs = list(transcribe_continuous(ctx, samples, p, max_streams=2,
                                      chunk_tokens=4))
    n_windows = -(-ctx.state.mel.n_len_org // 128)
    assert len(segs) == n_windows > 2          # forced slot reuse
    assert all(s.tokens for s in segs)
    assert len(ctx.state.segments) == n_windows


# ---- profiling ----

def test_cost_analysis(rng):
    import jax.numpy as jnp
    from qwen2_audio_tpu.utils.profiling import cost_analysis, flops_summary

    def f(a, b):
        return a @ b
    a = jnp.ones((256, 256), jnp.float32)
    c = cost_analysis(f, a, a)
    assert c.get("flops", 0) >= 2 * 256**3 * 0.9
    s = flops_summary(f, a, a)
    assert "bound" in s


def test_trace_context(tmp_path):
    import jax.numpy as jnp
    from qwen2_audio_tpu.utils.profiling import trace
    with trace(str(tmp_path / "tr")) as d:
        _ = (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os
    assert any(os.scandir(d))


def test_similarity_levenshtein():
    """utils/text.py::similarity == the reference's 1 - dist/max_len
    (examples/common.cpp:801-823), checked against a plain DP oracle."""
    import itertools
    import random

    from qwen2_audio_tpu.utils.text import similarity

    def oracle(s0, s1):
        a, b = s0.encode(), s1.encode()
        if max(len(a), len(b)) == 0:
            return 1.0
        prev = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            cur = [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                cur[j] = min(cur[j - 1] + 1, prev[j] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return 1.0 - prev[-1] / max(len(a), len(b))

    assert similarity("", "") == 1.0
    assert similarity("abc", "abc") == 1.0
    assert abs(similarity("kitten", "sitting") - (1 - 3 / 7)) < 1e-9
    rng = random.Random(0)
    for _ in range(50):
        s0 = "".join(rng.choice("abcdé ") for _ in range(rng.randrange(12)))
        s1 = "".join(rng.choice("abcdé ") for _ in range(rng.randrange(12)))
        assert abs(similarity(s0, s1) - oracle(s0, s1)) < 1e-9, (s0, s1)


def test_long_form_no_context_carries_transcript(rng, monkeypatch):
    """no_context=False ≙ whisper_full_params.no_context (header :377-379):
    each window's tokens ride into the next window's prompt."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import Qwen2DecoderConfig, WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, FullParams
    from qwen2_audio_tpu.runtime import serving

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    cfg = Qwen2DecoderConfig(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, tie_word_embeddings=False)
    ctx.decoder = random_bundle(rng, cfg, enc_state=64, max_ctx=1024)

    seen_prompts = []
    real = serving._prefill_embeds

    def spy(bundle, audio, prompt):
        seen_prompts.append(list(prompt))
        return real(bundle, audio, prompt)

    monkeypatch.setattr(serving, "_prefill_embeds", spy)

    samples = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    p = FullParams(max_new_tokens=4, temperature_inc=0.0, no_context=False)
    segs = list(serving.transcribe_long_form(ctx, samples, p, batch_size=4))

    assert len(segs) >= 2
    assert seen_prompts[0] == []
    # window 2's prompt is window 1's transcript (EOS stripped)
    expect = [t for t in segs[0].tokens if t != ctx.decoder.eos_token_id]
    assert seen_prompts[1] == expect


def _mini_serving_ctx(rng):
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import Qwen2DecoderConfig, WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    cfg = Qwen2DecoderConfig(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, tie_word_embeddings=False)
    ctx.decoder = random_bundle(rng, cfg, enc_state=64, max_ctx=1024)
    return ctx


def test_serving_segments_reset_per_call(rng):
    """Serving entry points start a FRESH state.segments each call (like
    decoding.run / whisper_full's per-call result_all clear) — round-3
    review: they used to accumulate across runs on one context."""
    from qwen2_audio_tpu.runtime import FullParams
    from qwen2_audio_tpu.runtime.serving import (transcribe_continuous,
                                                 transcribe_long_form)
    ctx = _mini_serving_ctx(rng)
    samples = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    p = FullParams(max_new_tokens=3, temperature_inc=0.0)
    n1 = len(list(transcribe_long_form(ctx, samples, p, batch_size=2)))
    list(transcribe_long_form(ctx, samples, p, batch_size=2))
    assert ctx.full_n_segments() == n1          # not 2 * n1
    list(transcribe_continuous(ctx, samples, p, max_streams=2,
                               chunk_tokens=3))
    assert ctx.full_n_segments() == n1


def test_serving_initial_prompt_conditions_decode(rng):
    """FullParams.initial_prompt reaches the serving prefill (tokenized +
    capped like decoding.run, header :412-417)."""
    from qwen2_audio_tpu.runtime import FullParams
    from qwen2_audio_tpu.runtime.serving import (_base_prompt_tokens,
                                                 transcribe_long_form)
    ctx = _mini_serving_ctx(rng)
    ctx.decoder.tokenize = lambda s: [5, 6, 7]
    p = FullParams(max_new_tokens=3, temperature_inc=0.0,
                   initial_prompt="glossary", prompt_tokens=[9])
    assert _base_prompt_tokens(ctx.decoder, p) == [5, 6, 7, 9]
    # capped at n_max_text_ctx // 2
    p2 = FullParams(initial_prompt="x", n_max_text_ctx=4)
    ctx.decoder.tokenize = lambda s: list(range(10))
    assert _base_prompt_tokens(ctx.decoder, p2) == [0, 1]
    # and the decode path runs end-to-end with a prompt installed
    ctx.decoder.tokenize = lambda s: [5, 6, 7]
    samples = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    segs = list(transcribe_long_form(ctx, samples, p, batch_size=2))
    assert segs and all(s.tokens for s in segs)


def test_pool_warns_on_greedy_only_knobs(rng):
    """The slot pool cannot honor beam/temperature/repetition_penalty —
    it must warn (once), not silently diverge from transcribe_long_form."""
    from qwen2_audio_tpu.runtime import FullParams
    from qwen2_audio_tpu.runtime import decoding as dec
    from qwen2_audio_tpu.runtime.serving import transcribe_continuous
    ctx = _mini_serving_ctx(rng)
    samples = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    dec._WARNED_FLAGS.discard("pool_beam")
    p = FullParams(max_new_tokens=3, temperature_inc=0.0, strategy="beam")
    list(transcribe_continuous(ctx, samples, p, max_streams=2,
                               chunk_tokens=3))
    assert "pool_beam" in dec._WARNED_FLAGS
