"""Batched speculative slot decoding
(runtime/generate.py::decode_chunk_slots_spec): exactness vs the plain
decode_chunk_slots pool is the contract — every slot's emitted stream must
equal the plain chunk loop's, for any per-slot acceptance pattern, across
multiple chunk calls, with EOS and suppression."""

import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import (create_cache,
                                                  random_decoder_params)
from qwen2_audio_tpu.runtime.generate import (decode_chunk_slots,
                                              decode_chunk_slots_spec,
                                              prefill_slot)


def _cfg(vocab=64):
    return Qwen2DecoderConfig(
        vocab_size=vocab, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, tie_word_embeddings=False)


def _pool(cfg, params, prefills, S, cache_dtype=jnp.float32):
    B = len(prefills)
    cache = create_cache(cfg, B, S, dtype=cache_dtype)
    slot_pos = jnp.zeros((B,), jnp.int32)
    slot_logits = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    slot_active = jnp.zeros((B,), bool)
    for s, pre in enumerate(prefills):
        cache, slot_pos, slot_logits, slot_active = prefill_slot(
            params, cfg, cache, slot_pos, slot_logits, slot_active,
            jnp.int32(s), pre)
    return cache, slot_pos, slot_logits, slot_active


def _run_plain(cfg, params, prefills, *, S, chunk, rounds, eos=-1,
               suppress=None, cache_dtype=jnp.float32):
    cache, pos, logits, active = _pool(cfg, params, prefills, S,
                                       cache_dtype)
    B = len(prefills)
    streams = [[] for _ in range(B)]
    for _ in range(rounds):
        cache, pos, logits, active, toks, _ = decode_chunk_slots(
            params, cfg, cache, pos, logits, active, suppress,
            chunk=chunk, eos_token_id=eos)
        t = np.asarray(toks)
        for b in range(B):
            for j in range(chunk):
                if streams[b] and streams[b][-1] == eos:
                    break
                streams[b].append(int(t[b, j]))
                if streams[b][-1] == eos:
                    break
    return streams, np.asarray(pos), np.asarray(active)


def _run_spec(cfg, params, prefills, *, S, chunk, rounds, eos=-1,
              suppress=None, spec_k=6, ngram=2, hbuf=128,
              cache_dtype=jnp.float32):
    cache, pos, logits, active = _pool(cfg, params, prefills, S,
                                       cache_dtype)
    B = len(prefills)
    hist = jnp.zeros((B, hbuf), jnp.int32)
    hlen = jnp.zeros((B,), jnp.int32)
    streams = [[] for _ in range(B)]
    for _ in range(rounds):
        (cache, pos, logits, active, hist, hlen, toks, _lps, n_new,
         _it) = \
            decode_chunk_slots_spec(
                params, cfg, cache, pos, logits, active, hist, hlen,
                suppress, chunk=chunk, eos_token_id=eos, spec_k=spec_k,
                ngram=ngram)
        t = np.asarray(toks)
        n = np.asarray(n_new)
        for b in range(B):
            streams[b].extend(int(x) for x in t[b, :n[b]])
    return streams, np.asarray(pos), np.asarray(active)


def test_spec_slots_match_plain_random_weights(rng):
    """Random weights (near-zero acceptance): per-slot streams, final
    positions, and active flags must match the plain pool."""
    cfg = _cfg()
    params = random_decoder_params(np.random.default_rng(11), cfg)
    prefills = [
        jnp.asarray(np.random.default_rng(20 + i).standard_normal(
            (1, t0, 128)) * 0.1, jnp.float32)
        for i, t0 in enumerate((4, 7, 5))]
    want, wpos, _ = _run_plain(cfg, params, prefills, S=128, chunk=6,
                               rounds=3)
    got, gpos, _ = _run_spec(cfg, params, prefills, S=128, chunk=6,
                             rounds=3)
    assert got == want
    np.testing.assert_array_equal(gpos, wpos)


def test_spec_slots_accept_on_cyclic_output():
    """Tiny vocab forces cycles; slots must accept drafts (fewer verify
    rounds than tokens) while staying exact per slot."""
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefills = [
        jnp.asarray(np.random.default_rng(30 + i).standard_normal(
            (1, t0, 128)) * 0.1, jnp.float32)
        for i, t0 in enumerate((4, 6))]
    want, _, _ = _run_plain(cfg, params, prefills, S=256, chunk=16,
                            rounds=3)
    got, _, _ = _run_spec(cfg, params, prefills, S=256, chunk=16,
                          rounds=3, spec_k=8)
    assert got == want
    # acceptance proof: the spec pool advanced 48 tokens/slot in the same
    # 3 chunk calls; internally each call is a while_loop bounded by
    # `chunk` iterations, so equality alone shows correctness — check the
    # cyclic structure actually appeared (any token repeats)
    assert len(set(want[0])) < len(want[0])


def test_spec_slots_eos_freezes_identically():
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefills = [
        jnp.asarray(np.random.default_rng(33).standard_normal(
            (1, 4, 128)) * 0.1, jnp.float32)]
    base, _, _ = _run_plain(cfg, params, prefills, S=128, chunk=24,
                            rounds=1)
    eos = base[0][10]                  # token plain greedy emits at step 10
    want, _, wact = _run_plain(cfg, params, prefills, S=128, chunk=24,
                               rounds=1, eos=eos)
    got, _, gact = _run_spec(cfg, params, prefills, S=128, chunk=24,
                             rounds=1, eos=eos, spec_k=5)
    assert got == want
    assert got[0][-1] == eos and got[0].count(eos) == 1
    assert not gact[0] and not wact[0]


def test_spec_slots_suppress_mask(rng):
    cfg = _cfg()
    params = random_decoder_params(np.random.default_rng(5), cfg)
    prefills = [
        jnp.asarray(np.random.default_rng(40).standard_normal(
            (1, 5, 128)) * 0.1, jnp.float32),
        jnp.asarray(np.random.default_rng(41).standard_normal(
            (1, 3, 128)) * 0.1, jnp.float32)]
    sup = np.zeros((64,), np.float32)
    sup[:8] = -np.inf
    supj = jnp.asarray(sup)
    want, _, _ = _run_plain(cfg, params, prefills, S=96, chunk=5,
                            rounds=2, suppress=supj)
    got, _, _ = _run_spec(cfg, params, prefills, S=96, chunk=5,
                          rounds=2, suppress=supj)
    assert got == want
    assert not any(t < 8 for s in got for t in s)


def test_transcribe_continuous_spec_on_off_identical(rng):
    """transcribe_continuous with FullParams.speculative_k=0 (plain chunk
    loop) vs 7 (batched-speculative) must yield identical segments —
    the serving-level plumbing of decode_chunk_slots_spec."""
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
    cfg = _cfg(vocab=96)
    samples = (0.1 * np.random.default_rng(8).standard_normal(16000 * 5)
               ).astype(np.float32)

    def run(sk):
        ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        ctx.decoder = random_bundle(np.random.default_rng(3), cfg,
                                    enc_state=64, max_ctx=512)
        p = FullParams(max_new_tokens=6, temperature_inc=0.0,
                       speculative_k=sk)
        return list(transcribe_continuous(ctx, samples, p, max_streams=2,
                                          chunk_tokens=3))

    plain = run(0)
    spec = run(7)
    assert [(s.t0_cs, s.tokens) for s in sorted(plain, key=lambda s: s.t0_cs)] \
        == [(s.t0_cs, s.tokens) for s in sorted(spec, key=lambda s: s.t0_cs)]


def test_spec_slots_refill_midstream(rng):
    """A finished slot refilled with a fresh stream (history reset) must
    decode the new stream exactly as a fresh plain pool would."""
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    pre_a = jnp.asarray(np.random.default_rng(50).standard_normal(
        (1, 4, 128)) * 0.1, jnp.float32)
    pre_b = jnp.asarray(np.random.default_rng(51).standard_normal(
        (1, 4, 128)) * 0.1, jnp.float32)

    # reference: stream B decoded alone
    want_b, _, _ = _run_plain(cfg, params, [pre_b], S=128, chunk=8,
                              rounds=2)

    # pool: slot 0 runs stream A for one chunk, then is refilled with B
    cache, pos, logits, active = _pool(cfg, params, [pre_a], 128)
    hist = jnp.zeros((1, 128), jnp.int32)
    hlen = jnp.zeros((1,), jnp.int32)
    (cache, pos, logits, active, hist, hlen, _t, _l, _n, _it) = \
        decode_chunk_slots_spec(params, cfg, cache, pos, logits, active,
                                hist, hlen, None, chunk=8,
                                eos_token_id=-1, spec_k=6)
    cache, pos, logits, active = prefill_slot(
        params, cfg, cache, pos, logits, active, jnp.int32(0), pre_b)
    hist = hist.at[0].set(0)
    hlen = hlen.at[0].set(0)
    got = []
    for _ in range(2):
        (cache, pos, logits, active, hist, hlen, toks, _l, n_new,
         _it) = \
            decode_chunk_slots_spec(params, cfg, cache, pos, logits,
                                    active, hist, hlen, None, chunk=8,
                                    eos_token_id=-1, spec_k=6)
        got.extend(int(x) for x in np.asarray(toks)[0, :int(n_new[0])])
    assert got == want_b[0]


def test_spec_slots_quant_cache_matches_plain(rng):
    """The serving regime consumes an int8 KV cache; the (B, T>1) per-slot
    cache scatter (values + per-vector scales) is the new primitive —
    streams must match the plain q8-cache pool exactly (both paths
    quantize identical K/V vectors, so acceptance is deterministic)."""
    cfg = _cfg(vocab=8)            # cyclic output: exercises acceptance
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefills = [
        jnp.asarray(np.random.default_rng(60 + i).standard_normal(
            (1, t0, 128)) * 0.1, jnp.float32)
        for i, t0 in enumerate((4, 6))]
    want, wpos, _ = _run_plain(cfg, params, prefills, S=256, chunk=12,
                               rounds=2, cache_dtype="q8")
    got, gpos, _ = _run_spec(cfg, params, prefills, S=256, chunk=12,
                             rounds=2, spec_k=6, cache_dtype="q8")
    assert got == want
    np.testing.assert_array_equal(gpos, wpos)


def test_spec_slots_property_fuzz():
    """Randomized property test: across random seeds, slot counts, chunk
    sizes, spec widths, n-gram orders, vocab sizes (cycle-prone and not),
    EOS choices and cache dtypes, the spec pool must equal the plain pool
    stream-for-stream."""
    base = np.random.default_rng(1234)
    for trial in range(6):
        vocab = int(base.choice([8, 16, 64]))
        B = int(base.integers(1, 4))
        chunk = int(base.integers(3, 12))
        spec_k = int(base.integers(2, 9))
        ngram = int(base.choice([2, 3]))
        rounds = int(base.integers(1, 4))
        eos = int(base.integers(0, vocab)) if base.random() < 0.5 else -1
        cdt = "q8" if base.random() < 0.3 else jnp.float32
        cfg = _cfg(vocab=vocab)
        params = random_decoder_params(
            np.random.default_rng(int(base.integers(1 << 30))), cfg)
        prefills = [
            jnp.asarray(np.random.default_rng(
                int(base.integers(1 << 30))).standard_normal(
                (1, int(base.integers(2, 8)), 128)) * 0.1, jnp.float32)
            for _ in range(B)]
        S = 8 + max(p.shape[1] for p in prefills) \
            + rounds * chunk + spec_k + 1
        S = -(-S // 8) * 8
        tag = (trial, vocab, B, chunk, spec_k, ngram, rounds, eos, str(cdt))
        want, wpos, wact = _run_plain(cfg, params, prefills, S=S,
                                      chunk=chunk, rounds=rounds, eos=eos,
                                      cache_dtype=cdt)
        got, gpos, gact = _run_spec(cfg, params, prefills, S=S, chunk=chunk,
                                    rounds=rounds, eos=eos, spec_k=spec_k,
                                    ngram=ngram, cache_dtype=cdt)
        assert got == want, (tag, got, want)
        np.testing.assert_array_equal(gact, wact, err_msg=str(tag))


def test_spec_slots_capacity_boundary_matches_plain():
    """Streams that exhaust the cache mid-chunk: the spec pool must emit
    exactly the plain pool's tokens (clamped accepted suffix), not freeze
    whole verify blocks early."""
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefills = [
        jnp.asarray(np.random.default_rng(70 + i).standard_normal(
            (1, t0, 128)) * 0.1, jnp.float32)
        for i, t0 in enumerate((4, 6))]
    S = 24                      # tiny: slots hit capacity inside round 2
    want, wpos, wact = _run_plain(cfg, params, prefills, S=S, chunk=12,
                                  rounds=2)
    got, gpos, gact = _run_spec(cfg, params, prefills, S=S, chunk=12,
                                rounds=2, spec_k=6)
    # the plain pool pads frozen steps with eos (-1, never really emitted
    # here) which the plain helper appends; the spec pool returns exact
    # counts — compare the real emitted streams
    want = [[t for t in row if t != -1] for row in want]
    assert got == want, (got, want)
    np.testing.assert_array_equal(gpos, wpos)   # same final cache positions
    np.testing.assert_array_equal(gact, wact)
    assert not gact.any()       # both pools exhausted the cache


def test_serving_honors_suppression(rng):
    """FullParams.suppress_regex must mask tokens in the serving paths
    (transcribe_continuous and transcribe_long_form), same as the
    whisper_full decode — previously only the full() path built the
    mask."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
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
    cfg = _cfg(vocab=96)
    samples = (0.1 * np.random.default_rng(8).standard_normal(16000 * 3)
               ).astype(np.float32)

    def run(fn, regex, **kw):
        ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        ctx.decoder = random_bundle(np.random.default_rng(3), cfg,
                                    enc_state=64, max_ctx=512)
        # token_strings: make every id a distinct digit-ish surface
        ctx.decoder.token_strings = lambda i: f"tok{i}"
        p = FullParams(max_new_tokens=8, temperature_inc=0.0,
                       suppress_regex=regex)
        return [t for s in fn(ctx, samples, p, **kw) for t in s.tokens]

    base = run(transcribe_continuous, "", max_streams=2, chunk_tokens=4)
    assert base, "need a non-empty decode to test suppression"
    banned = base[0]
    regex = f"^tok{banned}$"
    for fn, kw in ((transcribe_continuous,
                    dict(max_streams=2, chunk_tokens=4)),
                   (transcribe_long_form, dict(batch_size=2))):
        out = run(fn, regex, **kw)
        assert banned not in out, (fn.__name__, banned, out)


def test_transcribe_many_matches_per_audio_runs(rng):
    """Continuous batching across requests: each audio's segments from the
    shared pool must equal its own transcribe_continuous run."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, FullParams
    from qwen2_audio_tpu.runtime.serving import (transcribe_continuous,
                                                 transcribe_many)

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    cfg = _cfg(vocab=96)
    g = np.random.default_rng(8)
    audios = [(0.1 * g.standard_normal(16000 * n)).astype(np.float32)
              for n in (3, 2, 4)]        # different lengths -> ragged refill
    p = FullParams(max_new_tokens=6, temperature_inc=0.0)

    def ctx_new():
        c = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        c.decoder = random_bundle(np.random.default_rng(3), cfg,
                                  enc_state=64, max_ctx=512)
        return c

    want = {}
    for a, smp in enumerate(audios):
        segs = transcribe_continuous(ctx_new(), smp, p, max_streams=2,
                                     chunk_tokens=4)
        want[a] = sorted((s.t0_cs, tuple(s.tokens)) for s in segs)

    got: dict[int, list] = {a: [] for a in range(len(audios))}
    for a, seg in transcribe_many(ctx_new(), audios, p, max_streams=2,
                                  chunk_tokens=4):
        got[a].append((seg.t0_cs, tuple(seg.tokens)))
    got = {a: sorted(v) for a, v in got.items()}
    assert got == want


def test_serving_suppress_blank_and_capacity_parity(rng):
    """Two serving-level regressions: (1) FullParams.suppress_blank masks
    the blank first token in the pool (step-0 mask baked into the
    prefilled slot logits); (2) a capacity-frozen stream emits identical
    tokens with speculation on or off — the plain pool must not append
    the device's frozen-step EOS padding as a real token."""
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
    cfg = _cfg(vocab=96)
    smp = (0.1 * np.random.default_rng(8).standard_normal(16000 * 3)
           ).astype(np.float32)

    def run(max_ctx, sk, blank=False, blank_tok=None):
        ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        ctx.decoder = random_bundle(np.random.default_rng(3), cfg,
                                    enc_state=64, max_ctx=max_ctx)
        if blank_tok is not None:
            ctx.decoder.token_strings = \
                lambda i: " " if i == blank_tok else f"tok{i}"
        p = FullParams(max_new_tokens=8, temperature_inc=0.0,
                       suppress_blank=blank, speculative_k=sk)
        return [tuple(s.tokens) for s in sorted(
            transcribe_continuous(ctx, smp, p, max_streams=1,
                                  chunk_tokens=4),
            key=lambda s: s.t0_cs)]

    # (1) suppress_blank masks the natural first token when it is "blank"
    first = run(512, 0, blank=False)[0][0]
    masked = run(512, 0, blank=True, blank_tok=first)
    assert masked[0][0] != first

    # (2) capacity freeze: prefill(~35 embeds) + a few tokens exhausts a
    # tiny cache mid-chunk; spec on/off must emit identical streams
    plain = run(40, 0)
    spec = run(40, 7)
    assert plain == spec, (plain, spec)


def test_append_hist_scatter():
    """_append_hist (adaptive pool): appends each slot's first n_new
    tokens at hlen, drops overflow, advances hlen."""
    from qwen2_audio_tpu.runtime.serving import _append_hist
    hist = jnp.zeros((2, 6), jnp.int32)
    hlen = jnp.asarray([1, 5], jnp.int32)
    toks = jnp.asarray([[7, 8, 9], [3, 4, 5]], jnp.int32)
    n_new = jnp.asarray([2, 3], jnp.int32)
    h2, l2 = _append_hist(hist, hlen, toks, n_new)
    np.testing.assert_array_equal(np.asarray(h2),
                                  [[0, 7, 8, 0, 0, 0],
                                   [0, 0, 0, 0, 0, 3]])   # 4,5 dropped
    np.testing.assert_array_equal(np.asarray(l2), [3, 6])  # clamped to H


def test_transcribe_continuous_adaptive_matches_plain(rng):
    """speculative_k=-1 (auto) runs the ADAPTIVE pool: it samples both
    chunk modes, keeps the faster, and must still emit exactly the plain
    pool's streams (both kernels are greedy-exact, so mode mixing cannot
    change output)."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, FullParams
    from qwen2_audio_tpu.runtime import serving
    from qwen2_audio_tpu.runtime.serving import transcribe_continuous

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    cfg = _cfg(vocab=96)
    samples = (0.1 * np.random.default_rng(8).standard_normal(16000 * 5)
               ).astype(np.float32)

    def run(sk):
        ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        ctx.decoder = random_bundle(np.random.default_rng(3), cfg,
                                    enc_state=64, max_ctx=512)
        p = FullParams(max_new_tokens=6, temperature_inc=0.0,
                       speculative_k=sk)
        return list(transcribe_continuous(ctx, samples, p, max_streams=2,
                                          chunk_tokens=3))

    plain = run(0)
    auto = run(-1)
    assert [(s.t0_cs, s.tokens) for s in sorted(plain, key=lambda s: s.t0_cs)] \
        == [(s.t0_cs, s.tokens) for s in sorted(auto, key=lambda s: s.t0_cs)]
    # the adaptive pool sampled BOTH modes (first two chunks) and kept going
    assert serving.LAST_POOL_STATS["spec_chunks"] >= 1
    assert serving.LAST_POOL_STATS["plain_chunks"] >= 1
    # explicit spec_k stays fixed-mode: no plain chunks
    run(7)
    assert serving.LAST_POOL_STATS["plain_chunks"] == 0
