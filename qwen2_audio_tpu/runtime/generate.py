"""Fully on-device autoregressive generation.

The host-driven loop in decoding.py pays a host<->device round trip per
token (fine for debugging, callbacks, beams). This module runs the whole
decode under one ``lax.while_loop``: sample -> embed -> decoder step -> stop
test, entirely on device; the host gets one final (tokens, logprobs, count)
transfer. This is the path that sets decode tokens/s (BASELINE: q8_0 decode
beating ggml-CUDA on A100).

Everything is static-shape: tokens buffer sized max_new_tokens, per-stream
done flags, EOS short-circuit via the while condition.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from qwen2_audio_tpu.models.qwen2_decoder import (KVCache, QuantKVCache,
                                                  create_cache,
                                                  decoder_forward)
from qwen2_audio_tpu.runtime.sampling import apply_repetition_penalty


class GenState(NamedTuple):
    cache: KVCache
    last_logits: jax.Array      # (B, V) raw logits after the last forward
    prev_logits: jax.Array      # (B, V) raw logits the last token came from
    tokens: jax.Array           # (B, max_new) int32
    logprobs: jax.Array         # (B, max_new) f32
    seen: jax.Array             # (B, V) bool
    done: jax.Array             # (B,) bool
    count: jax.Array            # () int32 — steps emitted
    key: jax.Array


@functools.partial(
    jax.jit,
    # seed is TRACED (PRNGKey(seed) folds it in at run time): a static
    # seed would compile a fresh while_loop program per seed value —
    # 5-18 min each on the remote-compile path (CLAUDE.md)
    static_argnames=("cfg", "max_new_tokens", "eos_token_id", "temperature",
                     "repetition_penalty", "top_k", "cache_max_ctx",
                     "cache_dtype"))
def generate_on_device(
    params,
    cfg,
    prefill: jax.Array,            # (B, T0, D) embeddings
    suppress_mask: jax.Array | None = None,   # (V,) additive logits mask
    suppress_first: jax.Array | None = None,  # (V,) mask for step 0 only
    *,
    max_new_tokens: int,
    eos_token_id: int,
    cache_max_ctx: int,
    cache_dtype=jnp.bfloat16,
    temperature: float = 0.0,
    repetition_penalty: float = 1.0,
    top_k: int = 0,
    seed: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (tokens (B, max_new), logprobs (B, max_new), n_generated (),
    final_logits (B, V), first_logits (B, V)).

    tokens[b, i] for i >= per-stream stop are padded with eos_token_id.
    final_logits matches the host loop (decoding.py): the distribution the
    last emitted token was sampled FROM.
    """
    B, T0, D = prefill.shape
    V = cfg.vocab_size

    cache = create_cache(cfg, B, cache_max_ctx, dtype=cache_dtype)
    from qwen2_audio_tpu.runtime.decoding import _prefill_flash
    logits, cache = decoder_forward(params, cfg, prefill, cache, 0,
                                    block_only=True, logits_last_only=True,
                                    use_flash=_prefill_flash())
    first_logits = logits[:, -1]

    state = GenState(
        cache=cache,
        last_logits=first_logits,
        prev_logits=first_logits,
        tokens=jnp.full((B, max_new_tokens), eos_token_id, jnp.int32),
        logprobs=jnp.zeros((B, max_new_tokens), jnp.float32),
        seen=jnp.zeros((B, V), bool),
        done=jnp.zeros((B,), bool),
        count=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )

    def cond(s: GenState):
        # capacity bound: dynamic_update_slice would CLAMP writes past the
        # cache end, silently corrupting the last slot
        return ((s.count < max_new_tokens) & ~jnp.all(s.done)
                & (T0 + s.count < cache_max_ctx))

    def body(s: GenState):
        lg = s.last_logits if suppress_mask is None \
            else s.last_logits + suppress_mask[None, :]
        if suppress_first is not None:
            # FullParams.suppress_blank ≙ whisper.cpp's initial " "/eot
            # suppression: an extra mask applied to the first step only
            lg = jnp.where(s.count == 0, lg + suppress_first[None, :], lg)
        lg = apply_repetition_penalty(lg, s.seen, repetition_penalty)
        logp = jax.nn.log_softmax(lg, axis=-1)
        if temperature > 0:
            key, sub = jax.random.split(s.key)
            scaled = lg / max(temperature, 1e-6)
            if 0 < top_k < V:   # same guard as sampling.top_k_top_p_filter
                kth = jnp.sort(scaled, axis=-1)[:, V - top_k]
                scaled = jnp.where(scaled < kth[:, None], -jnp.inf, scaled)
            tok = jax.random.categorical(sub, scaled, axis=-1)
        else:
            key = s.key
            tok = jnp.argmax(lg, axis=-1)
        tok = jnp.where(s.done, eos_token_id, tok).astype(jnp.int32)
        lp = jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]
        lp = jnp.where(s.done, 0.0, lp)

        tokens = jax.lax.dynamic_update_slice(s.tokens, tok[:, None],
                                              (0, s.count))
        logprobs = jax.lax.dynamic_update_slice(s.logprobs, lp[:, None],
                                                (0, s.count))
        seen = s.seen.at[jnp.arange(B), tok].set(True)
        done = s.done | (tok == eos_token_id)

        x = params["embed"][tok][:, None, :]
        logits, cache = decoder_forward(params, cfg, x, s.cache,
                                        T0 + s.count)
        return GenState(cache=cache, last_logits=logits[:, -1],
                        prev_logits=s.last_logits,
                        tokens=tokens, logprobs=logprobs, seen=seen,
                        done=done, count=s.count + 1, key=key)

    final = jax.lax.while_loop(cond, body, state)
    # host-loop parity (decoding.py:222-245): the host breaks BEFORE the
    # forward that would follow the final token (EOS break, or the capacity
    # break — its cache is sized exactly T0+max_new, so that break always
    # precedes a "last" forward), so final logits are the distribution the
    # last token was sampled from
    return (final.tokens, final.logprobs, final.count, final.prev_logits,
            first_logits)


class SpecState(NamedTuple):
    cache: KVCache
    last_logits: jax.Array      # (1, V) raw logits after the last emitted tok
    prev_logits: jax.Array      # (1, V) raw logits the last token came from
    tokens: jax.Array           # (1, max_new + spec_k + 1) int32
    logprobs: jax.Array         # same padding
    done: jax.Array             # () bool
    count: jax.Array            # () int32 tokens emitted
    iters: jax.Array            # () int32 loop iterations (for accept-rate)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_token_id",
                     "cache_max_ctx", "cache_dtype", "spec_k", "ngram"))
def generate_speculative(
    params,
    cfg,
    prefill: jax.Array,            # (1, T0, D) — single stream
    suppress_mask: jax.Array | None = None,
    suppress_first: jax.Array | None = None,  # (V,) mask for step 0 only
    *,
    max_new_tokens: int,
    eos_token_id: int,
    cache_max_ctx: int,
    cache_dtype=jnp.bfloat16,
    spec_k: int = 8,
    ngram: int = 2,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Greedy decoding with n-gram (prompt-lookup) self-drafting.

    Decode at B=1 is HBM-bound: a forward over K+1 positions reads the
    same weight bytes as one position, so verifying K drafted tokens in
    one step is nearly free — tokens/s multiplies by the mean accepted
    length. Drafts come from the model's OWN output history: find the
    most recent occurrence of the trailing ``ngram`` tokens, propose the
    ``spec_k`` tokens that followed it (no draft model, exact greedy
    output by construction — every emitted token equals the argmax the
    plain loop would take given the same logits; at bf16 the K+1-wide
    forward can round differently from a T=1 forward, so a near-tie
    argmax (gap ~1e-4) may flip — the usual batch-shape numeric caveat,
    bit-exact at f32). The reference has no analog (its decode is
    strictly one token per graph launch, src/qwen2-whisper.cpp:2675);
    this is a TPU-native serving lever in the vLLM prompt-lookup family.

    Static shapes throughout: every iteration runs one (K+1)-token
    forward under the same ``lax.while_loop`` discipline as
    generate_on_device. Returns (tokens (1, max_new), logprobs, count,
    last_logits, first_logits, iters).
    """
    B, T0, D = prefill.shape
    if B != 1:
        raise ValueError("speculative decoding is a B=1 latency path; "
                         "batch throughput comes from plain batching")
    V = cfg.vocab_size
    K = spec_k
    Lbuf = max_new_tokens + K + 1
    if cache_max_ctx < T0 + max_new_tokens + K:
        raise ValueError(
            f"cache_max_ctx {cache_max_ctx} < prefill {T0} + max_new "
            f"{max_new_tokens} + spec_k {K}: the draft block needs "
            "headroom past the last emitted token")

    cache = create_cache(cfg, 1, cache_max_ctx, dtype=cache_dtype)
    from qwen2_audio_tpu.runtime.decoding import _prefill_flash
    logits, cache = decoder_forward(params, cfg, prefill, cache, 0,
                                    block_only=True, logits_last_only=True,
                                    use_flash=_prefill_flash())
    first_logits = logits[:, -1]

    sup = (jnp.zeros((V,), jnp.float32) if suppress_mask is None
           else suppress_mask)

    state = SpecState(
        cache=cache,
        last_logits=first_logits,
        prev_logits=first_logits,
        tokens=jnp.full((1, Lbuf), eos_token_id, jnp.int32),
        logprobs=jnp.zeros((1, Lbuf), jnp.float32),
        done=jnp.zeros((), bool),
        count=jnp.zeros((), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
    )

    def cond(s: SpecState):
        return (s.count < max_new_tokens) & ~s.done

    def body(s: SpecState):
        c = s.count
        lg_prev = s.last_logits[0] + sup
        if suppress_first is not None:
            lg_prev = jnp.where(c == 0, lg_prev + suppress_first, lg_prev)
        d0 = jnp.argmax(lg_prev).astype(jnp.int32)

        # --- draft: most recent match of [last ngram-1 emitted, d0] ----
        h = s.tokens[0]
        tail = jnp.concatenate([
            jax.lax.dynamic_slice(
                h, (jnp.maximum(c - (ngram - 1), 0),), (ngram - 1,)),
            d0[None]])
        wins = jnp.stack([jnp.roll(h, -j) for j in range(ngram)], axis=1)
        idx = jnp.arange(Lbuf)
        match = jnp.all(wins == tail[None, :], axis=1) & (idx <= c - ngram)
        best = jnp.max(jnp.where(match, idx, -1))
        found = best >= 0
        start = jnp.where(found, best + ngram, 0)
        draft = jax.lax.dynamic_slice(h, (start,), (K,))
        draft = jnp.where(found & (start + jnp.arange(K) < c), draft, d0)

        # --- one (K+1)-token forward verifies the whole draft ----------
        seq = jnp.concatenate([d0[None], draft])            # (K+1,)
        x = params["embed"][seq][None]                      # (1, K+1, D)
        logits_out, cache = decoder_forward(params, cfg, x, s.cache, T0 + c)
        rows = logits_out[0] + sup[None, :]                 # (K+1, V)
        tgt = jnp.argmax(rows, axis=-1).astype(jnp.int32)   # (K+1,)

        ok = (draft == tgt[:K]).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(ok))
        n_emit = n_acc + 1                                  # d0 always lands

        epos = jnp.arange(K + 1)
        eos_here = (seq == eos_token_id) & (epos < n_emit)
        eos_in = jnp.any(eos_here)
        idx_eos = jnp.argmax(eos_here)                      # first True
        n_emit = jnp.where(eos_in, jnp.minimum(n_emit, idx_eos + 1), n_emit)
        n_emit = jnp.minimum(n_emit, max_new_tokens - c)

        logp_prev = jax.nn.log_softmax(lg_prev)
        logp_rows = jax.nn.log_softmax(rows, axis=-1)
        lp = jnp.concatenate([
            logp_prev[d0][None],
            jnp.take_along_axis(logp_rows[:K], draft[:, None],
                                axis=-1)[:, 0]]).astype(jnp.float32)

        tokens = jax.lax.dynamic_update_slice(s.tokens, seq[None], (0, c))
        logprobs = jax.lax.dynamic_update_slice(s.logprobs, lp[None], (0, c))
        last = jax.lax.dynamic_slice(logits_out[0], (n_emit - 1, 0), (1, V))
        # the distribution the LAST emitted token was sampled from: row
        # n_emit-2 of this forward, or the carried-in logits when only d0
        # landed (n_emit == 1)
        prev = jnp.where(
            n_emit >= 2,
            jax.lax.dynamic_slice(logits_out[0],
                                  (jnp.maximum(n_emit - 2, 0), 0), (1, V)),
            s.last_logits)
        return SpecState(cache=cache, last_logits=last, prev_logits=prev,
                         tokens=tokens,
                         logprobs=logprobs, done=s.done | eos_in,
                         count=c + n_emit, iters=s.iters + 1)

    final = jax.lax.while_loop(cond, body, state)
    # overwrite the speculative overhang: beyond count is padding
    live = jnp.arange(Lbuf)[None, :] < final.count
    tokens = jnp.where(live, final.tokens, eos_token_id)[:, :max_new_tokens]
    logprobs = jnp.where(live, final.logprobs, 0.0)[:, :max_new_tokens]
    # same host-parity rule as generate_on_device: report the distribution
    # the last emitted token came from
    return (tokens, logprobs, final.count, final.prev_logits, first_logits,
            final.iters)


class BeamState(NamedTuple):
    cache: KVCache
    scores: jax.Array           # (K,) cumulative log-prob per beam
    tokens: jax.Array           # (K, max_new) int32
    logprobs: jax.Array         # (K, max_new) f32
    seen: jax.Array             # (K, V) bool — per-beam repetition state
    done: jax.Array             # (K,) bool — last token == eos
    count: jax.Array            # () int32 — tokens emitted per beam
    best_score: jax.Array       # () f32 — best length-penalized finished
    best_tokens: jax.Array      # (max_new,) int32 snapshot
    best_lps: jax.Array         # (max_new,) f32 snapshot
    best_len: jax.Array         # () int32


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam_size", "max_new_tokens", "eos_token_id",
                     "cache_max_ctx", "cache_dtype", "length_penalty",
                     "repetition_penalty"))
def beam_search_on_device(
    params,
    cfg,
    prefill: jax.Array,            # (1, T0, D) — single stream
    suppress_mask: jax.Array | None = None,
    suppress_first: jax.Array | None = None,  # (V,) mask for step 0 only
    *,
    beam_size: int,
    max_new_tokens: int,
    eos_token_id: int,
    cache_max_ctx: int,
    cache_dtype=jnp.bfloat16,
    length_penalty: float = -1.0,
    repetition_penalty: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Beam search entirely under one ``lax.while_loop`` — expand/top-k over
    K·V, KV-cache hypothesis reorder as an in-loop gather (≙ the reference's
    kv_cache seq_cp scaffolding, src/qwen2-whisper.cpp:1048-1064), zero host
    round-trips per step (the host loop pays ~2 tunnel RTTs per token).

    Semantics mirror runtime/decoding.py::beam_search exactly: finished
    hypotheses are snapshotted the step they emit EOS (their slot is then
    recycled by live expansions), and the winner is the best length-penalized
    score over snapshots and final beams.

    Returns (tokens (max_new,), logprobs (max_new,), n_tokens (),
    first_logits (1, V)) of the best hypothesis; entries past n_tokens
    are padding.
    """
    from qwen2_audio_tpu.runtime.decoding import _prefill_flash
    from qwen2_audio_tpu.runtime.sampling import length_penalty_score

    _, T0, _ = prefill.shape
    K, V = beam_size, cfg.vocab_size

    cache1 = create_cache(cfg, 1, cache_max_ctx, dtype=cache_dtype)
    logits, cache1 = decoder_forward(params, cfg, prefill, cache1, 0,
                                     block_only=True, logits_last_only=True,
                                     use_flash=_prefill_flash())
    # prefill once, tile across beams (K x fewer prefill FLOPs)
    from qwen2_audio_tpu.models.qwen2_decoder import tile_cache
    cache = tile_cache(cache1, K)

    first_logits = logits[:, -1]
    lp0 = jax.nn.log_softmax(first_logits, axis=-1)[0]
    if suppress_mask is not None:
        lp0 = lp0 + suppress_mask
    if suppress_first is not None:
        lp0 = lp0 + suppress_first

    first_lp, first_tok = jax.lax.top_k(lp0, K)
    tokens = jnp.full((K, max_new_tokens), eos_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(first_tok)
    logprobs = jnp.zeros((K, max_new_tokens), jnp.float32)
    logprobs = logprobs.at[:, 0].set(first_lp)
    seen = jnp.zeros((K, V), bool).at[jnp.arange(K), first_tok].set(True)
    done = first_tok == eos_token_id

    def record_finished(s_best, scores, tokens, logprobs, newly_done, count):
        """Snapshot the best newly finished hypothesis into the running
        best (score already includes the EOS token's log-prob, as in the
        host implementation)."""
        best_score, best_tokens, best_lps, best_len = s_best
        pen = length_penalty_score(scores, count, length_penalty)
        fin = jnp.where(newly_done, pen, -jnp.inf)
        i = jnp.argmax(fin)
        better = fin[i] > best_score
        return (jnp.where(better, fin[i], best_score),
                jnp.where(better, tokens[i], best_tokens),
                jnp.where(better, logprobs[i], best_lps),
                jnp.where(better, count, best_len))

    best0 = record_finished(
        (jnp.float32(-jnp.inf), tokens[0], logprobs[0], jnp.int32(0)),
        first_lp, tokens, logprobs, done, jnp.int32(1))

    state = BeamState(cache=cache, scores=first_lp, tokens=tokens,
                      logprobs=logprobs, seen=seen, done=done,
                      count=jnp.int32(1), best_score=best0[0],
                      best_tokens=best0[1], best_lps=best0[2],
                      best_len=best0[3])

    def cond(s: BeamState):
        return ((s.count < max_new_tokens) & ~jnp.all(s.done)
                & (T0 + s.count < cache_max_ctx))

    def body(s: BeamState):
        tok_last = jax.lax.dynamic_slice_in_dim(
            s.tokens, s.count - 1, 1, axis=1)            # (K, 1)
        x = params["embed"][tok_last[:, 0]][:, None, :]
        logits, cache = decoder_forward(params, cfg, x, s.cache,
                                        T0 + s.count - 1)
        raw = logits[:, -1]                              # (K, V)
        pen = apply_repetition_penalty(raw, s.seen, repetition_penalty)
        lp = jax.nn.log_softmax(pen, axis=-1)
        if suppress_mask is not None:
            lp = lp + suppress_mask[None, :]

        cand = jnp.where(s.done[:, None], -jnp.inf, s.scores[:, None] + lp)
        top_scores, best = jax.lax.top_k(cand.reshape(-1), K)
        src = best // V
        nxt = (best % V).astype(jnp.int32)

        # hypothesis reorder; skipped when src is the identity (common case)
        cache = jax.lax.cond(
            jnp.all(src == jnp.arange(K)),
            lambda c: c, lambda c: c.reorder(src), cache)

        tokens = jax.lax.dynamic_update_slice(
            s.tokens[src], nxt[:, None], (0, s.count))
        step_lp = lp[src, nxt]
        logprobs = jax.lax.dynamic_update_slice(
            s.logprobs[src], step_lp[:, None], (0, s.count))
        seen = s.seen[src].at[jnp.arange(K), nxt].set(True)
        done = nxt == eos_token_id
        count = s.count + 1

        best = record_finished(
            (s.best_score, s.best_tokens, s.best_lps, s.best_len),
            top_scores, tokens, logprobs, done, count)
        return BeamState(cache=cache, scores=top_scores, tokens=tokens,
                         logprobs=logprobs, seen=seen, done=done,
                         count=count, best_score=best[0],
                         best_tokens=best[1], best_lps=best[2],
                         best_len=best[3])

    f = jax.lax.while_loop(cond, body, state)

    # final selection: all surviving beams compete with the snapshots
    # (finished beams were already recorded; re-scoring them is a no-op)
    final_pen = length_penalty_score(f.scores, f.count, length_penalty)
    all_scores = jnp.concatenate([final_pen, f.best_score[None]])
    i = jnp.argmax(all_scores)
    from_beam = i < K
    ib = jnp.minimum(i, K - 1)
    out_tokens = jnp.where(from_beam, f.tokens[ib], f.best_tokens)
    out_lps = jnp.where(from_beam, f.logprobs[ib], f.best_lps)
    n = jnp.where(from_beam, f.count, f.best_len)
    return out_tokens, out_lps, n, first_logits


def beam_search_device(bundle, prefill, *, beam_size: int,
                       max_new_tokens: int, length_penalty: float = -1.0,
                       repetition_penalty: float = 1.0, suppress_mask=None,
                       suppress_first=None):
    """DecoderBundle entry mirroring runtime/decoding.py::beam_search —
    drop-in device-resident fast path (one host transfer total)."""
    import numpy as np
    from qwen2_audio_tpu.runtime.decoding import GenerationResult

    _, T0, _ = prefill.shape
    if T0 >= bundle.max_ctx:
        raise ValueError(
            f"prefill length {T0} exceeds DecoderBundle.max_ctx "
            f"{bundle.max_ctx}; raise max_ctx when attaching the decoder")
    max_ctx = min(bundle.max_ctx, T0 + max_new_tokens)
    sup = None if suppress_mask is None else jnp.asarray(suppress_mask)
    sup0 = None if suppress_first is None else jnp.asarray(suppress_first)
    tokens, lps, n, first_logits = beam_search_on_device(
        bundle.params, bundle.cfg, prefill, sup, sup0,
        beam_size=beam_size,
        max_new_tokens=max_new_tokens,
        eos_token_id=bundle.eos_token_id,
        cache_max_ctx=max_ctx,
        cache_dtype=bundle.cache_dtype,
        length_penalty=length_penalty,
        repetition_penalty=repetition_penalty,
    )
    n = int(n)
    toks = np.asarray(tokens)[:n].tolist()
    lps = np.asarray(lps)[:n].tolist()
    return GenerationResult(tokens=[toks], logprobs=[lps],
                            avg_logprob=[float(np.mean(lps)) if lps else 0.0],
                            first_logits=np.asarray(first_logits))


def greedy_decode_device(bundle, prefill, *, max_new_tokens: int,
                         temperature: float = 0.0, top_k: int = 0,
                         repetition_penalty: float = 1.0, seed: int = 0,
                         suppress_mask=None, cache_ctx: int | None = None,
                         spec_k: int = 0, ngram: int = 2,
                         suppress_first=None):
    """DecoderBundle entry returning the same GenerationResult shape as the
    host loop (runtime/decoding.py) — drop-in fast path.

    ``spec_k > 0`` routes through generate_speculative (B=1 greedy only:
    n-gram self-drafting, spec_k drafts verified per forward — identical
    output, fewer weight passes)."""
    import numpy as np
    from qwen2_audio_tpu.runtime.decoding import GenerationResult

    B, T0, _ = prefill.shape
    if T0 >= bundle.max_ctx:
        raise ValueError(
            f"prefill length {T0} exceeds DecoderBundle.max_ctx "
            f"{bundle.max_ctx}; raise max_ctx when attaching the decoder")
    # default: size the cache to this call; cache_ctx overrides (e.g. to
    # bench/serve with worst-case capacity while streams stay short)
    max_ctx = cache_ctx or min(bundle.max_ctx, T0 + max_new_tokens)
    sup = None if suppress_mask is None else jnp.asarray(suppress_mask)
    sup0 = None if suppress_first is None else jnp.asarray(suppress_first)
    if spec_k > 0:
        if temperature > 0 or repetition_penalty != 1.0 or top_k > 0:
            raise ValueError("speculative path is exact for plain greedy "
                             "only (temperature=0, no penalties)")
        # capacity parity with the plain path: generate_on_device stops at
        # T0 + count < max_ctx, so clamp the spec budget to the same bound
        # — the cache still grows by the spec_k verification slack
        # (generate_speculative requires it), but a caller-limited
        # cache_ctx yields IDENTICAL output to spec_k=0
        eff_new = min(max_new_tokens, max(max_ctx - T0, 0))
        tokens, logprobs, count, last_logits, first_logits, iters = \
            generate_speculative(
                bundle.params, bundle.cfg, prefill, sup, sup0,
                max_new_tokens=eff_new,
                eos_token_id=bundle.eos_token_id,
                cache_max_ctx=max(max_ctx, T0 + eff_new + spec_k),
                cache_dtype=bundle.cache_dtype,
                spec_k=spec_k, ngram=ngram)
    else:
        tokens, logprobs, count, last_logits, first_logits = \
            generate_on_device(
                bundle.params, bundle.cfg, prefill, sup, sup0,
                max_new_tokens=max_new_tokens,
                eos_token_id=bundle.eos_token_id,
                cache_max_ctx=max_ctx,
                cache_dtype=bundle.cache_dtype,
                temperature=temperature,
                repetition_penalty=repetition_penalty,
                top_k=top_k,
                seed=seed,
            )
    tokens = np.asarray(tokens)
    logprobs = np.asarray(logprobs)
    n_gen = int(count)          # beyond this the buffer is EOS *padding*
    out_t, out_l = [], []
    for b in range(B):
        row = tokens[b, :n_gen].tolist()
        if bundle.eos_token_id in row:
            n = row.index(bundle.eos_token_id) + 1
        else:
            n = len(row)
        out_t.append(row[:n])
        out_l.append(logprobs[b, :n].tolist())
    return GenerationResult(
        tokens=out_t, logprobs=out_l,
        avg_logprob=[float(np.mean(l)) if l else 0.0 for l in out_l],
        final_logits=np.asarray(last_logits),
        first_logits=np.asarray(first_logits))


# --------------------------------------------------------------------------- #
# Continuous batching (iteration-level scheduling): a fixed pool of decode
# slots over ONE shared KV cache; finished slots are refilled with new
# streams while the others keep decoding. The reference has nothing like
# it (whisper_full_parallel was declared and never implemented,
# include/qwen2-whisper.h:464-469); this is the vLLM-style serving shape
# expressed TPU-natively: static shapes, per-slot positions as a traced
# (B,) vector, refill as dynamic_update_slice on the batch axis.
# --------------------------------------------------------------------------- #

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tp_axis"),
    donate_argnames=("cache", "slot_pos", "slot_logits", "slot_active"))
def prefill_slot(params, cfg, cache, slot_pos, slot_logits, slot_active,
                 slot: jax.Array, prefill: jax.Array,
                 tp_axis: str | None = None):
    """Prefill ONE stream (1, T0, D) and install it into slot `slot` of
    the shared pool: its K/V block lands at cache[:, slot, :T0], its
    next-token logits into slot_logits[slot]. One executable per T0."""
    _, T0, _ = prefill.shape
    mini = create_cache(cfg, 1, T0, dtype=(jnp.int8 if isinstance(
        cache, QuantKVCache) else cache.k.dtype))
    from qwen2_audio_tpu.runtime.decoding import _prefill_flash
    logits, mini = decoder_forward(params, cfg, prefill, mini, 0,
                                   block_only=True, logits_last_only=True,
                                   use_flash=_prefill_flash(),
                                   tp_axis=tp_axis)
    if tp_axis is not None and not cfg.tie_word_embeddings:
        # column-split lm_head: slot_logits state is full-vocab
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)

    def install(buf, block):
        # buf (L, B, S, ...) <- block (L, 1, T0, ...) at batch index `slot`
        start = (0, slot, 0) + (0,) * (buf.ndim - 3)
        return jax.lax.dynamic_update_slice(buf, block.astype(buf.dtype),
                                            start)

    if isinstance(cache, QuantKVCache):
        cache = QuantKVCache(
            k_q=install(cache.k_q, mini.k_q), k_s=install(cache.k_s, mini.k_s),
            v_q=install(cache.v_q, mini.v_q), v_s=install(cache.v_s, mini.v_s),
            pos=cache.pos)
    else:
        cache = KVCache(k=install(cache.k, mini.k),
                        v=install(cache.v, mini.v), pos=cache.pos)
    slot_pos = jax.lax.dynamic_update_slice(
        slot_pos, jnp.full((1,), T0, slot_pos.dtype), (slot,))
    slot_logits = jax.lax.dynamic_update_slice(
        slot_logits, logits[:, -1].astype(slot_logits.dtype), (slot, 0))
    slot_active = jax.lax.dynamic_update_slice(
        slot_active, jnp.ones((1,), bool), (slot,))
    return cache, slot_pos, slot_logits, slot_active


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "eos_token_id", "tp_axis"),
    donate_argnames=("cache", "slot_pos", "slot_logits", "slot_active"))
def decode_chunk_slots(params, cfg, cache, slot_pos, slot_logits,
                       slot_active, suppress_mask=None, *,
                       chunk: int, eos_token_id: int,
                       tp_axis: str | None = None):
    """Advance every ACTIVE slot by up to `chunk` tokens (inactive slots
    are frozen: no cache writes, no position advance). Returns
    (cache, slot_pos, slot_logits, slot_active, tokens (B, chunk),
    logprobs (B, chunk)); tokens of frozen/finished steps read
    eos_token_id. Per-slot positions drive rope, the causal mask and the
    cache scatter, so slots at different depths coexist in one program."""
    B = slot_pos.shape[0]
    S = (cache.k_q if isinstance(cache, QuantKVCache) else cache.k).shape[2]
    toks0 = jnp.full((B, chunk), eos_token_id, jnp.int32)
    lps0 = jnp.zeros((B, chunk), jnp.float32)

    def body(i, st):
        cache, pos, logits, active, toks, lps = st
        lg = logits if suppress_mask is None else logits + suppress_mask
        logp = jax.nn.log_softmax(lg, axis=-1)
        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        tok = jnp.where(active, tok, eos_token_id)
        lp = jnp.where(
            active,
            jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0], 0.0)
        toks = jax.lax.dynamic_update_slice(toks, tok[:, None], (0, i))
        lps = jax.lax.dynamic_update_slice(lps, lp[:, None], (0, i))
        new_active = active & (tok != eos_token_id) & (pos + 1 < S)

        x = params["embed"][tok][:, None, :]
        # inactive slots must not corrupt their cache rows (position pos
        # holds real data for the finished stream until refill), so their
        # dummy write is parked on scratch row S-1. Garbage at S-1 is safe:
        # the capacity guard (pos + 1 < S) freezes any stream before it
        # would READ row S-1, and an active stream that legitimately writes
        # S-1 does so on its own final step, overwriting the scratch.
        write_pos = jnp.where(active, pos, S - 1)
        new_logits, cache = decoder_forward(params, cfg, x, cache, write_pos,
                                            tp_axis=tp_axis)
        if tp_axis is not None and not cfg.tie_word_embeddings:
            new_logits = jax.lax.all_gather(new_logits, tp_axis, axis=-1,
                                            tiled=True)
        logits = jnp.where(active[:, None], new_logits[:, -1], logits)
        pos = jnp.where(active, pos + 1, pos)
        return cache, pos, logits, new_active & active, toks, lps

    cache, slot_pos, slot_logits, slot_active, toks, lps = jax.lax.fori_loop(
        0, chunk, body,
        (cache, slot_pos, slot_logits, slot_active, toks0, lps0))
    return cache, slot_pos, slot_logits, slot_active, toks, lps


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "chunk", "eos_token_id", "spec_k", "ngram",
                     "tp_axis"),
    donate_argnames=("cache", "slot_pos", "slot_logits", "slot_active",
                     "slot_hist", "slot_hlen"))
def decode_chunk_slots_spec(params, cfg, cache, slot_pos, slot_logits,
                            slot_active, slot_hist, slot_hlen,
                            suppress_mask=None, *,
                            chunk: int, eos_token_id: int,
                            spec_k: int = 7, ngram: int = 2,
                            tp_axis: str | None = None):
    """Batched-speculative variant of decode_chunk_slots: every ACTIVE
    slot self-drafts ``spec_k`` tokens from its own n-gram history and
    verifies them in one (B, spec_k+1) forward — the generate_speculative
    trick lifted to the continuous-batching slot pool. Decode at small B
    is still HBM-bound (the forward reads the same weight bytes whether
    each slot carries 1 or K+1 positions), so aggregate tokens/s
    multiplies by the mean accepted length across slots.

    Per-slot state beyond decode_chunk_slots: ``slot_hist`` (B, HBUF)
    int32 emitted-token history (drafting source; reset a row on refill)
    and ``slot_hlen`` (B,) int32 valid lengths. Returns
    (cache, slot_pos, slot_logits, slot_active, slot_hist, slot_hlen,
    toks (B, chunk + spec_k + 1), lps, n_new (B,), iters ()): exactly
    ``n_new[b]`` leading entries of row b are newly emitted tokens
    (greedy-exact wrt the plain path at f32); the rest is padding;
    ``iters`` counts verify forwards (mean accepted length per slot =
    n_new / iters).

    Capacity semantics match the plain pool EXACTLY: the accepted suffix
    is clamped to the remaining cache rows (last token may write row
    S-1; the slot freezes once pos reaches S), so whether speculation is
    enabled never changes what a capacity-limited stream emits.
    Frozen/finished slots still ride the batched forward but their
    writes land above their live rows (every row is rewritten before it
    is first read; out-of-range rows are dropped by scatter semantics,
    models/qwen2_decoder.py).

    No reference analog: its decode scaffolding is one token per graph
    launch (src/qwen2-whisper.cpp:2675 commented decode path); this
    composes two TPU-native levers (per-slot positions + prompt-lookup
    verification) the reference has neither of.
    """
    B = slot_pos.shape[0]
    S = (cache.k_q if isinstance(cache, QuantKVCache) else cache.k).shape[2]
    K = spec_k
    HBUF = slot_hist.shape[1]
    OUT = chunk + K + 1
    bidx = jnp.arange(B)
    sup = (jnp.zeros_like(slot_logits[0]) if suppress_mask is None
           else suppress_mask)

    toks0 = jnp.full((B, OUT), eos_token_id, jnp.int32)
    lps0 = jnp.zeros((B, OUT), jnp.float32)
    emitted0 = jnp.zeros((B,), jnp.int32)

    def cond(st):
        (_, _, _, active, _, _, _, _, emitted, it) = st
        return jnp.any(active & (emitted < chunk)) & (it < chunk)

    def body(st):
        (cache, pos, logits, active, hist, hlen, toks, lps, emitted, it) = st
        lg = logits + sup[None, :]
        d0 = jnp.argmax(lg, axis=-1).astype(jnp.int32)          # (B,)

        # --- per-slot n-gram draft from its own history ---------------
        tail_idx = (jnp.maximum(hlen - (ngram - 1), 0)[:, None]
                    + jnp.arange(ngram - 1)[None, :])            # (B, n-1)
        tail = jnp.concatenate([
            jnp.take_along_axis(hist, jnp.minimum(tail_idx, HBUF - 1),
                                axis=1),
            d0[:, None]], axis=1)                                # (B, n)
        wins = jnp.stack([jnp.roll(hist, -j, axis=1)
                          for j in range(ngram)], axis=2)        # (B,HBUF,n)
        idx = jnp.arange(HBUF)[None, :]
        match = (jnp.all(wins == tail[:, None, :], axis=2)
                 & (idx <= (hlen - ngram)[:, None]))
        best = jnp.max(jnp.where(match, idx, -1), axis=1)        # (B,)
        found = best >= 0
        start = jnp.where(found, best + ngram, 0)
        didx = start[:, None] + jnp.arange(K)[None, :]           # (B, K)
        draft = jnp.take_along_axis(hist, jnp.minimum(didx, HBUF - 1),
                                    axis=1)
        valid = found[:, None] & (didx < hlen[:, None])
        draft = jnp.where(valid, draft, d0[:, None])             # (B, K)

        # --- one (B, K+1) verify forward -------------------------------
        seq = jnp.concatenate([d0[:, None], draft], axis=1)     # (B, K+1)
        x = params["embed"][seq]                                 # (B,K+1,D)
        logits_out, cache = decoder_forward(params, cfg, x, cache, pos,
                                            tp_axis=tp_axis)
        if tp_axis is not None and not cfg.tie_word_embeddings:
            logits_out = jax.lax.all_gather(logits_out, tp_axis, axis=-1,
                                            tiled=True)
        rows = logits_out + sup[None, None, :]                   # (B,K+1,V)
        tgt = jnp.argmax(rows, axis=-1).astype(jnp.int32)        # (B, K+1)

        ok = (draft == tgt[:, :K]).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)         # (B,)
        n_emit = n_acc + 1                                       # d0 lands

        epos = jnp.arange(K + 1)[None, :]
        eos_here = (seq == eos_token_id) & (epos < n_emit[:, None])
        eos_in = jnp.any(eos_here, axis=1)
        idx_eos = jnp.argmax(eos_here, axis=1)
        n_emit = jnp.where(eos_in, jnp.minimum(n_emit, idx_eos + 1), n_emit)
        n_emit = jnp.minimum(n_emit, chunk - emitted)
        # capacity: the plain pool emits its last token writing row S-1
        # (then freezes with pos == S); clamping the accepted suffix —
        # instead of freezing whole verify blocks early — keeps emission
        # counts EXACTLY equal to the plain path at the cache boundary
        # (clamped queries only read rows <= pos + t <= S-1, all written)
        n_emit = jnp.minimum(n_emit, jnp.maximum(S - pos, 0))
        n_emit = jnp.where(active, n_emit, 0)
        # the EOS only ends the stream if it actually landed within the
        # chunk budget; a clipped EOS re-emerges as next round's argmax
        eos_emitted = eos_in & (idx_eos < n_emit)

        logp_prev = jax.nn.log_softmax(lg, axis=-1)
        logp_rows = jax.nn.log_softmax(rows, axis=-1)
        lp = jnp.concatenate([
            jnp.take_along_axis(logp_prev, d0[:, None], axis=1),
            jnp.take_along_axis(logp_rows[:, :K], draft[:, :, None],
                                axis=2)[:, :, 0]], axis=1)       # (B, K+1)

        # scatter this round's block at each slot's emitted offset; the
        # overhang past n_emit is overwritten by the next round (or
        # masked by the final n_new count)
        ocols = emitted[:, None] + jnp.arange(K + 1)[None, :]    # (B, K+1)
        wmask = active[:, None] & (ocols < OUT)
        osafe = jnp.minimum(ocols, OUT - 1)
        toks = toks.at[bidx[:, None], osafe].set(
            jnp.where(wmask, seq, toks[bidx[:, None], osafe]))
        lps = lps.at[bidx[:, None], osafe].set(
            jnp.where(wmask, lp.astype(jnp.float32),
                      lps[bidx[:, None], osafe]))

        # history append (drafting source): same scatter discipline
        hcols = hlen[:, None] + jnp.arange(K + 1)[None, :]
        hmask = active[:, None] & (hcols < HBUF)
        hsafe = jnp.minimum(hcols, HBUF - 1)
        hist = hist.at[bidx[:, None], hsafe].set(
            jnp.where(hmask, seq, hist[bidx[:, None], hsafe]))
        hlen = jnp.minimum(hlen + n_emit, HBUF)

        # next-step distribution: RAW logits at the LAST emitted position
        # of this round (sup is re-applied at read time, exactly like the
        # plain path); frozen/zero-emit slots keep their carried logits
        last = jnp.take_along_axis(
            logits_out, jnp.maximum(n_emit - 1, 0)[:, None, None],
            axis=1)[:, 0]
        keep = n_emit > 0
        logits = jnp.where(keep[:, None], last, logits)

        pos = pos + n_emit
        # freeze: eos emitted, or the cache is exhausted (the plain pool's
        # new_active criterion is old_pos + 1 < S == new_pos < S). A
        # frozen slot keeps riding the batched forward; its block writes
        # land above its live rows (rewritten before any read) or out of
        # range (dropped by scatter semantics).
        active = active & ~eos_emitted & (pos < S)
        emitted = emitted + n_emit
        return (cache, pos, logits, active, hist, hlen, toks, lps,
                emitted, it + 1)

    st = (cache, slot_pos, slot_logits, slot_active, slot_hist, slot_hlen,
          toks0, lps0, emitted0, jnp.zeros((), jnp.int32))
    (cache, slot_pos, slot_logits, slot_active, slot_hist, slot_hlen,
     toks, lps, emitted, iters) = jax.lax.while_loop(cond, body, st)

    live = jnp.arange(OUT)[None, :] < emitted[:, None]
    toks = jnp.where(live, toks, eos_token_id)
    lps = jnp.where(live, lps, 0.0)
    return (cache, slot_pos, slot_logits, slot_active, slot_hist,
            slot_hlen, toks, lps, emitted, iters)
