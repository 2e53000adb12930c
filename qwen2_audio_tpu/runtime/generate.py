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

from qwen2_audio_tpu.models.qwen2_decoder import KVCache, create_cache, decoder_forward
from qwen2_audio_tpu.runtime.sampling import apply_repetition_penalty


class GenState(NamedTuple):
    cache: KVCache
    last_logits: jax.Array      # (B, V)
    tokens: jax.Array           # (B, max_new) int32
    logprobs: jax.Array         # (B, max_new) f32
    seen: jax.Array             # (B, V) bool
    done: jax.Array             # (B,) bool
    count: jax.Array            # () int32 — steps emitted
    key: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_token_id", "temperature",
                     "repetition_penalty", "top_k", "cache_max_ctx",
                     "cache_dtype", "seed"))
def generate_on_device(
    params,
    cfg,
    prefill: jax.Array,            # (B, T0, D) embeddings
    suppress_mask: jax.Array | None = None,   # (V,) additive logits mask
    *,
    max_new_tokens: int,
    eos_token_id: int,
    cache_max_ctx: int,
    cache_dtype=jnp.bfloat16,
    temperature: float = 0.0,
    repetition_penalty: float = 1.0,
    top_k: int = 0,
    seed: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (tokens (B, max_new), logprobs (B, max_new), n_generated (),
    last_logits (B, V)).

    tokens[b, i] for i >= per-stream stop are padded with eos_token_id.
    """
    B, T0, D = prefill.shape
    V = cfg.vocab_size

    cache = create_cache(cfg, B, cache_max_ctx, dtype=cache_dtype)
    from qwen2_audio_tpu.runtime.decoding import _prefill_flash
    logits, cache = decoder_forward(params, cfg, prefill, cache, 0,
                                    block_only=True, logits_last_only=True,
                                    use_flash=_prefill_flash())

    state = GenState(
        cache=cache,
        last_logits=logits[:, -1],
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
        lg = apply_repetition_penalty(lg, s.seen, repetition_penalty)
        logp = jax.nn.log_softmax(lg, axis=-1)
        if temperature > 0:
            key, sub = jax.random.split(s.key)
            scaled = lg / max(temperature, 1e-6)
            if top_k > 0:
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
                        tokens=tokens, logprobs=logprobs, seen=seen,
                        done=done, count=s.count + 1, key=key)

    final = jax.lax.while_loop(cond, body, state)
    return final.tokens, final.logprobs, final.count, final.last_logits


def greedy_decode_device(bundle, prefill, *, max_new_tokens: int,
                         temperature: float = 0.0, top_k: int = 0,
                         repetition_penalty: float = 1.0, seed: int = 0,
                         suppress_mask=None):
    """DecoderBundle entry returning the same GenerationResult shape as the
    host loop (runtime/decoding.py) — drop-in fast path."""
    import numpy as np
    from qwen2_audio_tpu.runtime.decoding import GenerationResult

    B, T0, _ = prefill.shape
    if T0 >= bundle.max_ctx:
        raise ValueError(
            f"prefill length {T0} exceeds DecoderBundle.max_ctx "
            f"{bundle.max_ctx}; raise max_ctx when attaching the decoder")
    max_ctx = min(bundle.max_ctx, T0 + max_new_tokens)
    import jax.numpy as _jnp
    sup = None if suppress_mask is None else _jnp.asarray(suppress_mask)
    tokens, logprobs, count, last_logits = generate_on_device(
        bundle.params, bundle.cfg, prefill, sup,
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
        final_logits=np.asarray(last_logits))
