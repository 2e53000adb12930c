"""Token sampling: greedy, temperature with top-k/top-p, repetition penalty.

Parity targets: the reference's surviving sampling helpers
``gpt_sample_top_k_top_p`` / ``gpt_sample_top_k_top_p_repeat``
(examples/common.cpp:750-911) and the whisper_full_params decode knobs
(include/qwen2-whisper.h:359-437). Device-side (jit) so decode steps never
ship full logits to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def apply_repetition_penalty(logits: jax.Array, seen_mask: jax.Array,
                             penalty: float) -> jax.Array:
    """HF-convention penalty on tokens already generated: positive logits
    divided, negative multiplied (≙ repeat_penalty in
    gpt_sample_top_k_top_p_repeat, examples/common.cpp:851-872)."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def top_k_top_p_filter(logits: jax.Array, top_k: int, top_p: float
                       ) -> jax.Array:
    """Mask logits outside top-k / nucleus top-p (examples/common.cpp:764-820)."""
    V = logits.shape[-1]
    if 0 < top_k < V:
        kth = jnp.sort(logits, axis=-1)[..., V - top_k]
        logits = jnp.where(logits < kth[..., None], -jnp.inf, logits)
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always >= 1 token)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[..., None],
                                     axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


@functools.partial(
    jax.jit,
    static_argnames=("temperature", "repetition_penalty", "top_k", "top_p"))
def sample_token(
    logits: jax.Array,          # (B, V) last-position logits
    seen_mask: jax.Array,       # (B, V) bool — tokens already generated
    key: jax.Array,
    temperature: float = 0.0,
    repetition_penalty: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Returns (token_ids (B,), token_logprobs (B,)). temperature==0 -> argmax.

    The knobs are static: the fallback schedule uses a handful of distinct
    temperatures, each worth its own specialized executable."""
    logits = apply_repetition_penalty(logits, seen_mask, repetition_penalty)
    logprobs = jax.nn.log_softmax(logits, axis=-1)

    if temperature > 0:
        f = top_k_top_p_filter(logits / max(temperature, 1e-6), top_k, top_p)
        tok = jax.random.categorical(key, f, axis=-1)
    else:
        tok = jnp.argmax(logits, axis=-1)
    lp = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
    return tok, lp


def length_penalty_score(score: jax.Array, length: jax.Array,
                         penalty: float) -> jax.Array:
    """Beam score normalization: penalty < 0 -> simple length normalization;
    else the GNMT ((5+len)/6)^penalty rule (openai/whisper decoding.py,
    referenced from whisper_full_params :410)."""
    length = jnp.maximum(length, 1)
    if penalty < 0:
        return score / length
    return score / ((5.0 + length) / 6.0) ** penalty
