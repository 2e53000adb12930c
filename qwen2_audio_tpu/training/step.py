"""Sharded training step for the multimodal model (fine-tuning the encoder +
projector + Qwen2 LM on audio->text pairs).

The reference is inference-only; this subsystem exists because a TPU-native
framework's params are functional pytrees — grad/optimizer come for free —
and because the driver validates the multi-chip sharding path on a training
step (tp over heads/ffn via parallel/mesh.py specs, dp over batch).

Loss: next-token cross-entropy on the text region of
    [audio embeddings (A frames)] ++ [text tokens (T)]
with a per-token mask (prompt tokens can be masked out).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qwen2_audio_tpu.config import Qwen2AudioConfig
from qwen2_audio_tpu.models.encoder import encoder_forward, random_encoder_params
from qwen2_audio_tpu.models.qwen2_decoder import (
    KVCache,
    decoder_forward,
    random_decoder_params,
)


class TrainState(NamedTuple):
    params: Any          # {"encoder", "proj_w", "proj_b", "decoder"}
    opt_state: Any
    step: jax.Array


def init_train_state(rng: np.random.Generator, cfg: Qwen2AudioConfig,
                     optimizer: optax.GradientTransformation,
                     dtype=jnp.float32) -> TrainState:
    params = {
        "encoder": random_encoder_params(rng, cfg.audio, dtype=dtype),
        "proj_w": jnp.asarray(
            rng.standard_normal((cfg.audio.n_audio_state,
                                 cfg.text.hidden_size)) * 0.02, dtype=dtype),
        "proj_b": jnp.zeros(cfg.text.hidden_size, dtype=dtype),
        "decoder": random_decoder_params(rng, cfg.text, dtype=dtype),
    }
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def loss_fn(params: Any, cfg: Qwen2AudioConfig,
            mel: jax.Array,            # (B, n_mels, 2*n_ctx)
    tokens: jax.Array,                 # (B, T) int32
    loss_mask: jax.Array,              # (B, T) float — 1 where loss counts
) -> jax.Array:
    enc = encoder_forward(params["encoder"], mel, cfg.audio)   # (B, A, E)
    audio = enc @ params["proj_w"] + params["proj_b"]          # (B, A, D)

    tok_embeds = params["decoder"]["embed"][tokens]            # (B, T, D)
    embeds = jnp.concatenate([audio.astype(tok_embeds.dtype), tok_embeds],
                             axis=1)
    B, S, _ = embeds.shape
    cache = KVCache.create(cfg.text, B, S, dtype=embeds.dtype)
    logits, _ = decoder_forward(params["decoder"], cfg.text, embeds, cache, 0,
                                block_only=True)

    A = audio.shape[1]
    T = tokens.shape[1]
    # position A-1+j predicts token j (next-token objective over the text)
    pred = logits[:, A - 1: A - 1 + T]
    logp = jax.nn.log_softmax(pred, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1.0)


def make_train_step(cfg: Qwen2AudioConfig,
                    optimizer: optax.GradientTransformation):
    """Returns a jittable (state, mel, tokens, loss_mask) -> (state, loss).

    Shard by placing state/batch with parallel.mesh specs before calling;
    GSPMD inserts the tp all-reduces and dp gradient psums.
    """

    @functools.partial(jax.jit, donate_argnames=("state",))
    def train_step(state: TrainState, mel, tokens, loss_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, cfg, mel, tokens, loss_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    return train_step
