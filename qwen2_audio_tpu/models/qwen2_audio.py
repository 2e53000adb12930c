"""Qwen2-Audio multimodal assembly: encoder tower + projector + Qwen2 LM.

The reference runs only the encoder (whisper_full returns after encode,
src/qwen2-whisper.cpp:2377-2383) and feeds the 750-frame embedding to an
external LM. Here the full pipeline is first-class, matching HF's
Qwen2AudioForConditionalGeneration layout:

    audio_tower            -> models/encoder.py  (ggml names :1603-1662)
    multi_modal_projector  -> Linear(enc_state -> hidden), bias
    language_model         -> models/qwen2_decoder.py
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import Qwen2AudioConfig, Qwen2DecoderConfig, WhisperHParams
from qwen2_audio_tpu.models.encoder import random_encoder_params
from qwen2_audio_tpu.models.qwen2_decoder import (
    decoder_params_from_hf_state_dict,
    random_decoder_params,
)
from qwen2_audio_tpu.runtime.decoding import DecoderBundle


def bundle_from_hf_state_dict(
    sd: dict,
    cfg: Qwen2DecoderConfig,
    *,
    eos_token_id: int,
    bos_tokens: list[int] | None = None,
    post_audio_tokens: list[int] | None = None,
    detokenize: Callable[[list[int]], str] | None = None,
    dtype=jnp.float32,
    max_ctx: int = 2048,
    cache_dtype=jnp.bfloat16,
) -> DecoderBundle:
    """Build the decode-side bundle from a HF Qwen2-Audio state dict
    (keys: multi_modal_projector.linear.*, language_model.model.*)."""
    dec = decoder_params_from_hf_state_dict(
        sd, cfg, dtype=dtype, prefix="language_model.model.",
        lm_head_key="language_model.lm_head.weight")
    return DecoderBundle(
        cfg=cfg,
        params=dec,
        proj_w=jnp.asarray(
            np.asarray(sd["multi_modal_projector.linear.weight"], np.float32).T,
            dtype=dtype),
        proj_b=jnp.asarray(
            np.asarray(sd["multi_modal_projector.linear.bias"], np.float32),
            dtype=dtype),
        eos_token_id=eos_token_id,
        bos_tokens=bos_tokens or [],
        post_audio_tokens=post_audio_tokens or [],
        detokenize=detokenize,
        max_ctx=max_ctx,
        cache_dtype=cache_dtype,
    )


def random_bundle(rng: np.random.Generator, cfg: Qwen2DecoderConfig,
                  enc_state: int, *, eos_token_id: int | None = None,
                  dtype=jnp.float32, max_ctx: int = 256,
                  cache_dtype=jnp.float32) -> DecoderBundle:
    dec = random_decoder_params(rng, cfg, dtype=dtype)
    return DecoderBundle(
        cfg=cfg,
        params=dec,
        proj_w=jnp.asarray(rng.standard_normal((enc_state, cfg.hidden_size))
                           * 0.02, dtype=dtype),
        proj_b=jnp.zeros(cfg.hidden_size, dtype=dtype),
        eos_token_id=cfg.vocab_size - 1 if eos_token_id is None else eos_token_id,
        bos_tokens=[0],
        post_audio_tokens=[1],
        max_ctx=max_ctx,
        cache_dtype=cache_dtype,
    )


def random_qwen2_audio(rng: np.random.Generator, cfg: Qwen2AudioConfig,
                       dtype=jnp.float32) -> tuple[Any, DecoderBundle]:
    """(encoder_params, decoder_bundle) with random weights."""
    enc = random_encoder_params(rng, cfg.audio, dtype=dtype)
    bundle = random_bundle(rng, cfg.text, cfg.audio.n_audio_state, dtype=dtype)
    return enc, bundle
