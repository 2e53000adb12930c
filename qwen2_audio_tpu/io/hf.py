"""HuggingFace Qwen2-Audio checkpoint loader (safetensors / torch bins).

The direct-checkpoint path that replaces the reference's two-step
convert-pt-to-ggml.py + whisper_model_load flow: read the HF layout
(config.json + model.safetensors[.index.json]) and build

    - encoder params   (audio_tower.*        -> models/encoder.py pytree)
    - decoder bundle   (language_model.* +
                        multi_modal_projector -> runtime DecoderBundle)

Weight names follow transformers' Qwen2AudioForConditionalGeneration; the
encoder subset is exactly the name map the ggml loader uses
(src/qwen2-whisper.cpp:1603-1662) prefixed with ``audio_tower.``.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import Qwen2DecoderConfig, WhisperHParams


def _load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """All tensors from a HF model dir (sharded safetensors, single file,
    or pytorch .bin fallback), as numpy arrays."""
    path = Path(path)
    sd: dict[str, np.ndarray] = {}

    index = path / "model.safetensors.index.json"
    singles = sorted(path.glob("*.safetensors"))
    if index.exists():
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        shards = sorted(set(weight_map.values()))
        from safetensors.numpy import load_file
        for shard in shards:
            sd.update(load_file(str(path / shard)))
    elif singles:
        from safetensors.numpy import load_file
        for f in singles:
            sd.update(load_file(str(f)))
    else:
        import torch
        bins = sorted(path.glob("pytorch_model*.bin"))
        if not bins:
            raise FileNotFoundError(f"no safetensors/bin weights in {path}")
        for b in bins:
            for k, v in torch.load(str(b), map_location="cpu",
                                   weights_only=True).items():
                sd[k] = v.float().numpy()
    return sd


def hparams_from_hf_config(cfg: dict) -> tuple[WhisperHParams,
                                               Qwen2DecoderConfig]:
    a = cfg.get("audio_config", cfg)
    t = cfg.get("text_config", cfg)
    hp = WhisperHParams(
        n_vocab=a.get("vocab_size", 51866),
        n_audio_ctx=a.get("max_source_positions", 1500),
        n_audio_state=a.get("d_model", 1280),
        n_audio_head=a.get("encoder_attention_heads", 20),
        n_audio_layer=a.get("encoder_layers", 32),
        n_mels=a.get("num_mel_bins", 128),
        ftype=1,
    )
    heads = t.get("num_attention_heads", 28)
    dec = Qwen2DecoderConfig(
        vocab_size=t.get("vocab_size", 156032),
        hidden_size=t.get("hidden_size", 3584),
        intermediate_size=t.get("intermediate_size", 18944),
        num_hidden_layers=t.get("num_hidden_layers", 28),
        num_attention_heads=heads,
        num_key_value_heads=t.get("num_key_value_heads", 4),
        head_dim=t.get("head_dim", t.get("hidden_size", 3584) // heads),
        max_position_embeddings=t.get("max_position_embeddings", 8192),
        rope_theta=t.get("rope_theta", 1_000_000.0),
        rms_norm_eps=t.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=cfg.get("tie_word_embeddings",
                                    t.get("tie_word_embeddings", False)),
        audio_token_id=cfg.get("audio_token_index", 151646),
    )
    return hp, dec


def encoder_params_from_hf_state_dict(sd: dict, hp: WhisperHParams,
                                      dtype=jnp.float32,
                                      prefix: str = "audio_tower.") -> dict:
    def g(name, transpose=False):
        a = np.asarray(sd[prefix + name], dtype=np.float32)
        return jnp.asarray(a.T if transpose else a, dtype=dtype)

    def lin(p, bias=True):
        d = {"w": g(p + ".weight", transpose=True)}
        if bias:
            d["b"] = g(p + ".bias")
        return d

    def ln(p):
        return {"w": g(p + ".weight"), "b": g(p + ".bias")}

    layers = []
    for i in range(hp.n_audio_layer):
        p = f"layers.{i}"
        layers.append({
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj", bias=False),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        })
    return {
        "conv1": {"w": g("conv1.weight"), "b": g("conv1.bias")},
        "conv2": {"w": g("conv2.weight"), "b": g("conv2.bias")},
        "pos": g("embed_positions.weight"),
        "layers": layers,
        "ln_post": ln("layer_norm"),
    }


def load_qwen2_audio(
    path: str | Path,
    dtype=jnp.bfloat16,
    cache_dtype=jnp.bfloat16,
    max_ctx: int = 2048,
    decoder_quant: str | None = None,   # None | "q8_0" | "q4_0" | "w8a8"
    fuse: bool | None = None,
    panel: bool | None = None,
) -> dict[str, Any]:
    """Load a full HF Qwen2-Audio checkpoint directory.

    ``decoder_quant``: quantize the LM weights at load — "q8_0"/"q4_0" keep
    ggml block semantics (Pallas dequant matmul), "w8a8" uses the int8-MXU
    fast path (2.5x decode throughput measured, coarser scales).

    ``fuse``: concatenate q/k/v -> qkv and gate/up -> gate_up
    (models/qwen2_decoder.py::fuse_decoder_params — the measured-best
    single-chip decode schema: fused MLP4 +2.6% on 7B q4_0, and the
    stacked-kernel headline configs all run it). Default ON; pass False
    for tensor parallelism (parallel/tp.py requires the canonical
    unfused schema to column-split).

    ``panel``: re-store ggml-block quant leaves in contiguous column
    panels (panelize_decoder_params; +3.6% e2e on 7B q4_0, queue-G A/B).
    Default (None) auto-enables for packed q4_0 when the panel kernels
    are hardware-validated on this host (marker qmm_q4panel) or on CPU.

    Returns {"hparams", "decoder_config", "encoder_params", "bundle",
    "tokenizer"(optional)}.
    """
    from qwen2_audio_tpu.models.qwen2_audio import bundle_from_hf_state_dict

    path = Path(path)
    with open(path / "config.json") as f:
        cfg = json.load(f)
    hp, dec_cfg = hparams_from_hf_config(cfg)
    sd = _load_state_dict(path)

    enc = encoder_params_from_hf_state_dict(sd, hp, dtype=dtype)

    detok = None
    eos = cfg.get("text_config", {}).get("eos_token_id", 151645)
    tokenizer = None
    if (path / "tokenizer.json").exists() or (path / "tokenizer_config.json").exists():
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(str(path))
            detok = tokenizer.decode
            if tokenizer.eos_token_id is not None:
                eos = tokenizer.eos_token_id
        except Exception:
            tokenizer = None

    bundle = bundle_from_hf_state_dict(
        sd, dec_cfg, eos_token_id=eos, detokenize=detok,
        dtype=dtype, max_ctx=max_ctx, cache_dtype=cache_dtype)
    if tokenizer is not None:
        from qwen2_audio_tpu.tokenizer import token_surface_to_bytes
        bundle.tokenize = lambda s: tokenizer.encode(s)
        # surfaces are byte-level-BPE encoded ('\u0120(' for ' ('); decode
        # to real text or the suppression matchers see mojibake
        bundle.token_bytes = (
            lambda i: token_surface_to_bytes(
                tokenizer.convert_ids_to_tokens(i) or ""))
        bundle.token_strings = (
            lambda i: bundle.token_bytes(i).decode("utf-8",
                                                   errors="replace"))

    if decoder_quant:
        from qwen2_audio_tpu.config import GGMLType
        from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
        if decoder_quant == "w8a8":
            bundle.params = quantize_decoder_params(
                bundle.params, GGMLType.Q8_0, mode="fast")
        else:
            ttype = (GGMLType.Q4_0 if decoder_quant == "q4_0"
                     else GGMLType.Q8_0)
            bundle.params = quantize_decoder_params(bundle.params, ttype)

    if fuse is None or fuse:
        from qwen2_audio_tpu.models.qwen2_decoder import fuse_decoder_params
        bundle.params = fuse_decoder_params(bundle.params)
    if panel is None:
        import os

        import jax
        panel = (decoder_quant == "q4_0"
                 and any("qs4" in v for v in bundle.params["layers"].values()
                         if isinstance(v, dict))
                 and (jax.default_backend() not in ("tpu", "axon")
                      or os.path.exists("/tmp/qa_kernel_ok_qmm_q4panel")))
    if panel:
        from qwen2_audio_tpu.models.qwen2_decoder import (
            panelize_decoder_params)
        bundle.params = panelize_decoder_params(bundle.params)

    return {"hparams": hp, "decoder_config": dec_cfg,
            "encoder_params": enc, "bundle": bundle, "tokenizer": tokenizer}
