"""Tensor-parallel decode through the production quant kernels (shard_map).

parallel/mesh.py's GSPMD specs let XLA auto-partition the DENSE/XLA decode
paths; Pallas custom calls, however, are opaque to the GSPMD partitioner
(it would replicate them). This module runs the SAME decoder_forward —
stacked scalar-prefetch quant kernels, int8 KV cache and all — under
``shard_map``: every device executes the full program on its local
Megatron shard and two psums per layer (after the row-parallel o and down
projections, models/qwen2_decoder.py::_layer tp_axis) ride the ICI.

Sharding layout (decoder_param_spec, parallel/mesh.py):
- q/k/v, gate/up, lm_head: column-parallel (heads / intermediate / vocab
  split across ``tp``);
- o, down: row-parallel (partial sums -> psum);
- KV cache: kv heads split across ``tp`` (kv_cache_spec), batch across
  ``dp`` when present;
- norms, embed, biases of row-parallel layers: replicated.

Requires the CANONICAL (unfused) layer schema: the fused "qkv"/"gate_up"
concat axes interleave q|k|v (gate|up) blocks, so a plain column split
would hand device 0 a chunk of q only. TP therefore runs separate
q/k/v/gate/up matmuls (measured neutral at decode: fusion was
-3%..+1.6%). The one-launch fused-MLP kernel DOES engage under TP via
the split-schema entry (ops/linear.py::fused_mlp_split_at — gate and up
blocks stream from the shard's own arrays) whenever the local
intermediate size admits a conforming block (ops/fused_mlp.py::
pick_block_i; 7B tp=2 qualifies, tp=4's I/4=4736=37*128 does not and
falls back to three launches — the honest VMEM guard, not a TP limit).

≙ the reference's only true TP analog: CUDA split-buffer row sharding with
peer-to-peer partial reduction (ggml/src/ggml-cuda.cu:1358,
ggml_backend_cuda_split_buffer_type) — rebuilt as mesh collectives.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from qwen2_audio_tpu.config import Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import KVCache, QuantKVCache
from qwen2_audio_tpu.parallel.mesh import decoder_param_spec


def tp_local_cfg(cfg: Qwen2DecoderConfig, tp: int) -> Qwen2DecoderConfig:
    """The per-shard view of the config: head counts and the SwiGLU
    intermediate size divide by ``tp`` (column-parallel splits); hidden
    size, rope and norm hyperparameters are replicated quantities."""
    if cfg.num_attention_heads % tp or cfg.num_key_value_heads % tp \
            or cfg.intermediate_size % tp:
        raise ValueError(
            f"tp={tp} must divide heads ({cfg.num_attention_heads}/"
            f"{cfg.num_key_value_heads}) and intermediate_size "
            f"({cfg.intermediate_size})")
    return dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp,
        intermediate_size=cfg.intermediate_size // tp)


def _cache_spec(cache, batch_axis: str | None):
    b = batch_axis
    if isinstance(cache, QuantKVCache):
        val = P(None, b, None, "tp", None)
        sc = P(None, b, None, "tp")
        return QuantKVCache(k_q=val, k_s=sc, v_q=val, v_s=sc, pos=P())
    return KVCache(k=P(None, b, None, "tp", None),
                   v=P(None, b, None, "tp", None), pos=P())


# one-entry memo for shard_decoder_for_tp: serving calls re-shard the
# same pytree every _serve_pool invocation, and a 7B transfer costs
# seconds before the first token. Strong refs keep the ids valid.
_SHARD_MEMO: dict = {}


def shard_decoder_for_tp(params, mesh: Mesh):
    """Place an (unfused) decoder pytree onto the mesh with the Megatron
    specs. Works for every weight form the runtime supports (dense,
    ggml-block strided/packed, w8a8). Memoized on (params, mesh) identity
    so repeated serving calls reuse the sharded copy."""
    key = (id(params), id(mesh))
    hit = _SHARD_MEMO.get(key)
    if hit is not None and hit[0] is params and hit[1] is mesh:
        return hit[2]
    if "qkv" in params["layers"] or "gate_up" in params["layers"]:
        raise ValueError(
            "TP requires the canonical unfused schema: the fused "
            "qkv/gate_up concat axes cannot be column-split (see module "
            "docstring); load without fuse_decoder_params")
    if any("qs_p" in v or "qs4_p" in v for v in params["layers"].values()
           if isinstance(v, dict)):
        raise ValueError("panelized layouts are single-chip; panelize "
                         "after sharding is not supported")
    from qwen2_audio_tpu.parallel.mesh import shard_params
    sharded = shard_params(params, decoder_param_spec(params), mesh)
    _SHARD_MEMO.clear()          # one entry: serving reuses one model
    _SHARD_MEMO[key] = (params, mesh, sharded)
    return sharded


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "block_only",
                                    "logits_last_only", "batch_axis"),
                   donate_argnames=("cache",))
def tp_decoder_forward(params, cfg: Qwen2DecoderConfig, mesh: Mesh,
                       inputs_embeds, cache, pos0, *,
                       block_only: bool = False,
                       logits_last_only: bool = False,
                       batch_axis: str | None = None):
    """decoder_forward over a TP mesh: (logits (B,T,V) REPLICATED, cache
    sharded as _cache_spec). ``pos0`` may be scalar or per-stream (B,).

    The local program is the unchanged single-chip decoder_forward with
    ``tp_axis`` psums; logits come back via one tiled all_gather over the
    column-split lm_head output."""
    from qwen2_audio_tpu.models.qwen2_decoder import decoder_forward

    tp = mesh.shape["tp"]
    lcfg = tp_local_cfg(cfg, tp)
    pspec = decoder_param_spec(params)
    cspec = _cache_spec(cache, batch_axis)
    xspec = P(batch_axis, None, None)
    posspec = P() if jnp.ndim(pos0) == 0 else P(batch_axis)

    def step(p, x, c, q):
        logits, new_cache = decoder_forward(
            p, lcfg, x, c, q, block_only=block_only,
            logits_last_only=logits_last_only, tp_axis="tp")
        if not cfg.tie_word_embeddings:
            # column-split lm_head: local (B, T, V/tp) -> full vocab
            logits = jax.lax.all_gather(logits, "tp", axis=-1, tiled=True)
        # tied embeddings: embed is replicated, logits already full-V
        return logits, new_cache

    fn = _shard_map(step, mesh, (pspec, xspec, cspec, posspec),
                    (P(batch_axis, None, None), cspec))
    return fn(params, inputs_embeds, cache, jnp.asarray(pos0, jnp.int32))


def _shard_map(step, mesh, in_specs, out_specs):
    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:                                     # jax >= 0.8
        return jax.shard_map(step, check_vma=False, **kw)
    except (AttributeError, TypeError):      # older jax
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(step, check_rep=False, **kw)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"),
                   donate_argnames=("cache",))
def tp_prefill_slot(params, cfg: Qwen2DecoderConfig, mesh: Mesh,
                    cache, slot_pos, slot_logits, slot_active,
                    slot, prefill):
    """generate.prefill_slot over a TP mesh: the stream's K/V block lands
    sharded on the kv-head axis; slot state stays replicated."""
    from qwen2_audio_tpu.runtime.generate import prefill_slot

    lcfg = tp_local_cfg(cfg, mesh.shape["tp"])
    pspec = decoder_param_spec(params)
    cspec = _cache_spec(cache, None)

    def step(p, c, sp_, sl, sa, s, pre):
        return prefill_slot(p, lcfg, c, sp_, sl, sa, s, pre, tp_axis="tp")

    fn = _shard_map(step, mesh,
                    (pspec, cspec, P(), P(), P(), P(), P()),
                    (cspec, P(), P(), P()))
    return fn(params, cache, slot_pos, slot_logits, slot_active,
              jnp.asarray(slot, jnp.int32), prefill)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "chunk", "eos_token_id",
                                    "spec_k", "ngram"),
                   donate_argnames=("cache",))
def tp_decode_chunk_slots_spec(params, cfg: Qwen2DecoderConfig, mesh: Mesh,
                               cache, slot_pos, slot_logits, slot_active,
                               slot_hist, slot_hlen, suppress_mask=None, *,
                               chunk: int, eos_token_id: int,
                               spec_k: int = 7, ngram: int = 2):
    """Batched-speculative slot decode over a TP mesh: every device runs
    the full while_loop on its Megatron shard; per-layer psums + one
    logits all_gather per verify forward ride the ICI. Slot state
    (positions, logits, history) is replicated; only weights and the KV
    cache are sharded. Multi-chip continuous-batching serving — nothing
    comparable exists in the reference (its split-buffer TP never met its
    never-merged decoder)."""
    from qwen2_audio_tpu.runtime.generate import decode_chunk_slots_spec

    lcfg = tp_local_cfg(cfg, mesh.shape["tp"])
    pspec = decoder_param_spec(params)
    cspec = _cache_spec(cache, None)

    def step(p, c, sp_, sl, sa, sh, shl, sup):
        return decode_chunk_slots_spec(
            p, lcfg, c, sp_, sl, sa, sh, shl, sup, chunk=chunk,
            eos_token_id=eos_token_id, spec_k=spec_k, ngram=ngram,
            tp_axis="tp")

    sup = (jnp.zeros((slot_logits.shape[1],), jnp.float32)
           if suppress_mask is None else suppress_mask)
    fn = _shard_map(step, mesh,
                    (pspec, cspec, P(), P(), P(), P(), P(), P()),
                    (cspec, P(), P(), P(), P(), P(), P(), P(), P(), P()))
    return fn(params, cache, slot_pos, slot_logits, slot_active,
              slot_hist, slot_hlen, sup)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "chunk", "eos_token_id"),
                   donate_argnames=("cache",))
def tp_decode_chunk_slots(params, cfg: Qwen2DecoderConfig, mesh: Mesh,
                          cache, slot_pos, slot_logits, slot_active,
                          suppress_mask=None, *,
                          chunk: int, eos_token_id: int):
    """Plain (non-speculative) chunk decode over a TP mesh — the
    speculative variant's fallback when FullParams.speculative_k == 0."""
    from qwen2_audio_tpu.runtime.generate import decode_chunk_slots

    lcfg = tp_local_cfg(cfg, mesh.shape["tp"])
    pspec = decoder_param_spec(params)
    cspec = _cache_spec(cache, None)

    def step(p, c, sp_, sl, sa, sup):
        return decode_chunk_slots(p, lcfg, c, sp_, sl, sa, sup,
                                  chunk=chunk, eos_token_id=eos_token_id,
                                  tp_axis="tp")

    sup = (jnp.zeros((slot_logits.shape[1],), jnp.float32)
           if suppress_mask is None else suppress_mask)
    fn = _shard_map(step, mesh,
                    (pspec, cspec, P(), P(), P(), P()),
                    (cspec, P(), P(), P(), P(), P()))
    return fn(params, cache, slot_pos, slot_logits, slot_active, sup)
