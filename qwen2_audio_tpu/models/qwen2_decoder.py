"""Qwen2 text decoder — the LM the reference fork targeted but never merged
(SURVEY.md §0.2; its decode scaffolding whisper_kv_cache/whisper_batch at
src/qwen2-whisper.cpp:449-500, 897-1084 is the spec this replaces).

TPU-first design:
- layer parameters are STACKED on a leading (n_layers, ...) axis and the
  block runs under ``jax.lax.scan`` — one trace for all layers, fast compile;
- the KV cache is a preallocated static-shape HBM ring (max_ctx), updated
  functionally with ``lax.dynamic_update_slice`` (≙ the reference's ring-slot
  cache with find_slot :966-1031, without data-dependent host control flow);
- GQA: K/V heads are stored once (num_kv_heads) and logically broadcast
  inside attention — no materialized repeat in HBM;
- decode step and prefill are the same function (T is a static shape,
  bucketed by the caller).

Architecture (Qwen2): RMSNorm, rotary embeddings (theta 1e6), attention with
Q/K/V biases + un-biased out-proj, SwiGLU MLP, tied-or-separate lm_head.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import Qwen2DecoderConfig

Params = dict[str, Any]


class KVCache(NamedTuple):
    """Static-shape KV cache: (n_layers, B, max_ctx, n_kv_heads, head_dim)."""

    k: jax.Array
    v: jax.Array
    pos: jax.Array          # () int32 — number of valid positions

    @classmethod
    def create(cls, cfg: Qwen2DecoderConfig, batch: int, max_ctx: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_ctx,
                 cfg.num_key_value_heads, cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   pos=jnp.zeros((), jnp.int32))

    @property
    def max_ctx(self) -> int:
        return self.k.shape[2]

    def reorder(self, beam_idx: jax.Array) -> "KVCache":
        """Gather cache rows along batch — beam-search hypothesis reordering
        (≙ whisper_kv_cache_seq_cp :1048-1064, as a gather, no copies)."""
        return KVCache(k=self.k[:, beam_idx], v=self.v[:, beam_idx],
                       pos=self.pos)


class QuantKVCache(NamedTuple):
    """int8 KV cache with per-(position, head) scales — half the HBM
    footprint and read bandwidth of bf16 at ~0.4% attention error (the
    int8/int4-KV-cache serving recipe from the retrieved papers, applied
    per 128-element head vector).

    k_q/v_q: (L, B, S, Hkv, d) int8;  k_s/v_s: (L, B, S, Hkv) float32.
    """

    k_q: jax.Array
    k_s: jax.Array
    v_q: jax.Array
    v_s: jax.Array
    pos: jax.Array

    @classmethod
    def create(cls, cfg: Qwen2DecoderConfig, batch: int, max_ctx: int,
               **_ignored) -> "QuantKVCache":
        shape = (cfg.num_hidden_layers, batch, max_ctx,
                 cfg.num_key_value_heads, cfg.head_dim)
        sshape = shape[:-1]
        return cls(k_q=jnp.zeros(shape, jnp.int8),
                   k_s=jnp.zeros(sshape, jnp.float32),
                   v_q=jnp.zeros(shape, jnp.int8),
                   v_s=jnp.zeros(sshape, jnp.float32),
                   pos=jnp.zeros((), jnp.int32))

    @property
    def max_ctx(self) -> int:
        return self.k_q.shape[2]

    def reorder(self, beam_idx: jax.Array) -> "QuantKVCache":
        return QuantKVCache(k_q=self.k_q[:, beam_idx], k_s=self.k_s[:, beam_idx],
                            v_q=self.v_q[:, beam_idx], v_s=self.v_s[:, beam_idx],
                            pos=self.pos)


def create_cache(cfg: Qwen2DecoderConfig, batch: int, max_ctx: int,
                 dtype=jnp.bfloat16):
    """Cache factory: dtype 'q8' (or jnp.int8) selects the quantized cache."""
    if dtype == "q8" or dtype == jnp.int8:
        return QuantKVCache.create(cfg, batch, max_ctx)
    return KVCache.create(cfg, batch, max_ctx, dtype=dtype)


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, T, H, d) -> int8 values + per-vector scale."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = amax / 127.0
    inv = jnp.where(s > 0, 1.0 / s, 0.0)
    q = jnp.round(x.astype(jnp.float32) * inv[..., None]).astype(jnp.int8)
    return q, s


def panelize_decoder_params(params: Params) -> Params:
    """Re-store the stacked ggml-block quant leaves in contiguous column
    panels ({"qs": (L,K,N)} -> {"qs_p": (L,P,K,bn)}; packed nibbles
    {"qs4": (L,K/2,N)} -> {"qs4_p": (L,P,K/2,bn)}) so each decode-step
    weight DMA is one contiguous HBM range (ops/quant_matmul.py panel
    section; ≙ the repacked tile layouts of ggml-cuda mmq.cuh). Pure
    layout transform — values untouched, bit-exactness preserved. Applies
    to {"qs"|"qs4","scales"} entries (fused or not); dense/w8a8
    leaves pass through, as do deep-K entries (K > 8192, e.g. the 7B
    "down" projection) where the strided layout already streams at
    memory speed and the panel A/B measured a regression (chain-200,
    M=8: 987 vs 781 us — a per-dispatch chain, i.e. weak evidence per
    the CLAUDE.md microbench caveat; QA_PANEL_DEEP_K=1 panelizes
    deep-K entries too for an e2e A/B). Compose AFTER
    fuse_decoder_params."""
    import os as _os

    import numpy as _np
    from qwen2_audio_tpu.ops.quant_matmul import pick_panel_width

    MAX_PANEL_K = (1 << 30) if _os.environ.get("QA_PANEL_DEEP_K") == "1" \
        else 8192

    def panel_stacked(entry: dict) -> dict:
        packed = "qs4" in entry
        qs = entry["qs4"] if packed else entry["qs"]
        sc = entry["scales"]
        L, Kr, N = qs.shape           # Kr = K//2 byte rows when packed
        bn = pick_panel_width(N)
        P = N // bn
        host = isinstance(qs, _np.ndarray)
        xp = _np if host else jnp
        out = {
            ("qs4_p" if packed else "qs_p"):
                xp.transpose(qs.reshape(L, Kr, P, bn), (0, 2, 1, 3)),
            "scales_p": xp.transpose(sc.reshape(L, sc.shape[1], P, bn),
                                     (0, 2, 1, 3)),
        }
        for extra in ("mins", "b"):
            if extra in entry:
                out[extra] = entry[extra]
        return out

    def entry_k(e: dict) -> int:
        return e["qs4"].shape[1] * 2 if "qs4" in e else e["qs"].shape[1]

    # QA_PANEL_SKIP_GU=1 leaves the fused "gate_up" entry strided so
    # ops/linear.py::fused_mlp_at (which dispatches on {"qs4"/"qs"}, not
    # the panel form) stays engaged — panels on qkv/o/lm_head PLUS the
    # one-launch SwiGLU, instead of panels displacing it (the r4 --panel
    # e2e runs silently traded the +2.6% fused-MLP win for the panel win)
    skip_gu = _os.environ.get("QA_PANEL_SKIP_GU") == "1"
    layers = dict(params["layers"])
    for key in list(layers):
        if skip_gu and key == "gate_up":
            continue
        e = layers[key]
        if isinstance(e, dict) and ("qs" in e or "qs4" in e) \
                and "scales" in e and entry_k(e) <= MAX_PANEL_K:
            layers[key] = panel_stacked(e)
    out = dict(params)
    out["layers"] = layers
    lm = out.get("lm_head")
    if isinstance(lm, dict) and ("qs" in lm or "qs4" in lm) \
            and (lm["qs4"].shape[0] * 2 if "qs4" in lm
                 else lm["qs"].shape[0]) <= MAX_PANEL_K:
        e = lm
        packed = "qs4" in e
        qs = e["qs4"] if packed else e["qs"]
        sc = e["scales"]
        Kr, N = qs.shape
        bn = pick_panel_width(N)
        P = N // bn
        host = isinstance(qs, _np.ndarray)
        xp = _np if host else jnp
        ne = {
            ("qs4_p" if packed else "qs_p"):
                xp.transpose(qs.reshape(Kr, P, bn), (1, 0, 2)),
            "scales_p": xp.transpose(sc.reshape(sc.shape[0], P, bn),
                                     (1, 0, 2)),
        }
        for extra in ("mins", "b"):
            if extra in e:
                ne[extra] = e[extra]
        out["lm_head"] = ne
    return out


def fuse_decoder_params(params: Params) -> Params:
    """Concatenate q/k/v -> "qkv" and gate/up -> "gate_up" along the output
    axis of the STACKED (L, ..., N) decoder leaves (runtime transform; the
    canonical schema everywhere else stays separate, matching the HF/ggml
    checkpoint layouts — same stance as models/encoder.py::fuse_encoder_qkv).

    Why: at decode the per-step M is 1-16, so each matmul is HBM- and
    dispatch-latency-bound; 7 projections/layer -> 4 cuts the per-layer op
    count by ~40%. Works for every weight form — dense "w", block
    "qs"/"qs4"/"scales"/"mins", per-channel "qs8"/"scale_n" — because all
    quant group structure runs along the INPUT axis; biases concat with
    zero-fill for missing ones. Host (numpy) leaves fuse on host so big
    models don't pay transient device duplication.

    NOTE: single-chip transform. The tensor-parallel PartitionSpecs in
    parallel/mesh.py address the separate q/k/v schema; fuse after
    sharding is not supported.
    """
    def cat(parts):
        if any(isinstance(p, np.ndarray) for p in parts):
            return np.concatenate([np.asarray(p) for p in parts], axis=-1)
        return jnp.concatenate(parts, axis=-1)

    def fuse(entries: list[dict], with_bias: bool) -> dict:
        forms = [set(e) - {"b"} for e in entries]
        if any(f != forms[0] for f in forms):
            # mixed weight forms (e.g. a k-quant checkpoint keeping attn_v
            # at a different type than attn_q) can't concat — caller keeps
            # the separate projections
            raise _MixedForms()
        keys = set().union(*entries) - {"b"}
        fused = {leaf: cat([e[leaf] for e in entries]) for leaf in keys}
        if with_bias and any("b" in e for e in entries):
            some = next(e["b"] for e in entries if "b" in e)
            L = some.shape[0]

            def bias_of(e, ref):
                if "b" in e:
                    return e["b"]
                n = (e.get("w") if "w" in e else
                     e.get("qs", e.get("qs8", e.get("qs4",
                           e.get("qs4b"))))).shape[-1]
                z = (np.zeros if isinstance(ref, np.ndarray)
                     else jnp.zeros)((L, n), ref.dtype)
                return z
            fused["b"] = cat([bias_of(e, some) for e in entries])
        return fused

    layers = dict(params["layers"])
    try:
        layers["qkv"] = fuse([layers.pop("q"), layers.pop("k"),
                              layers.pop("v")], with_bias=True)
        layers["gate_up"] = fuse([layers.pop("gate"), layers.pop("up")],
                                 with_bias=True)
    except _MixedForms:
        from qwen2_audio_tpu.utils.logging import log_warn
        log_warn("fuse_decoder_params: mixed weight forms across q/k/v or "
                 "gate/up — keeping separate projections\n")
        return params
    out = dict(params)
    out["layers"] = layers
    return out


class _MixedForms(Exception):
    pass


def tile_cache(cache, n: int):
    """Repeat a B=1 cache across the batch axis — beam-search tiling after
    a single shared prefill (array leaves carry batch at axis 1; the
    scalar ``pos`` is shared as-is). Works for KVCache and QuantKVCache."""
    return jax.tree.map(
        lambda a: jnp.repeat(a, n, axis=1) if a.ndim > 1 else a, cache)


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope_angles(positions: jax.Array, head_dim: int, theta: float
                ) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables: positions (T,) -> (T, head_dim), or per-stream
    positions (B, T) -> (B, T, head_dim) (the continuous-batching decode
    path where every slot sits at its own absolute position)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, T, H, d); cos/sin (T, d) shared or (B, T, d) per-stream."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    return (x * cos[:, :, None, :] + rotated * sin[:, :, None, :]
            ).astype(x.dtype)


# XLA-einsum vs flash-decode crossover (cache CAPACITY in positions): the
# einsum path reads the whole padded cache every step, the kernel skips
# invalid blocks — measured on chip the kernel loses at <= 4k (B=1 @ 4k:
# 176.2 vs 197.1 tok/s, docs/BENCH_NOTES.md) and wins past this capacity.
FLASH_DECODE_MIN_CTX = 8192


def _decode_flash(T: int, head_dim: int, cache_len: int = 0) -> bool:
    """Use the Pallas flash-decode kernel (ops/flash_decode.py) for the
    T=1 cache-attention step. Requires lane-sliceable heads (d % 128).

    Gating (read at TRACE time, like ops/linear.py's mode):
    - env QA_FLASH_DECODE=1/0 forces it on/off (tests, experiments);
    - otherwise TPU + the /tmp/qa_kernel_ok_fd_loop marker (the composed
      compile proved on this host; unvalidated composed Pallas compiles
      have wedged the remote-compile tunnel, CLAUDE.md) + cache capacity
      past the measured crossover (FLASH_DECODE_MIN_CTX) — at short
      contexts the one-pass XLA einsum read is faster than the kernel's
      block bookkeeping (ggml's fattn dispatcher makes the same
      batch/size-based call, ggml/src/ggml-cuda/fattn.cu:298).
    """
    import os
    if T != 1 or head_dim % 128 != 0:
        return False
    override = os.environ.get("QA_FLASH_DECODE")
    if override is not None:
        return override == "1"
    return (jax.default_backend() in ("tpu", "axon")
            and os.path.exists("/tmp/qa_kernel_ok_fd_loop")
            and cache_len >= FLASH_DECODE_MIN_CTX)


def _visible_mask(q_pos0: jax.Array, T: int, S: int) -> jax.Array:
    """Causal + cache-validity mask broadcastable over (B, Hkv, g, T, S):
    key j visible to query t iff j <= q_pos0 + t. q_pos0 is a scalar
    (shared position) or (B,) per-stream positions (continuous batching)."""
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    q_pos0 = jnp.asarray(q_pos0, jnp.int32)
    if q_pos0.ndim == 0:
        return (s_idx <= (q_pos0 + t_idx))[None, None, None]
    # (B, T, S) -> (B, 1, 1, T, S)
    return (s_idx[None] <= (q_pos0[:, None, None] + t_idx[None])
            )[:, None, None]


def _gqa_attention_quant(q: jax.Array,
                         k_q: jax.Array, k_s: jax.Array,
                         v_q: jax.Array, v_s: jax.Array,
                         q_pos0: jax.Array) -> jax.Array:
    """Attention reading the int8 cache DIRECTLY — the fattn-vec role
    (≙ /root/reference/ggml/src/ggml-cuda/fattn-vec-f16.cuh:442, which dots
    quantized K/V blocks and folds the block scales into the running
    softmax). No dequantized (B,S,Hkv,d) tensor is ever materialized: the
    int8→bf16 convert fuses into the QK^T / PV dots (HBM traffic stays at
    1 byte/elem of cache) and the per-vector scales are applied to the
    (T,S) logits / folded into the attention weights — O(S·H) float work
    instead of O(S·H·d).

    q: (B, T, Hq, d); k_q/v_q: (B, S, Hkv, d) int8; k_s/v_s: (B, S, Hkv).
    """
    B, T, Hq, d = q.shape
    S, Hkv = k_q.shape[1], k_q.shape[2]
    g = Hq // Hkv
    qr = q.reshape(B, T, Hkv, g, d)
    # int8 values -127..127 are exact in bf16 (8-bit mantissa): the convert
    # loses nothing and the MXU runs its native bf16 path
    logits = jnp.einsum("bthgd,bshd->bhgts", qr, k_q.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    ks = k_s.transpose(0, 2, 1)[:, :, None, None, :]      # (B,Hkv,1,1,S)
    logits = logits * ks * (d ** -0.5)

    logits = jnp.where(_visible_mask(q_pos0, T, S), logits, -jnp.inf)

    w = jax.nn.softmax(logits, axis=-1)
    vs = v_s.transpose(0, 2, 1)[:, :, None, None, :]
    w = (w * vs).astype(q.dtype)                          # fold V scale in
    out = jnp.einsum("bhgts,bshd->bthgd", w, v_q.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, T, Hq * d)


def _gqa_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   q_pos0: jax.Array, kv_len: int,
                   attn_slice: tuple | None = None):
    """q: (B, T, Hq, d); k/v: (B, S, Hkv, d) full cache buffers.

    Causal within the query block + cache-validity mask: key position j is
    visible iff j <= q_pos0 + t (query t's absolute position).

    ``attn_slice=(q0, qn, k0, kn)`` additionally returns the PRE-softmax
    attention scores for query rows [q0, q0+qn) over key columns
    [k0, k0+kn) as (B, Hq, qn, kn) — the DTW timestamp tap (the analog of
    recording cross-attention in whisper.cpp's aheads masks,
    src/qwen2-whisper.cpp:4112-4184).
    """
    B, T, Hq, d = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    g = Hq // Hkv
    q = q.reshape(B, T, Hkv, g, d)
    logits = jnp.einsum("bthgd,bshd->bhgts", q, k,
                        preferred_element_type=jnp.float32)
    logits *= d ** -0.5

    logits = jnp.where(_visible_mask(q_pos0, T, S), logits, -jnp.inf)

    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", w, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.reshape(B, T, Hq * d)
    if attn_slice is None:
        return out
    q0, qn, k0, kn = attn_slice
    tap = logits[:, :, :, q0:q0 + qn, k0:k0 + kn]      # (B,Hkv,g,qn,kn)
    tap = tap.reshape(B, Hq, qn, kn)
    return out, tap


def _layer(cfg: Qwen2DecoderConfig, x: jax.Array, lp: Params,
           proj: Params, li: jax.Array,
           cache_parts: tuple,
           cos: jax.Array, sin: jax.Array, pos0: jax.Array,
           block_only: bool, use_flash: bool = False,
           quant_cache: bool = False,
           attn_slice: tuple | None = None,
           tp_axis: str | None = None) -> tuple[jax.Array, tuple]:
    """One decoder block; returns (x_out, new_cache_parts) — plus the
    attention tap appended to new_cache_parts when ``attn_slice`` is set
    (block_only non-flash path only; the DTW alignment pass).

    ``lp``: this layer's SMALL leaves (norms), scan-sliced as usual.
    ``proj``/``li``: the projection weights stay STACKED (L, ...) outside
    the scan and ``li`` selects the layer inside the matmul (ops/linear.py
    linear_at) — scan-slicing them would materialize a per-layer copy of
    every quantized weight each step (custom-call operands can't fuse a
    dynamic-slice; measured 2.2x decode-layer time on 7B q8_0).
    ``block_only``: the cache holds nothing before pos0 (fresh prefill), so
    attention runs against the block's own K/V (T x T) instead of the full
    cache length — avoids materializing T x max_ctx logits.
    ``quant_cache``: cache_parts are int8 values + scales."""
    from qwen2_audio_tpu.ops.linear import linear_at
    B, T, D = x.shape
    h = rms_norm(x, lp["ln1"]["w"], cfg.rms_norm_eps)

    if "qkv" in proj:                 # fused projection (fuse_decoder_params)
        nq = cfg.num_attention_heads * cfg.head_dim
        nkv = cfg.num_key_value_heads * cfg.head_dim
        qkv = linear_at(h, proj["qkv"], li)
        q = qkv[..., :nq]
        k = qkv[..., nq:nq + nkv]
        v = qkv[..., nq + nkv:]
    else:
        q = linear_at(h, proj["q"], li)
        k = linear_at(h, proj["k"], li)
        v = linear_at(h, proj["v"], li)
    q = q.reshape(B, T, cfg.num_attention_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_key_value_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_key_value_heads, cfg.head_dim)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    vec_pos = jnp.ndim(pos0) == 1     # per-stream positions
    if vec_pos and T == 1:
        bidx = jnp.arange(B)

        def upd(buf, val, _start):
            return buf.at[bidx, pos0].set(val[:, 0].astype(buf.dtype))
    elif vec_pos:
        # batched-speculative verify: slot b writes rows pos0[b]..pos0[b]+T-1.
        # Out-of-range rows (a capacity-frozen slot near S) are DROPPED by
        # XLA scatter semantics, never clamped onto live rows.
        bidx = jnp.arange(B)
        rows = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]

        def upd(buf, val, _start):
            return buf.at[bidx[:, None], rows].set(val.astype(buf.dtype))
    else:
        upd = functools.partial(jax.lax.dynamic_update_slice)
    if quant_cache:
        kq_c, ks_c, vq_c, vs_c = cache_parts
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        kq_c = upd(kq_c, kq, (0, pos0, 0, 0))
        ks_c = upd(ks_c, ks, (0, pos0, 0))
        vq_c = upd(vq_c, vq, (0, pos0, 0, 0))
        vs_c = upd(vs_c, vs, (0, pos0, 0))
        new_parts = (kq_c, ks_c, vq_c, vs_c)
    else:
        k_cache, v_cache = cache_parts
        k_cache = upd(k_cache, k.astype(k_cache.dtype), (0, pos0, 0, 0))
        v_cache = upd(v_cache, v.astype(v_cache.dtype), (0, pos0, 0, 0))
        new_parts = (k_cache, v_cache)

    tap = None
    if block_only and use_flash:
        assert attn_slice is None, "attention tap requires the non-flash path"
        # causal GQA flash attention over the block (prefill fast path)
        from qwen2_audio_tpu.ops.flash_attention import flash_attention
        attn = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=cfg.head_dim ** -0.5,
            causal=True).transpose(0, 2, 1, 3).reshape(B, T, -1)
    elif block_only:
        attn = _gqa_attention(q, k.astype(x.dtype), v.astype(x.dtype), 0, T,
                              attn_slice=attn_slice)
        if attn_slice is not None:
            attn, tap = attn
    else:
        assert attn_slice is None, "attention tap requires block_only"
        if _decode_flash(T, cfg.head_dim,
                         (kq_c if quant_cache else k_cache).shape[1]):
            # Pallas flash-decode: reads only the valid cache prefix
            # (scalar-prefetch clamped blocks) and consumes the int8
            # cache directly — the fattn-vec analog (ops/flash_decode.py)
            from qwen2_audio_tpu.ops.flash_decode import (
                flash_decode, flash_decode_quant)
            pos_vec = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32), (B,))
            scale = cfg.head_dim ** -0.5
            if quant_cache:
                attn = flash_decode_quant(q[:, 0], kq_c, ks_c, vq_c, vs_c,
                                          pos_vec, sm_scale=scale)
            else:
                attn = flash_decode(q[:, 0], k_cache, v_cache, pos_vec,
                                    sm_scale=scale)
            attn = attn.reshape(B, 1, -1).astype(x.dtype)
        elif quant_cache:
            attn = _gqa_attention_quant(q, kq_c, ks_c, vq_c, vs_c, pos0)
        else:
            attn = _gqa_attention(q, k_cache, v_cache, pos0,
                                  k_cache.shape[1])
    o = linear_at(attn, proj["o"], li)
    if tp_axis is not None:
        # Megatron row-parallel out-projection: each shard holds
        # (Hq_local*d, D) rows, partial sums reduce over the tp axis
        # (≙ the role of ggml-cuda's split-buffer peer reduction,
        # ggml/src/ggml-cuda.cu:1358 — here one XLA psum over ICI)
        o = jax.lax.psum(o, tp_axis)
    x = x + o

    h = rms_norm(x, lp["ln2"]["w"], cfg.rms_norm_eps)
    y = None
    if "gate_up" in proj:             # fused MLP in-projection
        from qwen2_audio_tpu.ops.linear import fused_mlp_at
        # one-launch SwiGLU kernel (gate/up/down, intermediate stays in
        # VMEM) when the storage form and decode M allow it
        y = fused_mlp_at(h, proj["gate_up"], proj["down"], li)
        if y is None:
            gu = linear_at(h, proj["gate_up"], li)
            I = cfg.intermediate_size
            gated = jax.nn.silu(gu[..., :I]) * gu[..., I:]
    else:
        from qwen2_audio_tpu.ops.linear import fused_mlp_split_at
        # split-schema one-launch SwiGLU (canonical layers / TP shards)
        y = fused_mlp_split_at(h, proj["gate"], proj["up"], proj["down"],
                               li)
        if y is None:
            gated = jax.nn.silu(linear_at(h, proj["gate"], li)) \
                * linear_at(h, proj["up"], li)
    if y is None:
        y = linear_at(gated, proj["down"], li)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)   # row-parallel down projection
    out = x + y
    if attn_slice is not None:
        return out, (*new_parts, tap)
    return out, new_parts


@functools.partial(jax.jit,
                   static_argnames=("cfg", "block_only", "logits_last_only",
                                    "use_flash", "attn_slice", "tp_axis"),
                   donate_argnames=("cache",))
def decoder_forward(
    params: Params,
    cfg: Qwen2DecoderConfig,
    inputs_embeds: jax.Array,        # (B, T, D)
    cache: KVCache,
    pos0: jax.Array | int,           # absolute position of inputs_embeds[:,0]
    block_only: bool = False,        # fresh prefill: attend within the block
    logits_last_only: bool = False,  # skip the T-1 unused lm_head rows
    use_flash: bool = False,         # Pallas causal GQA kernel for prefill
    attn_slice: tuple | None = None,  # (q0, qn, k0, kn) attention tap
    tp_axis: str | None = None,      # Megatron TP inside shard_map: psum
                                     # after row-parallel o/down; ``cfg``
                                     # must then carry PER-SHARD head and
                                     # intermediate sizes (parallel/tp.py)
) -> tuple[jax.Array, KVCache]:
    """Run T positions through all layers; returns (logits (B,T,V), cache).

    Same function serves prefill (T = prompt length) and decode (T = 1);
    the cache is donated so updates alias in HBM. Pass ``block_only=True``
    when nothing precedes pos0 in the cache (first prefill) to keep the
    attention T x T instead of T x max_ctx.

    ``attn_slice`` (block_only, non-flash only) returns a third output:
    per-layer pre-softmax attention scores (L, B, Hq, qn, kn) for the DTW
    token-timestamp alignment (≙ whisper.cpp aheads recording,
    src/qwen2-whisper.cpp:4112-4184).
    """
    x = inputs_embeds
    T = x.shape[1]
    pos0 = jnp.asarray(pos0, jnp.int32)
    if pos0.ndim == 1:                 # per-stream slot positions
        # (B, T): T == 1 is the plain continuous-batching decode step;
        # T > 1 is the batched-speculative verify forward (each slot
        # verifies its own draft block at its own absolute position)
        positions = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)
    else:
        positions = pos0 + jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)

    quant_cache = isinstance(cache, QuantKVCache)
    parts_in = ((cache.k_q, cache.k_s, cache.v_q, cache.v_s) if quant_cache
                else (cache.k, cache.v))
    n_parts = len(parts_in)

    # Split the layer pytree: projection weights stay STACKED outside the
    # scan (the scan body closes over them and linear_at selects the layer
    # inside the kernel — scan-slicing a quantized leaf materializes a full
    # per-layer HBM copy, measured 2.2x decode-layer time on 7B q8_0);
    # small leaves (norms) scan-slice as usual.
    PROJ = ("q", "k", "v", "qkv", "o", "gate", "up", "gate_up", "down")
    layers = params["layers"]
    proj = {k: layers[k] for k in PROJ if k in layers}
    small = {k: v for k, v in layers.items() if k not in PROJ}
    L = cfg.num_hidden_layers

    def body(x, layer_in):
        li, lp = layer_in[0], layer_in[1]
        x, new_parts = _layer(cfg, x, lp, proj, li, layer_in[2:], cos, sin,
                              pos0, block_only, use_flash, quant_cache,
                              attn_slice=attn_slice, tp_axis=tp_axis)
        return x, new_parts

    x, outs = jax.lax.scan(
        body, x, (jnp.arange(L, dtype=jnp.int32), small, *parts_in))
    new_parts, taps = outs[:n_parts], outs[n_parts:]

    if logits_last_only:
        # prefill only needs the next-token distribution: the lm_head matmul
        # over T-1 positions (T x V, the biggest matmul here) is dead work
        x = x[:, -1:]
    x = rms_norm(x, params["ln_f"]["w"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = x @ params["embed"].T.astype(x.dtype)
    else:
        from qwen2_audio_tpu.ops.linear import linear
        logits = linear(x, params["lm_head"])

    # cache.pos is a scalar high-water mark; per-stream positions are
    # tracked by the continuous-batching caller itself
    end = (jnp.max(pos0) if pos0.ndim else pos0) + T
    if quant_cache:
        new_cache = QuantKVCache(*new_parts, pos=end)
    else:
        new_cache = KVCache(k=new_parts[0], v=new_parts[1], pos=end)
    if attn_slice is not None:
        return logits.astype(jnp.float32), new_cache, taps[0]
    return logits.astype(jnp.float32), new_cache


def embed_tokens(params: Params, tokens: jax.Array) -> jax.Array:
    return params["embed"][tokens]


# --------------------------------------------------------------------------- #
# parameter construction
# --------------------------------------------------------------------------- #

def random_decoder_params(rng: np.random.Generator, cfg: Qwen2DecoderConfig,
                          dtype=jnp.float32, scale: float = 0.02,
                          host: bool = False) -> Params:
    """``host=True`` keeps leaves as numpy — callers that quantize before
    upload must not place the dense model on device first (a dense 7B bf16
    pytree alone exceeds one v5e's HBM)."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def t(*shape):
        # generate in f32: f64 doubles host RAM and generation time, which
        # dominates big-model bench setup
        a = rng.standard_normal(shape, dtype=np.float32)
        a *= np.float32(scale)
        if host:
            return a.astype("bfloat16") if dtype == jnp.bfloat16 else a
        return jnp.asarray(a, dtype=dtype)

    ones = (lambda *sh: np.ones(sh, np.float32)) if host \
        else (lambda *sh: jnp.ones(sh, dtype))
    L = cfg.num_hidden_layers
    layers = {
        "ln1": {"w": ones(L, D)},
        "q": {"w": t(L, D, Hq * dh), "b": t(L, Hq * dh)},
        "k": {"w": t(L, D, Hkv * dh), "b": t(L, Hkv * dh)},
        "v": {"w": t(L, D, Hkv * dh), "b": t(L, Hkv * dh)},
        "o": {"w": t(L, Hq * dh, D)},
        "ln2": {"w": ones(L, D)},
        "gate": {"w": t(L, D, I)},
        "up": {"w": t(L, D, I)},
        "down": {"w": t(L, I, D)},
    }
    p = {"embed": t(cfg.vocab_size, D), "layers": layers,
         "ln_f": {"w": ones(D)}}
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"w": t(D, cfg.vocab_size)}
    return p


def decoder_params_from_hf_state_dict(sd: dict, cfg: Qwen2DecoderConfig,
                                      dtype=jnp.float32,
                                      prefix: str = "model.",
                                      lm_head_key: str = "lm_head.weight"
                                      ) -> Params:
    """Map HF Qwen2ForCausalLM (or the language_model inside Qwen2-Audio)
    state-dict names onto the stacked pytree; linears transposed to [in,out]."""

    def g(name):
        return np.asarray(sd[name], dtype=np.float32)

    L = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        arrs = [g(fmt.format(i=i)) for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype=dtype)

    layers = {
        "ln1": {"w": stack(prefix + "layers.{i}.input_layernorm.weight")},
        "q": {"w": stack(prefix + "layers.{i}.self_attn.q_proj.weight", True),
              "b": stack(prefix + "layers.{i}.self_attn.q_proj.bias")},
        "k": {"w": stack(prefix + "layers.{i}.self_attn.k_proj.weight", True),
              "b": stack(prefix + "layers.{i}.self_attn.k_proj.bias")},
        "v": {"w": stack(prefix + "layers.{i}.self_attn.v_proj.weight", True),
              "b": stack(prefix + "layers.{i}.self_attn.v_proj.bias")},
        "o": {"w": stack(prefix + "layers.{i}.self_attn.o_proj.weight", True)},
        "ln2": {"w": stack(prefix + "layers.{i}.post_attention_layernorm.weight")},
        "gate": {"w": stack(prefix + "layers.{i}.mlp.gate_proj.weight", True)},
        "up": {"w": stack(prefix + "layers.{i}.mlp.up_proj.weight", True)},
        "down": {"w": stack(prefix + "layers.{i}.mlp.down_proj.weight", True)},
    }
    p = {
        "embed": jnp.asarray(g(prefix + "embed_tokens.weight"), dtype=dtype),
        "layers": layers,
        "ln_f": {"w": jnp.asarray(g(prefix + "norm.weight"), dtype=dtype)},
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"w": jnp.asarray(g(lm_head_key).T, dtype=dtype)}
    return p
