"""Decode-step flash attention over the KV cache (flash-decoding style).

This is the TPU analog of ggml's fattn-vec kernels
(/root/reference/ggml/src/ggml-cuda/fattn-vec-f16.cuh:442 — one query row
per stream dotted against quantized K/V blocks, block scales folded into
the running softmax). The XLA einsum path (models/qwen2_decoder.py
``_gqa_attention``/``_gqa_attention_quant``) reads the ENTIRE max_ctx
cache buffer every step regardless of how much of it is valid; this
kernel walks the cache in ``block_k`` tiles and — via scalar-prefetch
CLAMPED index maps — never fetches blocks past the valid prefix, so a
stream at position p reads ceil((p+1)/block_k) tiles instead of
S/block_k. With per-stream positions (continuous batching) each batch
row stops at its own length.

Layouts (chosen so the big cache buffers are consumed IN PLACE):
- K/V arrive as the cache's own (B, S, Hkv, d) buffers, reshaped for
  free to (B, S, Hkv*d); per-head lanes are sliced inside the kernel at
  128-aligned offsets (requires d % 128 == 0 — the 1.5B/7B head size).
- int8 cache: same layout in int8 + per-vector scales transposed to
  (B, Hkv, S) (a tiny S*Hkv copy; the multi-MB K/V tensors move nowhere).
- GQA: the g = Hq/Hkv query heads of each KV head are one (g, d) tile —
  padded to 8 sublanes — so the whole online-softmax state for a stream
  is (Hkv*gp, 128) and every QK^T is one (gp, d) x (d, block_k) MXU dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _decode_kernel(pos_ref, *refs, sm_scale: float, block_k: int,
                   n_kv: int, gp: int, d: int, quant: bool):
    if quant:
        q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    pos_b = pos_ref[b]                       # last VALID key index, inclusive

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # blocks entirely past the valid prefix: index maps pinned them to the
    # last valid block (no new fetch) and compute is skipped
    @pl.when(ki * block_k <= pos_b)
    def _run():
        k = k_ref[0]                         # (block_k, n_kv*d)
        v = v_ref[0]
        col = (jax.lax.broadcasted_iota(jnp.int32, (gp, block_k), 1)
               + ki * block_k)
        mask = col <= pos_b
        # V rows past the valid prefix can hold ANY bits (stale cache
        # entries, or out-of-bounds tile padding in the final partial
        # block). Their attention weight is exactly 0, but 0 * NaN = NaN
        # in the PV dot — zero the rows themselves. K needs no such
        # guard: its garbage enters the logits, which are masked AFTER
        # the QK^T dot.
        row_valid = (jax.lax.broadcasted_iota(jnp.int32,
                                              (block_k, n_kv * d), 0)
                     + ki * block_k) <= pos_b
        v = jnp.where(row_valid, v, 0).astype(v.dtype)
        for h in range(n_kv):
            qh = q_ref[0, h * gp:(h + 1) * gp, :]          # (gp, d)
            kh = k[:, h * d:(h + 1) * d]                   # (block_k, d)
            s = jax.lax.dot_general(
                qh, kh.astype(qh.dtype),                   # in-VMEM convert
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (gp, block_k)
            s *= sm_scale
            if quant:
                s *= ks_ref[0, h:h + 1, :]                 # (1, block_k)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            rows = slice(h * gp, (h + 1) * gp)
            m_prev = m_ref[rows, :]
            l_prev = l_ref[rows, :]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_ref[rows, :] = alpha * l_prev + jnp.sum(p, axis=1,
                                                      keepdims=True)
            m_ref[rows, :] = m_next

            vh = v[:, h * d:(h + 1) * d].astype(qh.dtype)
            if quant:
                # same 0 * NaN guard for the V scales as for V itself
                vs_row = jnp.where(mask[:1], vs_ref[0, h:h + 1, :], 0.0)
                p = p * vs_row                             # fold V scale
            acc_ref[rows, :] = acc_ref[rows, :] * alpha[:, :1] + jax.lax.dot(
                p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _store():
        l = l_ref[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def _prep_q(q: jax.Array, n_kv: int) -> tuple[jax.Array, int, int]:
    """(B, Hq, d) -> (B, Hkv*gp, d) with each KV group's g query heads
    padded to gp = ceil8(g) sublane rows."""
    B, Hq, d = q.shape
    g = Hq // n_kv
    gp = -(-g // 8) * 8
    qg = q.reshape(B, n_kv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    return qg.reshape(B, n_kv * gp, d), g, gp


def _postprocess(out: jax.Array, B: int, n_kv: int, g: int, gp: int,
                 d: int) -> jax.Array:
    out = out.reshape(B, n_kv, gp, d)[:, :, :g]
    return out.reshape(B, n_kv * g, d)


def _pick_block_k(S: int, block_k: int) -> int:
    return min(block_k, -(-S // _LANES) * _LANES)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_k"))
def flash_decode(
    q: jax.Array,        # (B, Hq, d) — ONE query per stream
    k: jax.Array,        # (B, S, Hkv, d) — the cache buffer, in place
    v: jax.Array,        # (B, S, Hkv, d)
    pos: jax.Array,      # (B,) int32 — query's absolute position; keys
                         # 0..pos[b] inclusive are visible to stream b
    *,
    sm_scale: float,
    block_k: int = 512,
) -> jax.Array:
    """Returns (B, Hq, d). Requires d % 128 == 0 (lane-sliced heads)."""
    B, Hq, d = q.shape
    S, n_kv = k.shape[1], k.shape[2]
    assert Hq % n_kv == 0 and d % _LANES == 0, (Hq, n_kv, d)
    block_k = _pick_block_k(S, block_k)
    nk = -(-S // block_k)

    qp, g, gp = _prep_q(q, n_kv)
    HP = n_kv * gp
    kf = k.reshape(B, S, n_kv * d)
    vf = v.reshape(B, S, n_kv * d)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))

    def kv_map(b, ki, pos_ref):
        return (b, jnp.minimum(ki, pos_ref[b] // block_k), 0)

    out = pl.pallas_call(
        functools.partial(_decode_kernel, sm_scale=sm_scale,
                          block_k=block_k, n_kv=n_kv, gp=gp, d=d,
                          quant=False),
        out_shape=jax.ShapeDtypeStruct((B, HP, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nk),
            in_specs=[
                pl.BlockSpec((1, HP, d), lambda b, ki, pos_ref: (b, 0, 0)),
                pl.BlockSpec((1, block_k, n_kv * d), kv_map),
                pl.BlockSpec((1, block_k, n_kv * d), kv_map),
            ],
            out_specs=pl.BlockSpec((1, HP, d),
                                   lambda b, ki, pos_ref: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((HP, _LANES), jnp.float32),   # running max
                pltpu.VMEM((HP, _LANES), jnp.float32),   # running sum
                pltpu.VMEM((HP, d), jnp.float32),        # output accum
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(pos, qp, kf, vf)

    return _postprocess(out, B, n_kv, g, gp, d)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_k"))
def flash_decode_quant(
    q: jax.Array,        # (B, Hq, d)
    k_q: jax.Array,      # (B, S, Hkv, d) int8 — the quant cache, in place
    k_s: jax.Array,      # (B, S, Hkv) f32 per-vector scales
    v_q: jax.Array,
    v_s: jax.Array,
    pos: jax.Array,      # (B,) int32
    *,
    sm_scale: float,
    block_k: int = 512,
) -> jax.Array:
    """int8-cache variant: K/V blocks stay int8 through the DMA (half the
    HBM read of bf16) and convert in VMEM; the per-vector scales multiply
    the (gp, block_k) logits / attention weights — O(S) float work per
    head instead of O(S*d)."""
    B, Hq, d = q.shape
    S, n_kv = k_q.shape[1], k_q.shape[2]
    assert Hq % n_kv == 0 and d % _LANES == 0, (Hq, n_kv, d)
    block_k = _pick_block_k(S, block_k)
    nk = -(-S // block_k)

    qp, g, gp = _prep_q(q, n_kv)
    HP = n_kv * gp
    kf = k_q.reshape(B, S, n_kv * d)
    vf = v_q.reshape(B, S, n_kv * d)
    # (B, S, Hkv) -> (B, Hkv, S): tiny copy so each head's scales are one
    # lane row per block
    ks = k_s.transpose(0, 2, 1).astype(jnp.float32)
    vs = v_s.transpose(0, 2, 1).astype(jnp.float32)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))

    def kv_map(b, ki, pos_ref):
        return (b, jnp.minimum(ki, pos_ref[b] // block_k), 0)

    def sc_map(b, ki, pos_ref):
        return (b, 0, jnp.minimum(ki, pos_ref[b] // block_k))

    out = pl.pallas_call(
        functools.partial(_decode_kernel, sm_scale=sm_scale,
                          block_k=block_k, n_kv=n_kv, gp=gp, d=d,
                          quant=True),
        out_shape=jax.ShapeDtypeStruct((B, HP, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nk),
            in_specs=[
                pl.BlockSpec((1, HP, d), lambda b, ki, pos_ref: (b, 0, 0)),
                pl.BlockSpec((1, block_k, n_kv * d), kv_map),
                pl.BlockSpec((1, n_kv, block_k), sc_map),
                pl.BlockSpec((1, block_k, n_kv * d), kv_map),
                pl.BlockSpec((1, n_kv, block_k), sc_map),
            ],
            out_specs=pl.BlockSpec((1, HP, d),
                                   lambda b, ki, pos_ref: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((HP, _LANES), jnp.float32),
                pltpu.VMEM((HP, _LANES), jnp.float32),
                pltpu.VMEM((HP, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(pos, qp, kf, ks, vf, vs)

    return _postprocess(out, B, n_kv, g, gp, d)
