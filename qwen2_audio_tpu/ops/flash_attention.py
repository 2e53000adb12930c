"""Blockwise flash attention as a Pallas TPU kernel.

Replaces the reference's attention path: the ggml fork computes full
KQ = K@Q^T, materializes the (1500,1500) score matrix per head, softmaxes it,
then V@KQ^T (src/qwen2-whisper.cpp:2095-2116; its flash-attn branch is stubbed
out :2057-2078, and ggml's CUDA fattn kernels ggml/src/ggml-cuda/fattn*.cu are
the GPU analog).  Here the scores tile never leaves VMEM: online softmax over
KV tiles with running (m, l, acc) statistics in f32 scratch.

This module carries exactly the SHIPPING kernel paths: the one-shot
single-KV-block kernel (the encoder winner — whole 1500-seq KV rides one
tile) and the blockwise online-softmax kernel (the general fallback).
Experimental variants that lost or tied their e2e A/Bs (lite / nopad /
exp2 gating) are quarantined in ops/fa_variants.py with their measured
negative results; `flash_attention(lite=True)` delegates there for
parity tests.

Layout notes (TPU tiling):
- head_dim is zero-padded to a multiple of 128 lanes (zeros change nothing:
  QK^T gains 0-terms, V gains zero output columns that are sliced off);
- sequence is zero-padded to the q/k block size; padded KEY positions are
  masked with a large negative constant, padded QUERY rows are discarded
  by the caller's slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128
# exp2-domain softmax: softmax_e(z) == softmax_2(z * log2(e)) exactly, so a
# caller that folds LOG2E into its existing Q pre-scale (a free trace-time
# constant) lets the kernel exponentiate with exp2 directly — TPU lowers
# jnp.exp as exp2(x * log2e), i.e. one extra VPU multiply pass over every
# (block_q, block_k) f32 score tile that exp2 skips.  Measured NEUTRAL e2e
# (fa_variants header), so the gate lives in fa_variants.exp2_ok.
_LOG2E = 1.4426950408889634


def _use_interpret() -> bool:
    """Mosaic only lowers on TPU backends; elsewhere (the CPU test mesh)
    run the kernel through the Pallas interpreter."""
    return jax.default_backend() not in ("tpu", "axon")


def _attn_kernel(q_ref, k_ref, v_ref, o_ref,
                 m_ref, l_ref, acc_ref,
                 *, sm_scale: float, causal: bool, kv_valid: int,
                 block_q: int, block_k: int, exp2: bool = False):
    _exp = jnp.exp2 if exp2 else jnp.exp
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # with causal masking, tiles entirely above the diagonal contribute nothing
    run = True
    if causal:
        run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(run)
    def _run():
        q = q_ref[0, 0]                     # (block_q, d)
        k = k_ref[0, 0]                     # (block_k, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (block_q, block_k)
        if sm_scale != 1.0:                 # trace-time constant
            s *= sm_scale

        # mask padded keys (and the upper triangle when causal)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        mask = col < kv_valid
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            mask &= col <= row
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[...]                 # (block_q, 128) broadcast lanes
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)       # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = _exp(m_prev - m_next)
        p = _exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_ref[...] = m_next
        l_ref[...] = l_next

        acc_ref[...] *= alpha[:, :1]
        v = v_ref[0, 0]                     # (block_k, d)
        acc_ref[...] += jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _store():
        l = l_ref[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def _attn_kernel_single(q_ref, k_ref, v_ref, o_ref,
                        *, sm_scale: float, kv_valid: int, block_k: int,
                        exp2: bool = False, pexp16: bool = False):
    """One-shot softmax-attention tile: the whole KV fits in a single
    k block (the encoder regime — T=1500 rides one 1536 tile), so the
    online-softmax machinery of _attn_kernel (m/l scratch, alpha
    rescales, accumulator carry, per-ki branches) is pure overhead.
    This variant computes max/exp/sum/AV in one pass with no scratch."""
    q = q_ref[0, 0]                         # (block_q, d)
    k = k_ref[0, 0]                         # (block_k, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (block_q, block_k)
    if sm_scale != 1.0:                     # trace-time constant
        s *= sm_scale
    if kv_valid < block_k:                  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_valid, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    if pexp16:
        # bf16-domain exponent (VERDICT r4 #8 lever at the ~140 us/layer
        # VPU exp tail): the shifted scores round to bf16 BEFORE the
        # transcendental, so exp runs on half-width vectors and p lands
        # already in the AV dot's dtype (dropping the separate astype
        # sweep). Normalization sums the bf16 weights in f32, so the
        # softmax renormalizes exactly what the dot consumes. Numeric
        # cost: <= 2^-8 relative on each weight pre-normalization.
        p = (jnp.exp2 if exp2 else jnp.exp)((s - m).astype(jnp.bfloat16))
        l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    else:
        p = (jnp.exp2 if exp2 else jnp.exp)(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0]                         # (block_k, d)
    acc = jax.lax.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "causal", "kv_valid", "block_q", "block_k",
                     "single", "lite", "exp2", "pexp16"))
def flash_attention(
    q: jax.Array,       # (B, Hq, Tq, d)
    k: jax.Array,       # (B, Hkv, Tk, d) — Hkv may divide Hq (GQA)
    v: jax.Array,       # (B, Hkv, Tk, d)
    *,
    sm_scale: float,
    causal: bool = False,
    kv_valid: int | None = None,
    block_q: int = 256,
    block_k: int = 512,
    single: bool = False,
    lite: bool = False,
    exp2: bool = False,
    pexp16: bool = False,
) -> jax.Array:
    """O = softmax(sm_scale * Q K^T) V, tiled; returns (B, Hq, Tq, d).

    ``exp2=True`` treats the scaled scores as log2-domain logits (softmax
    base 2): the caller folds LOG2E into ``sm_scale`` (or its Q pre-scale)
    and the kernels exponentiate with exp2, skipping the ln->log2 multiply
    TPU's exp lowering performs on every f32 score element.

    ``lite=True`` (with single) delegates to the quarantined
    MXU-bookkeeping variant in ops/fa_variants.py (measured e2e loser;
    kept parity-tested there).

    Tq/Tk may be arbitrary; they are padded internally. ``kv_valid`` is the
    number of real key positions (defaults to Tk). GQA is handled in the
    BlockSpec index map — query head h reads KV head h // (Hq // Hkv), so
    grouped KV heads are never materialized per query head.
    """
    B, H, Tq, d = q.shape
    Tk = k.shape[2]
    n_kv = k.shape[1]
    assert H % n_kv == 0, (H, n_kv)
    kv_group = H // n_kv
    kv_valid = Tk if kv_valid is None else kv_valid

    block_q = min(block_q, max(_LANES, 1 << (Tq - 1).bit_length()))
    block_k = min(block_k, max(_LANES, 1 << (Tk - 1).bit_length()))

    d_pad = -d % _LANES
    tq_pad = -Tq % block_q
    tk_pad = -Tk % block_k
    if d_pad or tq_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_pad), (0, d_pad)))
    if d_pad or tk_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_pad), (0, d_pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_pad), (0, d_pad)))
    Dq, TQ, TK = d + d_pad, Tq + tq_pad, Tk + tk_pad

    if single and lite and not causal and TK == block_k and d_pad >= 1:
        from qwen2_audio_tpu.ops.fa_variants import lite_call
        return lite_call(q, k, v, d=d, Tq=Tq, sm_scale=sm_scale,
                         kv_valid=kv_valid, block_q=block_q,
                         block_k=block_k, kv_group=kv_group, exp2=exp2)

    if single and not causal and TK == block_k:
        # whole KV in one tile: one-shot softmax, no scratch, 3-dim grid
        out = pl.pallas_call(
            functools.partial(_attn_kernel_single, sm_scale=sm_scale,
                              kv_valid=kv_valid, block_k=block_k, exp2=exp2,
                              pexp16=pexp16),
            out_shape=jax.ShapeDtypeStruct((B, H, TQ, Dq), q.dtype),
            grid_spec=pl.GridSpec(
                grid=(B, H, TQ // block_q),
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, Dq),
                                 lambda b, h, i: (b, h, i, 0)),
                    pl.BlockSpec((1, 1, block_k, Dq),
                                 lambda b, h, i: (b, h // kv_group, 0, 0)),
                    pl.BlockSpec((1, 1, block_k, Dq),
                                 lambda b, h, i: (b, h // kv_group, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, block_q, Dq),
                                       lambda b, h, i: (b, h, i, 0)),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=_use_interpret(),
        )(q, k, v)
        return out[:, :, :Tq, :d]

    grid = (B, H, TQ // block_q, TK // block_k)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, sm_scale=sm_scale, causal=causal,
            kv_valid=kv_valid, block_q=block_q, block_k=block_k, exp2=exp2),
        out_shape=jax.ShapeDtypeStruct((B, H, TQ, Dq), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dq),
                             lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, Dq),
                             lambda b, h, i, j: (b, h // kv_group, j, 0)),
                pl.BlockSpec((1, 1, block_k, Dq),
                             lambda b, h, i, j: (b, h // kv_group, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, Dq),
                                   lambda b, h, i, j: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
                pltpu.VMEM((block_q, _LANES), jnp.float32),  # running sum
                pltpu.VMEM((block_q, Dq), jnp.float32),      # output accum
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_use_interpret(),
    )(q, k, v)

    return out[:, :, :Tq, :d]


def flash_attention_encoder(q: jax.Array, k: jax.Array, v: jax.Array,
                            n_head: int) -> jax.Array:
    """Encoder-layer entry point over merged-head activations (B, T, D).

    Applies the reference's d_head^-0.5 scaling (src/qwen2-whisper.cpp:2030,
    applied there as a Q pre-scale — mathematically identical on the logits).
    """
    from qwen2_audio_tpu.ops import fa_variants
    B, T, D = q.shape
    dh = D // n_head
    # pre-scale Q at the XLA level (≙ the reference's own Q pre-scale,
    # src/qwen2-whisper.cpp:2030): the multiply fuses into the existing
    # elementwise chain for free, and the kernels then skip their f32
    # score-scaling pass over the (block_q, block_k) tile (sm_scale=1.0
    # is a trace-time constant the kernel bodies branch on).
    use_exp2 = fa_variants.exp2_ok()
    scale = float(dh) ** -0.5 * (_LOG2E if use_exp2 else 1.0)
    q = q * jnp.asarray(scale, q.dtype)

    def split(x):
        return x.reshape(B, T, n_head, dh).transpose(0, 2, 1, 3)

    # narrow heads (d_head 64) half-fill the MXU, so throughput is set by
    # softmax/rescale VPU overhead per block: a short q block with the
    # whole KV in one k block (one online-softmax pass, no rescale chain)
    # measured 1.9x faster than the 256/512 default at seq 1500 on v5e
    import os
    block_q = int(os.environ.get("QA_FA_BQ", "128"))
    if fa_variants.nopad_ok():
        out = fa_variants.flash_attention_nopad(
            split(q), split(k), split(v), sm_scale=1.0,
            block_q=block_q, exp2=use_exp2)
        return out.transpose(0, 2, 1, 3).reshape(B, T, D)
    block_k = max(_LANES, T + (-T % _LANES))
    out = flash_attention(split(q), split(k), split(v),
                          sm_scale=1.0,
                          block_q=block_q,
                          block_k=block_k,
                          single=_single_pass_ok(),
                          lite=fa_variants.lite_ok(),
                          exp2=use_exp2,
                          pexp16=fa_variants.pexp16_ok())
    return out.transpose(0, 2, 1, 3).reshape(B, T, D)


def _single_pass_ok() -> bool:
    """The one-shot kernel variant arms on TPU only after the validator
    proved it on this host (marker fa_single — unvalidated kernel compiles
    have wedged the remote-compile tunnel, CLAUDE.md); interpret mode (the
    CPU test mesh) always exercises it so parity stays covered. Env
    QA_FA_SINGLE=0/1 overrides for A/B runs."""
    import os
    ov = os.environ.get("QA_FA_SINGLE")
    if ov is not None:
        return ov not in ("0", "false", "off")
    if _use_interpret():
        return True
    return os.path.exists("/tmp/qa_kernel_ok_fa_single")
