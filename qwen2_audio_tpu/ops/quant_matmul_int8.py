"""Exact-integer group matmul for ggml block weights — the parity fast path.

ggml's CUDA mmq quantizes activations to q8_1 per 32-group and runs integer
dot products with per-group scales (ggml-cuda/mmq.cuh:2936, mmvq.cu:425;
quantize_row_q8_1). This kernel is the TPU equivalent:

    out[m,n] = Σ_g  sx[m,g] · sw[g,n] · ( Σ_{k∈g} xq[m,k] · wq[k,n] )

The inner products are int8×int8→int32 on the MXU (exact), one unrolled
(bm,32)@(32,bn) dot per group inside a 256-deep K block; the float work per
block is 8 scale-broadcast multiply-accumulates. No `precision=HIGHEST`
passes, no in-VMEM dequant of the weights. Weight values are treated
exactly for every format that fits int8 (q8_0, and q4_0's -8..7 range);
only the activations see ggml-equivalent q8_1 rounding.

Hardware gating: ops/linear.py routes here only after
tools/validate_tpu_kernels.py proved the kernel AND its composition into
the scanned decoder on the chip — markers /tmp/qa_kernel_ok_qmm_int8 and
/tmp/qa_kernel_ok_qmm_int8_decoder (unvalidated Pallas compositions have
wedged the remote-compile tunnel, see CLAUDE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen2_audio_tpu.ops.quant_matmul import scales_f32

GROUP = 32


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def quantize_activations(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(row, 32-group) int8 activation quantization
    (≙ ggml quantize_row_q8_1). x (M, K) -> (xq int8 (M,K), sx (M, K//32))."""
    M, K = x.shape
    g = x.reshape(M, K // GROUP, GROUP).astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=-1)
    sx = amax / 127.0
    inv = jnp.where(sx > 0, 1.0 / sx, 0.0)
    xq = jnp.round(g * inv[..., None]).astype(jnp.int8).reshape(M, K)
    return xq, sx


def _kernel(xq_ref, sx_ref, qs_ref, sw_ref, o_ref, acc_ref, *, out_dtype,
            block_k: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    n_groups = block_k // GROUP
    for g in range(n_groups):              # static unroll
        xg = xq_ref[:, g * GROUP:(g + 1) * GROUP]        # (bm, 32) int8
        wg = qs_ref[g * GROUP:(g + 1) * GROUP, :]        # (32, bn) int8
        p = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # exact
        # sx block is TRANSPOSED (groups, m): its lane dim is m, which is
        # always 128-divisible or the full padded M (Mosaic tiling rule);
        # a (m, groups) layout would put the tiny group count on lanes
        # sw may be stored f16 or u16 bit patterns (qparams scale16/u16)
        scale = (sx_ref[g, :][:, None].astype(jnp.float32)
                 * scales_f32(sw_ref[g, :][None, :]))
        acc_ref[...] += p.astype(jnp.float32) * scale

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def quant_matmul_int8(
    x: jax.Array,           # (M, K) float
    qs: jax.Array,          # (K, N) int8 (ggml q8_0 values, bit-exact)
    scales: jax.Array,      # (K // 32, N) f32 (ggml group scales)
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 256,
) -> jax.Array:
    """x @ dequant(qs, scales) with integer inner products — exact in the
    weights, ggml-q8_1-equivalent quantization in the activations."""
    M, K = x.shape
    K2, N = qs.shape
    assert K == K2 and scales.shape == (K // GROUP, N)

    def pick(dim, pref, quantum):
        for cand in range(min(pref, dim) // quantum * quantum, 0, -quantum):
            if dim % cand == 0:
                return cand
        return dim

    block_n = pick(N, block_n, 128)
    block_k = pick(K, block_k, 256)
    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))

    xq, sx = quantize_activations(x)
    sx_t = sx.T                              # (K//32, M): lanes = m
    m_pad = -M % block_m
    if m_pad:
        xq = jnp.pad(xq, ((0, m_pad), (0, 0)))
        sx_t = jnp.pad(sx_t, ((0, 0), (0, m_pad)))
    Mp = M + m_pad

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=x.dtype, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k // GROUP, block_m),
                             lambda i, j, k: (k, i)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((block_k // GROUP, block_n),
                             lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(xq, sx_t, qs, scales)
    return out[:M] if m_pad else out


def quant_linear_int8(x: jax.Array, qw: dict) -> jax.Array:
    """Batched-activation entry: x (..., K) @ {"qs": (K,N), "scales":
    (K//32,N)[, "mins": (K//32,N)]} via the exact-integer group matmul.
    Works for any ggml format whose values fit int8 (q8_0, q4_0, q5_0,
    and the min-offset q4_1/q5_1 — the integer dots are exact; only the
    activations are q8_1-quantized, matching ggml's own mmq numerics).
    The q4_1/q5_1 min term rides outside the kernel as an exact
    group-sum matmul (ops/quant_matmul.py::group_min_term)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    qs = qw["qs"]
    if qs.dtype != jnp.int8:
        qs = qs.astype(jnp.int8)          # int4 storage -> int8 operand
    y = quant_matmul_int8(x2d, qs, qw["scales"])
    if "mins" in qw:
        from qwen2_audio_tpu.ops.quant_matmul import group_min_term
        y = y + group_min_term(x2d, qw["mins"]).astype(y.dtype)
    return y.reshape(*lead, -1)


# --------------------------------------------------------------------------- #
# Layer-STACKED exact-integer kernels (decode hot path).
#
# The unstacked kernel above forces linear_at's "int8" mode to slice the
# layer out of the stacked pytree first — and a Pallas operand cannot fuse
# a dynamic-slice, so every decode layer paid the measured 2.2x weight-copy
# tax (CLAUDE.md; the same tax the bf16-mode stacked kernels killed in r3).
# These variants select the layer inside the BlockSpec index map via
# scalar prefetch instead — zero copies — for both storage forms:
#   qs   (L, K, N) int8 strided        (q8_0/q5_0 and int8-stored q4-class)
#   qs4  (L, K//2, N) uint8 packed     (true 4-bit; unsigned nibbles, the
#        min/offset term rides outside as an exact group-sum matmul, so
#        the integer dots stay exact in the weights)
# Nibble unpack is i32-domain (mask after shift): this Mosaic build cannot
# legalize 8-bit vector shifts (q4y sweep, r4).
# ≙ ggml-cuda mmq consuming the model buffer in place per layer
# (ggml/src/ggml-cuda/mmq.cuh:2936; routing ggml-cuda.cu:1882).
# --------------------------------------------------------------------------- #

def _kernel_stacked(li_ref, xq_ref, sx_ref, qs_ref, sw_ref, o_ref, acc_ref,
                    *, out_dtype, block_k, packed: bool, off: int = 0):
    del li_ref
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if packed:
        p = qs_ref[0].astype(jnp.int32)            # (bk//2, bn)
        bk2, bn = p.shape
        n_g = bk2 // 16
        lo = ((p & 0xF) - off).astype(jnp.int8)   # off=8: symmetric
        hi = (((p >> 4) & 0xF) - off).astype(jnp.int8)  # q4_0, stays exact
        w = jnp.concatenate([lo.reshape(n_g, 16, bn),
                             hi.reshape(n_g, 16, bn)],
                            axis=1).reshape(2 * bk2, bn)
    else:
        w = qs_ref[0]                              # (bk, bn) int8

    n_groups = block_k // GROUP
    for g in range(n_groups):                      # static unroll
        xg = xq_ref[:, g * GROUP:(g + 1) * GROUP]
        wg = w[g * GROUP:(g + 1) * GROUP, :]
        pd = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)      # exact
        scale = (sx_ref[g, :][:, None].astype(jnp.float32)
                 * scales_f32(sw_ref[0, g, :][None, :]))
        acc_ref[...] += pd.astype(jnp.float32) * scale

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "block_k", "off"))
def quant_matmul_int8_stacked(
    x: jax.Array,           # (M, K) float
    qs_all: jax.Array,      # (L, K, N) int8 OR (L, K//2, N) uint8 packed
    sc_all: jax.Array,      # (L, K // 32, N)
    li: jax.Array,          # () int32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 256,
    off: int = 0,           # 8 = symmetric q4_0 (q-8), integer-exact
) -> jax.Array:
    M, K = x.shape
    L, Kq, N = qs_all.shape
    packed = Kq * 2 == K
    assert packed or Kq == K, (Kq, K)
    assert sc_all.shape == (L, K // GROUP, N)

    def pick(dim, pref, quantum):
        for cand in range(min(pref, dim) // quantum * quantum, 0, -quantum):
            if dim % cand == 0:
                return cand
        return dim

    block_n = pick(N, block_n, 128)
    block_k = pick(K, block_k, 256)
    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))

    xq, sx = quantize_activations(x)
    sx_t = sx.T                                    # (K//32, M): lanes = m
    m_pad = -M % block_m
    if m_pad:
        xq = jnp.pad(xq, ((0, m_pad), (0, 0)))
        sx_t = jnp.pad(sx_t, ((0, 0), (0, m_pad)))
    Mp = M + m_pad

    kdiv = 2 if packed else 1
    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, out_dtype=x.dtype,
                          block_k=block_k, packed=packed, off=off),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda i, j, k, li: (i, k)),
                pl.BlockSpec((block_k // GROUP, block_m),
                             lambda i, j, k, li: (k, i)),
                pl.BlockSpec((1, block_k // kdiv, block_n),
                             lambda i, j, k, li: (li[0], k, j)),
                pl.BlockSpec((1, block_k // GROUP, block_n),
                             lambda i, j, k, li: (li[0], k, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, k, li: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), xq, sx_t, qs_all, sc_all)
    return out[:M] if m_pad else out


def quant_linear_int8_stacked(x: jax.Array, qw: dict, li: jax.Array
                              ) -> jax.Array:
    """Stacked-pytree entry for linear_at's "int8" mode: {"qs" | "qs4",
    "scales"[, "mins"]} with leading (L,) axes; ``li`` selects the layer
    inside the kernel (zero weight copies). Min/offset terms ride outside
    as the exact group-sum matmul."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    qs = qw.get("qs4", qw.get("qs"))
    if "qs4" not in qw and qs.dtype != jnp.int8:
        qs = qs.astype(jnp.int8)
    off = 8 if ("qs4" in qw and "mins" not in qw) else 0
    y = quant_matmul_int8_stacked(x2d, qs, qw["scales"], li, off=off)
    if "mins" in qw:
        from qwen2_audio_tpu.ops.quant_matmul import group_min_term
        mins = jax.lax.dynamic_index_in_dim(qw["mins"], li, keepdims=False)
        y = y + group_min_term(x2d, mins).astype(y.dtype)
    return y.reshape(*lead, -1)
