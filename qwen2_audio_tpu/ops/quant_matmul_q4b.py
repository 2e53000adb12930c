"""Word-packed (b32) symmetric q4_0 matmul: the stream-ceiling kernel.

The r5 stream-ceiling microbench (tools/bench_stream.py, BENCH_NOTES)
located the q4 decode limiter in the PER-BYTE unpack ALU: 8-bit-declared
nibble storage unpacks at ~403 GB/s against a ~970 GB/s DMA floor because
every byte is widened to its own i32 lane before the mask/shift, while
i32-declared words move at the DMA rate. This kernel therefore stores the
packed nibble stream as int32 WORDS (4 payload bytes per element, packed
along K sublanes) and unpacks in the packed domain:

    w    : (K//8, N) int32      word r packs byte-rows 4r..4r+3 LSB-first
                                (probed on this Mosaic build: consec_le,
                                tools/probe_b32.py)
    lo   = bitcast(swar8(w & 0x0F0F0F0F))        -> (K//2, N) int8, q-8
    hi   = bitcast(swar8((w >> 4) & 0x0F0F0F0F)) -> (K//2, N) int8, q-8

where swar8(p) = ((p | 0x80808080) - 0x08080808) ^ 0x80808080 subtracts
8 from every byte in two's complement WITHOUT leaving the i32 domain —
this Mosaic build legalizes neither 8-bit vector shifts (r4 q4y sweep)
nor 8-bit vector subtracts (probe: 'failed to legalize arith.subi' on
vector<i8>), but pltpu.bitcast(i32 -> i8) along sublanes is fine. Every
unpack op touches 4 bytes per lane instead of 1: ~2.3 lane-ops/byte vs
~6 for the 8-bit-declared stream.

The dot side reuses the exact-integer structure of quant_matmul_int8
(ggml-mmq analog — activations quantized to q8_1-style per-32-group int8,
s8 x s8 -> i32 MXU dots, float scale fixup per group; reference
/root/reference/ggml/src/ggml-cuda/mmq.cuh:2936, vecdotq.cuh:40-70): the
int8 nibble values feed the MXU DIRECTLY, so the i8 -> f32 widen+dequant
(the other half of the 8-bit stream tax) disappears entirely.

ggml byte semantics preserved: payload byte g*16+j holds k=g*32+j in its
low nibble and k=g*32+j+16 in its high nibble (ggml-common.h block_q4_0),
so `lo` rows map to the first 16 k of each 32-group and `hi` rows to the
last 16; the kernel splits each group's activation columns accordingly
instead of re-interleaving the (large) weight tile.

Hardware gating: marker /tmp/qa_kernel_ok_qmm_q4b (standalone) and
_q4b_decoder (composed) via tools/validate_tpu_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen2_audio_tpu.ops.quant_matmul import scales_f32
from qwen2_audio_tpu.ops.quant_matmul_int8 import quantize_activations

GROUP = 32


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def pack_b32(qs4: np.ndarray) -> np.ndarray:
    """Host-pack a (..., K//2, N) u8/i8 nibble payload into (..., K//8, N)
    int32 words, 4 consecutive byte-rows per word, LSB-first (the consec_le
    order tools/probe_b32.py measured for this build's tpu.bitcast)."""
    b = np.asarray(qs4)
    if b.dtype != np.uint8:
        b = b.view(np.uint8)
    *lead, R, N = b.shape
    assert R % 4 == 0, (R, "byte rows must pack 4-per-word")
    c = b.reshape(*lead, R // 4, 4, N).astype(np.uint32)
    w = (c[..., 0, :] | (c[..., 1, :] << 8)
         | (c[..., 2, :] << 16) | (c[..., 3, :] << 24))
    return w.view(np.int32)


def unpack_b32_np(w: np.ndarray) -> np.ndarray:
    """Numpy oracle: (..., K//8, N) i32 words -> (..., K//2, N) u8 bytes."""
    u = np.asarray(w).view(np.uint32)
    *lead, R4, N = u.shape
    out = np.empty((*lead, R4 * 4, N), np.uint8)
    for b in range(4):
        out[..., b::4, :] = ((u >> (8 * b)) & 0xFF).astype(np.uint8)
    return out


_B = -0x7F7F7F80                     # 0x80808080 as int32 (python int —
#                                      a jnp scalar here would be captured
#                                      as a pallas kernel constant)


def _swar_sub8(p: jax.Array) -> jax.Array:
    """Per-byte (value - 8) in two's complement without leaving i32:
    every minuend byte is forced >= 0x80 so no borrow crosses bytes."""
    return ((p | _B) - 0x08080808) ^ _B


def _unpack_q4b(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(bk//8, bn) i32 words -> (lo, hi) int8 (bk//2, bn), values q-8."""
    lo = pltpu.bitcast(_swar_sub8(w & 0x0F0F0F0F), jnp.int8)
    hi = pltpu.bitcast(_swar_sub8((w >> 4) & 0x0F0F0F0F), jnp.int8)
    return lo, hi


def _kernel_q4b_stacked(li_ref, xq_ref, sx_ref, qp_ref, sw_ref, o_ref,
                        acc_ref, *, out_dtype, block_k: int):
    del li_ref
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_q4b(qp_ref[0])                # (block_k//2, bn) i8

    n_groups = block_k // GROUP
    for g in range(n_groups):                      # static unroll
        # byte rows g*16+j hold k = g*32+j (lo) and g*32+16+j (hi)
        xl = xq_ref[:, g * GROUP:g * GROUP + 16]
        xh = xq_ref[:, g * GROUP + 16:(g + 1) * GROUP]
        wl = lo[g * 16:(g + 1) * 16, :]
        wh = hi[g * 16:(g + 1) * 16, :]
        pd = (jax.lax.dot_general(xl, wl, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
              + jax.lax.dot_general(xh, wh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32))
        scale = (sx_ref[g, :][:, None].astype(jnp.float32)
                 * scales_f32(sw_ref[0, g, :][None, :]))
        acc_ref[...] += pd.astype(jnp.float32) * scale

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "block_k"))
def quant_matmul_q4b_stacked(
    x: jax.Array,           # (M, K) float
    qp_all: jax.Array,      # (L, K//8, N) int32 word-packed nibbles
    sc_all: jax.Array,      # (L, K//32, N) group scales
    li: jax.Array,          # () int32 layer select
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 256,
) -> jax.Array:
    M, K = x.shape
    L, K8, N = qp_all.shape
    assert K8 * 8 == K, (K8, K)
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

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel_q4b_stacked, out_dtype=x.dtype,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda i, j, k, li: (i, k)),
                pl.BlockSpec((block_k // GROUP, block_m),
                             lambda i, j, k, li: (k, i)),
                pl.BlockSpec((1, block_k // 8, block_n),
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
    )(jnp.asarray(li, jnp.int32).reshape(1), xq, sx_t, qp_all, sc_all)
    return out[:M] if m_pad else out


def quant_linear_q4b_stacked(x: jax.Array, qw: dict, li: jax.Array
                             ) -> jax.Array:
    """Stacked-pytree entry for linear_at: {"qs4b" (L, K//8, N) int32,
    "scales" (L, K//32, N)}; ``li`` selects the layer via scalar prefetch
    (zero weight copies). The b32 form is sym-only (q4_0)."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    y = quant_matmul_q4b_stacked(x2d, qw["qs4b"], qw["scales"], li)
    return y.reshape(*lead, -1)


def quant_linear_q4b(x: jax.Array, qw: dict) -> jax.Array:
    """Single-weight entry (lm_head): reuse the stacked kernel at L=1 —
    the leading-axis expand is a free XLA reshape, and one kernel body
    keeps the validation surface small."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    y = quant_matmul_q4b_stacked(x2d, qw["qs4b"][None], qw["scales"][None],
                                 jnp.int32(0))
    return y.reshape(*lead, -1)


def dequantize_weight_q4b(qw: dict, dtype=jnp.float32) -> jax.Array:
    """Oracle-grade dequant of the b32 form (tests, prefill fallback)."""
    bytes_ = unpack_b32_np(np.asarray(qw["qs4b"]))          # (K//2, N) u8
    lo = (bytes_ & 0xF).astype(np.int32) - 8
    hi = (bytes_ >> 4).astype(np.int32) - 8
    R, N = bytes_.shape
    n_g = R // 16
    q = np.concatenate([lo.reshape(n_g, 16, N), hi.reshape(n_g, 16, N)],
                       axis=1).reshape(2 * R, N)
    sc = np.asarray(scales_f32(jnp.asarray(qw["scales"])))
    w = q.astype(np.float32) * np.repeat(sc, GROUP, axis=0)
    return jnp.asarray(w, dtype=dtype)
