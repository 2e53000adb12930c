"""Fused SwiGLU MLP kernel: gate/up matmul + silu*mul + down matmul in ONE
Pallas launch, for the quantized decode path.

Why: a decode-step layer runs 4 Pallas launches (qkv / o / gate_up / down);
per-launch overhead is a measurable share of the per-layer cost at decode M
(QKV fusion 3→1 measured +14% on the group-matmul path, round 2). Fusing
the MLP chain removes one more launch AND keeps the (M, I) gated
intermediate in VMEM — it never round-trips HBM.

Shape of the computation (per layer li, SwiGLU ≙ Qwen2MLP):

    gated = silu(x @ Wg) * (x @ Wu)          # Wg/Wu = halves of gate_up
    y     = gated @ Wd                        # down

Grid: one dimension over I-blocks. Each step loads the gate column block,
the up column block, and the matching down ROW block, computes the block's
gated activation, and accumulates its contribution to the full (M, D)
output in f32 scratch — mathematically the sum over I-blocks of
gated[:, blk] @ Wd[blk, :]. x stays resident in VMEM across the grid.

Storage: the strided int8 {"qs","scales"} form with stacked (L, ...) leaves
and a scalar-prefetch layer index (see quant_matmul.py's stacked section —
same zero-copy rationale). ≙ ggml-cuda running ffn_gate/ffn_up/ffn_down as
three mul_mat launches (ggml/src/ggml-cuda.cu ggml_cuda_mul_mat) — the
fusion is the TPU-side improvement, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _fused_mlp_kernel(li_ref, x_ref, g_qs_ref, g_sc_ref, u_qs_ref, u_sc_ref,
                      d_qs_ref, d_sc_ref, o_ref, acc_ref, *,
                      out_dtype, fast: bool, group: int):
    del li_ref
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def deq(q_ref, s_ref):
        q = q_ref[0].astype(jnp.float32)
        s = s_ref[0].astype(jnp.float32)
        k, n = q.shape
        s_full = jnp.broadcast_to(s[:, None, :], (k // group, group, n)
                                  ).reshape(k, n)
        return q * s_full

    if fast:
        x = x_ref[...].astype(jnp.bfloat16)

        def dot(a, w):
            return jnp.dot(a, w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        x = x_ref[...].astype(jnp.float32)

        def dot(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    g = dot(x, deq(g_qs_ref, g_sc_ref))         # (M, bi) f32
    u = dot(x, deq(u_qs_ref, u_sc_ref))
    gated = g * jax.nn.sigmoid(g) * u           # silu(g) * u, f32
    if fast:
        gated = gated.astype(jnp.bfloat16)      # match the 2-kernel path's
        # rounding of the intermediate (its gate_up output is bf16)
    acc_ref[...] += dot(gated, deq(d_qs_ref, d_sc_ref))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _fused_mlp_m_kernel(li_ref, x_ref, g_qs_ref, g_sc_ref, g_mn_ref,
                        u_qs_ref, u_sc_ref, u_mn_ref,
                        d_qs_ref, d_sc_ref, d_mn_ref, o_ref, acc_ref, *,
                        out_dtype, fast: bool, group: int):
    """Strided-int8 + per-group-min variant (q5_1 / q5_K at 32-groups,
    q2_K at 16-groups): dequant is w = q*d + m in-kernel — the external
    gsum(x) @ mins correction cannot see the fused intermediate."""
    del li_ref
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def deq(q_ref, s_ref, m_ref):
        q = q_ref[0].astype(jnp.float32)
        s = s_ref[0].astype(jnp.float32)
        m = m_ref[0].astype(jnp.float32)
        k, n = q.shape
        n_g = k // group
        s_full = jnp.broadcast_to(s[:, None, :], (n_g, group, n)
                                  ).reshape(k, n)
        m_full = jnp.broadcast_to(m[:, None, :], (n_g, group, n)
                                  ).reshape(k, n)
        return q * s_full + m_full

    if fast:
        x = x_ref[...].astype(jnp.bfloat16)

        def dot(a, w):
            return jnp.dot(a, w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        x = x_ref[...].astype(jnp.float32)

        def dot(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    g = dot(x, deq(g_qs_ref, g_sc_ref, g_mn_ref))
    u = dot(x, deq(u_qs_ref, u_sc_ref, u_mn_ref))
    gated = g * jax.nn.sigmoid(g) * u
    if fast:
        gated = gated.astype(jnp.bfloat16)
    acc_ref[...] += dot(gated, deq(d_qs_ref, d_sc_ref, d_mn_ref))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_i", "fast"))
def fused_mlp_m_stacked(
    x: jax.Array,            # (M, K)
    gu_qs: jax.Array,        # (L, K, 2I) int8
    gu_sc: jax.Array,        # (L, K // g, 2I)
    gu_mn: jax.Array,        # (L, K // g, 2I)
    dn_qs: jax.Array,        # (L, I, K) int8
    dn_sc: jax.Array,        # (L, I // g, K)
    dn_mn: jax.Array,        # (L, I // g, K)
    li: jax.Array,           # () int32
    *,
    block_i: int = 256,
    fast: bool = False,
) -> jax.Array:
    """silu(x @ gate) * (x @ up) @ down for layer ``li``, one launch,
    over strided int8 weights with per-group mins."""
    M, K = x.shape
    L, K2, I2 = gu_qs.shape
    I = I2 // 2
    D = dn_qs.shape[2]
    group = K // gu_sc.shape[1]
    assert K2 == K and dn_qs.shape == (L, I, D) and group in (16, 32)
    assert gu_sc.shape == (L, K // group, 2 * I) == gu_mn.shape
    assert dn_sc.shape == (L, I // group, D) == dn_mn.shape

    bi = block_i
    while I % bi or bi % (8 * group):
        bi //= 2
        if bi < 8 * group:
            bi = I
            break

    block_m = max(8, 1 << (M - 1).bit_length())
    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (I // bi,)
    n_gate_blocks = I // bi
    out = pl.pallas_call(
        functools.partial(_fused_mlp_m_kernel, out_dtype=x.dtype, fast=fast,
                          group=group),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, li: (0, 0)),
                pl.BlockSpec((1, K, bi), lambda i, li: (li[0], 0, i)),
                pl.BlockSpec((1, K // group, bi),
                             lambda i, li: (li[0], 0, i)),
                pl.BlockSpec((1, K // group, bi),
                             lambda i, li: (li[0], 0, i)),
                pl.BlockSpec((1, K, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                pl.BlockSpec((1, K // group, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                pl.BlockSpec((1, K // group, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                pl.BlockSpec((1, bi, D), lambda i, li: (li[0], i, 0)),
                pl.BlockSpec((1, bi // group, D),
                             lambda i, li: (li[0], i, 0)),
                pl.BlockSpec((1, bi // group, D),
                             lambda i, li: (li[0], i, 0)),
            ],
            out_specs=pl.BlockSpec((block_m, D), lambda i, li: (0, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), x,
      gu_qs, gu_sc, gu_mn, gu_qs, gu_sc, gu_mn, dn_qs, dn_sc, dn_mn)
    return out[:M] if m_pad else out


def _fused_mlp4_kernel(li_ref, x_ref, g_qp_ref, g_sc_ref, g_mn_ref,
                       u_qp_ref, u_sc_ref, u_mn_ref,
                       d_qp_ref, d_sc_ref, d_mn_ref, o_ref, acc_ref, *,
                       out_dtype, fast: bool):
    """Packed-nibble variant: weights are {qs4 (K/2 uint8), scales, mins}
    (q4_0/q4_1 true 4-bit storage). Dequant is w = q*d + m with the min
    added IN-KERNEL — exact for q4_0 (q*d has <= 15 mantissa bits, and
    m = -8*d, so q*d + m == (q-8)*d in f32) — instead of the two-kernel
    path's external gsum(x) @ mins correction, which cannot see the fused
    intermediate."""
    del li_ref
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def deq4(qp_ref, s_ref, m_ref):
        p = qp_ref[0].astype(jnp.int32)            # (bk//2, bn)
        bk2, bn = p.shape
        bk = bk2 * 2
        n_g = bk // 32                             # pack4 pairs within 32-groups
        lo = (p & 0xF).astype(jnp.float32)
        hi = (p >> 4).astype(jnp.float32)
        q = jnp.concatenate([lo.reshape(n_g, 16, bn), hi.reshape(n_g, 16, bn)],
                            axis=1).reshape(bk, bn)
        s = s_ref[0].astype(jnp.float32)
        m = m_ref[0].astype(jnp.float32)
        s_full = jnp.broadcast_to(s[:, None, :], (n_g, 32, bn)).reshape(bk, bn)
        m_full = jnp.broadcast_to(m[:, None, :], (n_g, 32, bn)).reshape(bk, bn)
        return q * s_full + m_full

    if fast:
        x = x_ref[...].astype(jnp.bfloat16)

        def dot(a, w):
            return jnp.dot(a, w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        x = x_ref[...].astype(jnp.float32)

        def dot(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    g = dot(x, deq4(g_qp_ref, g_sc_ref, g_mn_ref))
    u = dot(x, deq4(u_qp_ref, u_sc_ref, u_mn_ref))
    gated = g * jax.nn.sigmoid(g) * u
    if fast:
        gated = gated.astype(jnp.bfloat16)
    acc_ref[...] += dot(gated, deq4(d_qp_ref, d_sc_ref, d_mn_ref))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_i", "fast"))
def fused_mlp4_stacked(
    x: jax.Array,            # (M, K)
    gu_qp: jax.Array,        # (L, K // 2, 2I) uint8 — packed gate|up
    gu_sc: jax.Array,        # (L, K // 32, 2I)
    gu_mn: jax.Array,        # (L, K // 32, 2I)
    dn_qp: jax.Array,        # (L, I // 2, K) uint8
    dn_sc: jax.Array,        # (L, I // 32, K)
    dn_mn: jax.Array,        # (L, I // 32, K)
    li: jax.Array,           # () int32
    *,
    block_i: int = 256,
    fast: bool = False,
) -> jax.Array:
    """silu(x @ gate) * (x @ up) @ down for layer ``li``, one launch,
    over true-4-bit packed weights (half the HBM traffic of the int8
    fused kernel)."""
    M, K = x.shape
    L, K2, I2 = gu_qp.shape
    I = I2 // 2
    D = dn_qp.shape[2]
    assert K2 * 2 == K and dn_qp.shape == (L, I // 2, D)
    assert gu_sc.shape == (L, K // 32, 2 * I) == gu_mn.shape
    assert dn_sc.shape == (L, I // 32, D) == dn_mn.shape

    bi = block_i
    while I % bi or bi % 256:          # 8 * group(32)
        bi //= 2
        if bi < 256:
            bi = I
            break

    block_m = max(8, 1 << (M - 1).bit_length())
    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (I // bi,)
    n_gate_blocks = I // bi
    out = pl.pallas_call(
        functools.partial(_fused_mlp4_kernel, out_dtype=x.dtype, fast=fast),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, li: (0, 0)),
                # gate columns: [0, I)
                pl.BlockSpec((1, K // 2, bi), lambda i, li: (li[0], 0, i)),
                pl.BlockSpec((1, K // 32, bi), lambda i, li: (li[0], 0, i)),
                pl.BlockSpec((1, K // 32, bi), lambda i, li: (li[0], 0, i)),
                # up columns: [I, 2I)
                pl.BlockSpec((1, K // 2, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                pl.BlockSpec((1, K // 32, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                pl.BlockSpec((1, K // 32, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                # down rows
                pl.BlockSpec((1, bi // 2, D), lambda i, li: (li[0], i, 0)),
                pl.BlockSpec((1, bi // 32, D), lambda i, li: (li[0], i, 0)),
                pl.BlockSpec((1, bi // 32, D), lambda i, li: (li[0], i, 0)),
            ],
            out_specs=pl.BlockSpec((block_m, D), lambda i, li: (0, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), x,
      gu_qp, gu_sc, gu_mn, gu_qp, gu_sc, gu_mn, dn_qp, dn_sc, dn_mn)
    return out[:M] if m_pad else out


@functools.partial(jax.jit, static_argnames=("block_i", "fast"))
def fused_mlp_stacked(
    x: jax.Array,            # (M, K)
    gu_qs: jax.Array,        # (L, K, 2I) int8 — fused gate|up columns
    gu_sc: jax.Array,        # (L, K // g, 2I)
    dn_qs: jax.Array,        # (L, I, K) int8   (down: I -> D == K)
    dn_sc: jax.Array,        # (L, I // g, K)
    li: jax.Array,           # () int32
    *,
    block_i: int = 256,      # 3 weight streams double-buffer: keep blocks
    fast: bool = False,      # small (256 x 3584 int8 x 3 x 2 ~ 5.5 MB VMEM)
) -> jax.Array:
    """silu(x @ gate) * (x @ up) @ down for layer ``li``, one launch."""
    M, K = x.shape
    L, K2, I2 = gu_qs.shape
    I = I2 // 2
    D = dn_qs.shape[2]
    group = K // gu_sc.shape[1]
    assert K2 == K and dn_qs.shape == (L, I, D) and group in (16, 32)
    assert dn_sc.shape == (L, I // group, D) \
        and gu_sc.shape == (L, K // group, 2 * I)

    # block_i must divide I and be a multiple of the scale group x 8
    bi = block_i
    while I % bi or bi % (8 * group):
        bi //= 2
        if bi < 8 * group:
            bi = I
            break

    block_m = max(8, 1 << (M - 1).bit_length())
    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (I // bi,)
    n_gate_blocks = I // bi          # up half starts this many blocks in
    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, out_dtype=x.dtype, fast=fast,
                          group=group),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, li: (0, 0)),
                # gate columns: [0, I) of the fused gate|up axis
                pl.BlockSpec((1, K, bi), lambda i, li: (li[0], 0, i)),
                pl.BlockSpec((1, K // group, bi),
                             lambda i, li: (li[0], 0, i)),
                # up columns: [I, 2I) — same array, block-offset index map
                pl.BlockSpec((1, K, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                pl.BlockSpec((1, K // group, bi),
                             lambda i, li: (li[0], 0, i + n_gate_blocks)),
                # down rows
                pl.BlockSpec((1, bi, D), lambda i, li: (li[0], i, 0)),
                pl.BlockSpec((1, bi // group, D),
                             lambda i, li: (li[0], i, 0)),
            ],
            out_specs=pl.BlockSpec((block_m, D), lambda i, li: (0, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), x,
      gu_qs, gu_sc, gu_qs, gu_sc, dn_qs, dn_sc)
    return out[:M] if m_pad else out
