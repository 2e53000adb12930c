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

Storage forms (one kernel body, three dequant flavors — all stacked
(L, ...) leaves with a scalar-prefetch layer index, see quant_matmul.py's
stacked section for the zero-copy rationale):

- strided int8 {"qs","scales"}                      (q8_0/q5_0/q3_K/q6_K)
- strided int8 + per-group mins {"qs","scales","mins"} (q5_1/q5_K/q2_K;
  dequant is w = q*d + m IN-KERNEL — the two-launch path's external
  gsum(x) @ mins correction cannot see the fused intermediate)
- packed nibbles + mins {"qs4","scales","mins"}     (q4_0/q4_1, true
  4-bit storage; exact for q4_0 since q*d has <= 15 mantissa bits and
  m = -8*d, so q*d + m == (q-8)*d in f32)

≙ ggml-cuda running ffn_gate/ffn_up/ffn_down as three mul_mat launches
(ggml/src/ggml-cuda.cu ggml_cuda_mul_mat) — the fusion is the TPU-side
improvement, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen2_audio_tpu.ops.quant_matmul import (_use_interpret, scales_f32,
                                              unpack4_f32)


# --- dequant flavors (operate on one weight's block refs) ------------------

def _deq_strided(q_ref, s_ref):
    q = q_ref[0].astype(jnp.float32)
    s = scales_f32(s_ref[0])
    k, n = q.shape
    group = k // s.shape[0]
    s_full = jnp.broadcast_to(s[:, None, :], (k // group, group, n)
                              ).reshape(k, n)
    return q * s_full


def _deq_strided_m(q_ref, s_ref, m_ref):
    q = q_ref[0].astype(jnp.float32)
    s = scales_f32(s_ref[0])
    m = m_ref[0].astype(jnp.float32)
    k, n = q.shape
    group = k // s.shape[0]
    n_g = k // group
    s_full = jnp.broadcast_to(s[:, None, :], (n_g, group, n)).reshape(k, n)
    m_full = jnp.broadcast_to(m[:, None, :], (n_g, group, n)).reshape(k, n)
    return q * s_full + m_full


def _deq_packed(qp_ref, s_ref):
    """Symmetric packed q4_0: (q - 8) * d in-kernel (QA_Q4_SYM) — no mins
    stream at all (for q4_0 mins = -8*d duplicates the scale bytes)."""
    bk2, bn = qp_ref.shape[1:]
    bk = bk2 * 2
    n_g = bk // 32
    q = unpack4_f32(qp_ref[0], off=8)
    s = scales_f32(s_ref[0])
    s_full = jnp.broadcast_to(s[:, None, :], (n_g, 32, bn)).reshape(bk, bn)
    return q * s_full


def _deq_packed_m(qp_ref, s_ref, m_ref):
    bk2, bn = qp_ref.shape[1:]                 # (1, bk//2, bn)
    bk = bk2 * 2
    n_g = bk // 32                             # pack4 pairs within 32-groups
    q = unpack4_f32(qp_ref[0])
    s = scales_f32(s_ref[0])
    m = m_ref[0].astype(jnp.float32)
    s_full = jnp.broadcast_to(s[:, None, :], (n_g, 32, bn)).reshape(bk, bn)
    m_full = jnp.broadcast_to(m[:, None, :], (n_g, 32, bn)).reshape(bk, bn)
    return q * s_full + m_full


_DEQ = {"strided": (_deq_strided, 2),
        "strided_m": (_deq_strided_m, 3),
        "packed": (_deq_packed, 2),
        "packed_m": (_deq_packed_m, 3)}


def _swiglu_kernel(li_ref, x_ref, *refs, out_dtype, fast: bool, kind: str):
    """Shared body: refs = gate refs + up refs + down refs, then the output
    ref and the f32 accumulator scratch (Pallas appends them)."""
    del li_ref
    deq, n_per = _DEQ[kind]
    o_ref, acc_ref = refs[-2], refs[-1]
    w = refs[:-2]
    assert len(w) == 3 * n_per

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if fast:
        x = x_ref[...].astype(jnp.bfloat16)

        def dot(a, wm):
            return jnp.dot(a, wm.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    else:
        x = x_ref[...].astype(jnp.float32)

        def dot(a, wm):
            return jnp.dot(a, wm, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    g = dot(x, deq(*w[:n_per]))                 # (M, bi) f32
    u = dot(x, deq(*w[n_per:2 * n_per]))
    gated = g * jax.nn.sigmoid(g) * u           # silu(g) * u, f32
    if fast:
        gated = gated.astype(jnp.bfloat16)      # match the 2-kernel path's
        # rounding of the intermediate (its gate_up output is bf16)
    acc_ref[...] += dot(gated, deq(*w[2 * n_per:]))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def pick_block_i(I: int, group: int, block_i: int = 256) -> int:
    """Intermediate-dim block: must divide I and be a multiple of the
    scale group x 8 (f32 scale-block sublane alignment). Falls back to
    the whole I when no such divisor exists (e.g. TP-local I with an odd
    prime factor) — callers pre-check the resulting VMEM footprint."""
    bi = block_i
    while I % bi or bi % (8 * group):
        bi //= 2
        if bi < 8 * group:
            return I
    return bi


def _swiglu_call(x, gu_leaves, dn_leaves, li, *, I, group, packed,
                 block_i, fast, kind, u_leaves=None):
    """Build specs + launch. ``gu_leaves``/``dn_leaves``: the per-weight
    ref arrays in kernel order (qs, scales[, mins]); gate and up share the
    gu arrays via block-offset index maps — unless ``u_leaves`` is given
    (the split gate/up schema: canonical layers and TP shards), in which
    case gate blocks come from gu_leaves and up blocks from u_leaves,
    both at column offset 0."""
    M, K = x.shape
    D = dn_leaves[0].shape[2]
    if M > 64:
        # decode-shaped kernels: block_m is the whole (padded) M and the
        # (block_m, D) f32 accumulator lives in VMEM scratch — prefill
        # M would blow the VMEM budget (and a failed Mosaic compile can
        # wedge the remote-compile tunnel, CLAUDE.md). Callers route
        # large-M through the two-launch linear path (ops/linear.py).
        raise ValueError(
            f"fused MLP kernels are decode-shaped (M <= 64, got {M}); "
            "use the per-projection linear path for prefill-scale M")

    bi = pick_block_i(I, group, block_i)

    block_m = max(8, 1 << (M - 1).bit_length())
    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    n_gate_blocks = I // bi
    kdiv = 2 if packed else 1       # packed rows carry 2 values per byte

    def col(rows, off):             # gate/up column blocks of a gu leaf
        return pl.BlockSpec((1, rows, bi),
                            lambda i, li, off=off: (li[0], 0, i + off))

    def row(rows):                  # down row blocks
        return pl.BlockSpec((1, rows, D), lambda i, li: (li[0], i, 0))

    gu_rows = [gu_leaves[0].shape[1]] + [K // group] * (len(gu_leaves) - 1)
    dn_rows = [bi // kdiv] + [bi // group] * (len(dn_leaves) - 1)
    in_specs = [pl.BlockSpec((block_m, K), lambda i, li: (0, 0))]
    in_specs += [col(r, 0) for r in gu_rows]
    if u_leaves is None:
        in_specs += [col(r, n_gate_blocks) for r in gu_rows]
        up_ops = gu_leaves
    else:
        in_specs += [col(r, 0) for r in gu_rows]   # same row layout
        up_ops = u_leaves
    in_specs += [row(r) for r in dn_rows]

    out = pl.pallas_call(
        functools.partial(_swiglu_kernel, out_dtype=x.dtype, fast=fast,
                          kind=kind),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(I // bi,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, D), lambda i, li: (0, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, D), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), x,
      *gu_leaves, *up_ops, *dn_leaves)
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
    return _swiglu_call(x, (gu_qs, gu_sc), (dn_qs, dn_sc), li, I=I,
                        group=group, packed=False, block_i=block_i,
                        fast=fast, kind="strided")


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
    over strided int8 weights with per-group mins (q5_1/q5_K/q2_K)."""
    M, K = x.shape
    L, K2, I2 = gu_qs.shape
    I = I2 // 2
    D = dn_qs.shape[2]
    group = K // gu_sc.shape[1]
    assert K2 == K and dn_qs.shape == (L, I, D) and group in (16, 32)
    assert gu_sc.shape == (L, K // group, 2 * I) == gu_mn.shape
    assert dn_sc.shape == (L, I // group, D) == dn_mn.shape
    return _swiglu_call(x, (gu_qs, gu_sc, gu_mn), (dn_qs, dn_sc, dn_mn),
                        li, I=I, group=group, packed=False,
                        block_i=block_i, fast=fast, kind="strided_m")


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
    fused kernel; q4_0/q4_1)."""
    M, K = x.shape
    L, K2, I2 = gu_qp.shape
    I = I2 // 2
    D = dn_qp.shape[2]
    assert K2 * 2 == K and dn_qp.shape == (L, I // 2, D)
    assert gu_sc.shape == (L, K // 32, 2 * I) == gu_mn.shape
    assert dn_sc.shape == (L, I // 32, D) == dn_mn.shape
    return _swiglu_call(x, (gu_qp, gu_sc, gu_mn), (dn_qp, dn_sc, dn_mn),
                        li, I=I, group=32, packed=True,
                        block_i=block_i, fast=fast, kind="packed_m")


@functools.partial(jax.jit, static_argnames=("block_i", "fast"))
def fused_mlp4_sym_stacked(
    x: jax.Array,            # (M, K)
    gu_qp: jax.Array,        # (L, K // 2, 2I) uint8 — packed gate|up
    gu_sc: jax.Array,        # (L, K // 32, 2I)
    dn_qp: jax.Array,        # (L, I // 2, K) uint8
    dn_sc: jax.Array,        # (L, I // 32, K)
    li: jax.Array,           # () int32
    *,
    block_i: int = 256,
    fast: bool = False,
) -> jax.Array:
    """fused_mlp4_stacked for the SYMMETRIC q4_0 form: dequant is
    (q - 8) * d inside the kernel and the mins operands vanish — two
    full scale-sized HBM streams fewer per layer (QA_Q4_SYM)."""
    M, K = x.shape
    L, K2, I2 = gu_qp.shape
    I = I2 // 2
    D = dn_qp.shape[2]
    assert K2 * 2 == K and dn_qp.shape == (L, I // 2, D)
    assert gu_sc.shape == (L, K // 32, 2 * I)
    assert dn_sc.shape == (L, I // 32, D)
    return _swiglu_call(x, (gu_qp, gu_sc), (dn_qp, dn_sc),
                        li, I=I, group=32, packed=True,
                        block_i=block_i, fast=fast, kind="packed")


@functools.partial(jax.jit, static_argnames=("packed", "block_i", "fast"))
def fused_mlp_split_stacked(
    x: jax.Array,            # (M, K)
    g_leaves: tuple,         # gate (qs|qp, scales[, mins]), each (L, ...)
    u_leaves: tuple,         # up   — same shapes as gate
    dn_leaves: tuple,        # down (qs|qp, scales[, mins])
    li: jax.Array,           # () int32
    *,
    packed: bool = False,
    block_i: int = 256,
    fast: bool = False,
) -> jax.Array:
    """One-launch SwiGLU over the SPLIT gate/up schema — canonical
    (unfused) layers and TP shards, where each device holds its own gate
    and up slices that never share a fused concat axis (parallel/tp.py
    module docstring). Same kernel body as the fused-schema entries; the
    gate blocks stream from the gate arrays and the up blocks from the up
    arrays, both at column offset 0."""
    M, K = x.shape
    kdiv = 2 if packed else 1
    I = g_leaves[0].shape[2]
    D = dn_leaves[0].shape[2]
    group = (K // kdiv) // g_leaves[1].shape[1] * kdiv
    assert u_leaves[0].shape == g_leaves[0].shape
    assert g_leaves[0].shape[1] * kdiv == K
    assert dn_leaves[0].shape[1] * kdiv == I
    assert len(g_leaves) == len(u_leaves) == len(dn_leaves)
    kind = (("packed_m" if len(g_leaves) == 3 else "packed") if packed
            else "strided_m" if len(g_leaves) == 3 else "strided")
    return _swiglu_call(x, tuple(g_leaves), tuple(dn_leaves), li, I=I,
                        group=group, packed=packed, block_i=block_i,
                        fast=fast, kind=kind, u_leaves=tuple(u_leaves))
