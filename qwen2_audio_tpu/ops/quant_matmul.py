"""Quantized-weight matmul Pallas kernels.

TPU replacement for ggml's quantized matmul stack (CUDA mmq tile kernels
ggml/src/ggml-cuda/mmq.cuh, mmvq matvec mmvq.cu, routed from
ggml_cuda_mul_mat ggml-cuda.cu:1882-1946): weights live in HBM as narrow
integers with per-32-group scales and are dequantized in VMEM tiles right
before hitting the MXU. Activations stay bf16/f32.

Device weight layout (produced by quant/qparams.py from ggml blocks with
bit-exact values):
    qs:     (K, N) int8 (q8_0) or int4 (q4_0) — [in, out] like dense weights
    scales: (K // 32, N) float32 — ggml group size 32 along the input dim
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _q4_u8ops_enabled() -> bool:
    """u8-domain nibble unpack (mask/shift BEFORE the i32 widening).
    MEASURED DEAD ON TPU: this Mosaic build cannot legalize
    'arith.shrui' on 8-bit vectors (q4y sweep, r4 — every u8-domain
    variant failed remote compile), so the knob is interpret-mode-only;
    on TPU it is forced off regardless of QA_Q4_U8. Kept because the
    sweep's companion ablation (int80: no unpack at all) showed the
    i32-domain dequant chain is nearly free anyway — the q4 limiter is
    the u8 HBM stream itself, not the unpack arithmetic."""
    if not _use_interpret():
        return False
    return os.environ.get("QA_Q4_U8", "0") not in ("0", "false", "")


def _dq16_enabled() -> bool:
    """bf16-domain dequant for the fast packed-q4 path: the nibble cast,
    scale expansion, group broadcast, and dequant multiply all run at
    bf16 lane width (2 elements/lane) instead of f32. Numerics: nibble
    values are EXACT in bf16 (|q-8| <= 8) and the f16 scale payload
    rounds to bf16 (2^-8 rel) — one extra rounding on a path whose
    weight tile is rounded to bf16 for the MXU anyway.  MEASURED: 12%
    e2e LOSS (7B q4_0 --spec 6: 102.6 vs 116.9 tok/s, r5 queue r5k) —
    same failure mode as the fa_pexp16 softmax variant: Mosaic widens
    bf16 VPU arithmetic to f32 internally, so the halved lane width
    never materializes and the extra cast passes cost real time.  Stays
    default OFF (round-3 gating rule); env QA_Q4_DQ16=0/1, on TPU
    additionally requires the qmm_dq16 validation marker."""
    env = os.environ.get("QA_Q4_DQ16")
    if env is not None:
        return env not in ("0", "false", "")
    return False


_DQ16_MARKER = "/tmp/qa_kernel_ok_qmm_dq16"


def _dq16_armed() -> bool:
    if not _dq16_enabled():
        return False
    if _use_interpret():
        return True
    return os.path.exists(_DQ16_MARKER) or \
        os.environ.get("QA_Q4_DQ16") is not None


def _dequant4_tile(qp: jax.Array, sc: jax.Array, u8ops: bool | None,
                   off: int, fast: bool, dq16: bool = False) -> jax.Array:
    """Packed nibbles (bk//2, bn) + group scales -> the (bk, bn) weight
    tile in the dtype the dot consumes (bf16 when fast, f32 otherwise).
    One shared body so every packed-q4 kernel picks up the bf16-domain
    dequant mode together."""
    bk2, bn = qp.shape
    bk = bk2 * 2
    n_g = bk // GROUP
    if fast and dq16:
        q = unpack4_f32(qp, u8ops, off, dtype=jnp.bfloat16)
        s = scales_f32(sc).astype(jnp.bfloat16)
        s_full = jnp.broadcast_to(s[:, None, :], (n_g, GROUP, bn)
                                  ).reshape(bk, bn)
        return q * s_full
    q = unpack4_f32(qp, u8ops, off)
    s = scales_f32(sc)
    s_full = jnp.broadcast_to(s[:, None, :], (n_g, GROUP, bn)
                              ).reshape(bk, bn)
    w = q * s_full
    return w.astype(jnp.bfloat16) if fast else w


_DQ8_MARKER = "/tmp/qa_kernel_ok_qmm_dq16_q8"


def _dq8_enabled() -> bool:
    """bf16-domain dequant for the int8-valued (q8/k-quant) kernels —
    the q8 sibling of QA_Q4_DQ16: the i8 value cast (exact in bf16,
    |q| <= 127 < 2^8-mantissa budget), scale expansion, group broadcast
    and dequant multiply run at bf16 lane width.  MEASURED: 2.5% e2e
    LOSS (7B q8_0 --spec 6: 89.1 vs 91.4 tok/s, r5 queue r5l) — same
    Mosaic bf16-widening mechanism as the q4 lever's 12% loss, smaller
    because q8 has no nibble unpack.  Stays default OFF (round-3 gating
    rule); env QA_Q8_DQ16=0/1."""
    env = os.environ.get("QA_Q8_DQ16")
    if env is not None:
        return env not in ("0", "false", "")
    return False


def _dq8_armed() -> bool:
    if not _dq8_enabled():
        return False
    if _use_interpret():
        return True
    return os.path.exists(_DQ8_MARKER) or \
        os.environ.get("QA_Q8_DQ16") is not None


def _dequant8_tile(q8: jax.Array, sc: jax.Array, group: int, fast: bool,
                   dq16: bool = False) -> jax.Array:
    """(bk, bn) int8 values + group scales -> the dequantized weight
    tile in the dtype the dot consumes (bf16 when fast, f32 otherwise).
    One shared body so every int8-valued kernel picks up the bf16-domain
    dequant mode together (the q8 analog of _dequant4_tile)."""
    bk, bn = q8.shape
    n_g = bk // group
    if fast and dq16:
        q = q8.astype(jnp.bfloat16)
        s = scales_f32(sc).astype(jnp.bfloat16)
        s_full = jnp.broadcast_to(s[:, None, :], (n_g, group, bn)
                                  ).reshape(bk, bn)
        return q * s_full
    q = q8.astype(jnp.float32)
    s = scales_f32(sc)
    s_full = jnp.broadcast_to(s[:, None, :], (n_g, group, bn)
                              ).reshape(bk, bn)
    w = q * s_full
    return w.astype(jnp.bfloat16) if fast else w


def unpack4_f32(qp: jax.Array, u8ops: bool | None = None,
                off: int = 0, dtype=jnp.float32) -> jax.Array:
    """(bk//2, bn) uint8 OR int8 packed nibbles -> (bk, bn) f32 values
    (0..15) - ``off`` in ggml's group-local pairing order (byte g*16+j
    holds values g*32+j low, g*32+j+16 high — ggml-common.h block_q4_0);
    the sublane-dim reshape+concat restores the in-group order. Mosaic
    can't cast u8->f32 directly, so widening goes via i32; the high
    nibble is masked AFTER the shift so int8-stored bytes (sign-extended
    widening — the q4z 'i8cast' stream variant) decode identically to
    uint8. ``off=8`` is the symmetric q4_0 form (q-8)*d — ggml's own
    dequantize_row_q4_0 — applied in the i32 domain so no separate mins
    stream is needed (QA_Q4_SYM; for q4_0 mins = -8*d duplicates the
    scale stream byte for byte)."""
    if u8ops is None:
        u8ops = _q4_u8ops_enabled()
    bk2, bn = qp.shape
    n_g = bk2 * 2 // GROUP
    if u8ops:
        # interpret-mode only: Mosaic can't legalize 8-bit vector shifts
        lo = ((qp.astype(jnp.uint8) & jnp.uint8(0xF)
               ).astype(jnp.int32) - off).astype(dtype)
        hi = ((qp.astype(jnp.uint8) >> 4).astype(jnp.int32)
              - off).astype(dtype)
    else:
        p = qp.astype(jnp.int32)
        lo = ((p & 0xF) - off).astype(dtype)
        hi = (((p >> 4) & 0xF) - off).astype(dtype)
    return jnp.concatenate([lo.reshape(n_g, 16, bn),
                            hi.reshape(n_g, 16, bn)], axis=1
                           ).reshape(bk2 * 2, bn)


def scales_f32(s: jax.Array) -> jax.Array:
    """Group scales -> f32 values, whatever the storage dtype.

    uint16 arrays are raw f16 BIT PATTERNS expanded with integer ops:
    this Mosaic build rejects f16 kernel operands outright ("Unsupported
    type in mosaic dialect: 'f16'", validator stage qmm_sc16), so the
    lossless half-width scale stream (qparams._scale_u16_enabled) stores
    the bits and every kernel rebuilds the f32 value here — exact for
    every finite f16 INCLUDING subnormals. inf/nan are not mapped (ggml
    block `d` payloads are finite by construction). The expansion is a
    handful of VPU integer ops on a (bk//group, bn) block — noise next
    to the (bk, bn) dequant multiply it feeds."""
    if s.dtype != jnp.uint16:
        return s.astype(jnp.float32)
    bits = s.astype(jnp.int32)                    # zero-extending
    e = (bits >> 10) & 0x1F
    m = bits & 0x3FF
    sign = jnp.where((bits >> 15) != 0, -1.0, 1.0).astype(jnp.float32)
    # normals: f32 bits = (e + 127-15) << 23 | m << 13
    normal = jax.lax.bitcast_convert_type(((e + 112) << 23) | (m << 13),
                                          jnp.float32)
    # subnormals (e == 0): value = m * 2^-24, exact in f32
    sub = m.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    return sign * jnp.where(e == 0, sub, normal)


def _qmm_kernel(x_ref, qs_ref, sc_ref, o_ref, acc_ref, *, out_dtype,
                fast: bool, group: int = GROUP, dq16: bool = False):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # element-wise group repeat happens inside _dequant8_tile (row g ->
    # rows g*group..g*group+group-1; pltpu.repeat would TILE the block
    # instead, which is the wrong group expansion)
    w = _dequant8_tile(qs_ref[...], sc_ref[...], group, fast, dq16)
    if fast:
        # one native MXU pass: dequantized weights single-rounded to bf16,
        # activations bf16. Both roundings carry 8 mantissa bits — the
        # same information budget as ggml-mmq's 8-bit q8_1 activations,
        # and finer than its f16 dmmv weights-only path. ~2.5x faster at
        # decode than the HIGHEST path (one pass instead of six).
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        # HIGHEST: 6 bf16 passes reconstruct the exact f32 product — no
        # rounding beyond the f32 dequant itself
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _pick_block(dim: int, pref: int, quantum: int) -> int:
    """Largest divisor of dim that is <= pref and a multiple of `quantum`
    (Mosaic tiling: last dims must be 128-divisible or span the whole
    array; the scales' sublane dim adds a 256 quantum on K). Falls back
    to the full dimension."""
    for cand in range(min(pref, dim) // quantum * quantum, 0, -quantum):
        if dim % cand == 0:
            return cand
    return dim


def _auto_block_k(K: int, block_n: int, bytes_per_k: int = 1) -> int:
    """Measured on chip (decode M<=16, /tmp/qmm_ab2.log): HBM streaming is
    best with exactly TWO k-steps — big sequential DMAs, and two steps
    give the pipeline something to double-buffer (whole-K regressed:
    464 GB/s vs 620 at K/2 for K=3584; K=18944 went 674 -> 914 GB/s,
    memory speed-of-light, at bk=K/2). Target K/2, capped so the weight
    block stays within a ~6 MB VMEM budget (x2 buffering ~12 of 16 MB)."""
    budget = 6 * 1024 * 1024
    target = max(256, K // 2)
    while target > 256 and target * block_n * bytes_per_k > budget:
        target //= 2
    return target


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "block_k", "fast", "dq16"))
def quant_matmul(
    x: jax.Array,           # (M, K)
    qs: jax.Array,          # (K, N) int8 / int4
    scales: jax.Array,      # (K // 32, N)
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 0,       # 0 = auto (see _auto_block_k)
    fast: bool = False,     # one bf16 MXU pass instead of f32-HIGHEST
    dq16: bool = False,
) -> jax.Array:
    """x @ dequant(qs, scales) -> (M, N) in x.dtype (f32 accumulation).

    The scale-group size is derived from the shapes: K // scales.shape[0].
    32 is the ggml legacy/q4_K/q5_K granularity; 16 serves the k-quant
    sub-block formats q2_K/q3_K/q6_K (≙ the per-16 scales of
    ggml/src/ggml-cuda/vecdotq.cuh's k-quant dot kernels)."""
    M, K = x.shape
    K2, N = qs.shape
    group = K // scales.shape[0]
    assert K == K2 and scales.shape == (K // group, N) and group in (16, 32)

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    # block_k % (8*group) keeps the scales block's sublane dim
    # (block_k//group) a multiple of 8; block_n % 128 keeps lane tiling
    block_n = _pick_block(N, block_n, 128)
    block_k = _pick_block(K, block_k or _auto_block_k(K, block_n), 8 * group)
    assert K % block_k == 0 and N % block_n == 0 and block_k % group == 0

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, out_dtype=x.dtype, fast=fast,
                          group=group, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((block_k // group, block_n),
                             lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(x, qs, scales)
    return out[:M] if m_pad else out


# --------------------------------------------------------------------------- #
# Panelized (contiguous-DMA) variant: decode is HBM-latency/stream-bound, and
# a (block_k, block_n) tile of a row-major (K, N) weight is block_k separate
# rows of block_n bytes at stride N — for the shallow-K shapes (K=3584) that
# strided walk plateaus at ~620-640 GB/s on this chip no matter the block
# geometry (docs/BENCH_NOTES.md round 2). Here the weight is stored pre-tiled
# in column panels (P, K, bn) so every grid step's weight block is ONE
# contiguous HBM range (the same trick as ggml-cuda mmq's repacked tile
# layouts, ggml/src/ggml-cuda/mmq.cuh). Same dequant math, same bit-exact
# values — only the storage order changes.
# --------------------------------------------------------------------------- #

def _qmm_panel_kernel(x_ref, qs_ref, sc_ref, o_ref, acc_ref, *, out_dtype,
                      fast: bool, group: int, dq16: bool = False):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant8_tile(qs_ref[0], sc_ref[0], group, fast, dq16)
    if fast:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[0] = acc_ref[...].astype(out_dtype)


def pick_panel_width(N: int, pref: int = 0) -> int:
    """Storage-time panel width: largest 128-multiple divisor of N <= pref.

    pref=1024 measured best across every 7B decode shape (chain-200 A/B,
    M=8: qkv bn=768 549 us vs 900 strided; gate_up bn=1024 557 vs 1100;
    o bn=896 222 vs 248; lm_head bn=768 1409 vs 1482) — per-dispatch
    chains, i.e. weak evidence per the CLAUDE.md caveat. QA_PANEL_BN
    overrides the preference for e2e A/Bs (wider panels = fewer
    per-panel DMA/launch overheads: 2048 gives qkv 2304 / o 1792 /
    lm_head 1536 on the 7B shapes; whole-K packed blocks stay inside
    the 6 MB VMEM budget there)."""
    if not pref:
        pref = int(os.environ.get("QA_PANEL_BN", "1024"))
    return _pick_block(N, pref, 128)


def _panel_block_k(K: int, bn: int) -> int:
    """Panel-kernel k-blocking: whole-K single step when the weight block
    fits the VMEM budget (measured best for shallow K — the contiguous
    panel DMA needs no double-buffer split), else the two-step auto."""
    if K * bn <= 6 * 1024 * 1024:
        return K
    return _auto_block_k(K, bn)


def panelize_weight(qw: dict, block_n: int = 0) -> dict:
    """{"qs": (K, N), "scales": (K//g, N)[, "mins"]} -> contiguous-panel
    layout {"qs_p": (P, K, bn), "scales_p": (P, K//g, bn)[, "mins"]};
    packed-nibble dicts {"qs4": (K/2, N)} -> {"qs4_p": (P, K/2, bn)}.
    Pure layout transform — values are untouched, so ggml bit-exactness is
    preserved. "mins" stays (K//g, N): the min term is a separate tiny
    matmul (group_min_term) that never touches the kernel."""
    packed = "qs4" in qw
    qs, sc = (qw["qs4"] if packed else qw["qs"]), qw["scales"]
    Kr, N = qs.shape
    bn = block_n or pick_panel_width(N)
    P = N // bn
    out = {
        ("qs4_p" if packed else "qs_p"):
            jnp.transpose(qs.reshape(Kr, P, bn), (1, 0, 2)),
        "scales_p": jnp.transpose(sc.reshape(sc.shape[0], P, bn), (1, 0, 2)),
    }
    if "mins" in qw:
        out["mins"] = qw["mins"]
    if "b" in qw:
        out["b"] = qw["b"]
    return out


@functools.partial(jax.jit, static_argnames=("block_m", "block_k", "fast",
                                              "dq16"))
def quant_matmul_panel(
    x: jax.Array,           # (M, K)
    qs_p: jax.Array,        # (P, K, bn) int8 — contiguous column panels
    scales_p: jax.Array,    # (P, K // group, bn)
    *,
    block_m: int = 256,
    block_k: int = 0,       # 0 = auto (two k-steps, see _auto_block_k)
    fast: bool = False,
    dq16: bool = False,
) -> jax.Array:
    """x @ dequant(panels) -> (M, P*bn) in x.dtype (f32 accumulation).
    Scale-group size derived from shapes (32 legacy / 16 k-quant)."""
    M, K = x.shape
    P, K2, bn = qs_p.shape
    group = K // scales_p.shape[1]
    assert K == K2 and scales_p.shape == (P, K // group, bn) \
        and group in (16, 32)

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    # scales sublane x8 alignment: block_k // group % 8 == 0
    block_k = _pick_block(K, block_k or _panel_block_k(K, bn), 8 * group)
    assert K % block_k == 0 and block_k % group == 0

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, P, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm_panel_kernel, out_dtype=x.dtype, fast=fast,
                          group=group, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((P, Mp, bn), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((1, block_k, bn), lambda i, j, k: (j, k, 0)),
                pl.BlockSpec((1, block_k // group, bn),
                             lambda i, j, k: (j, k, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_m, bn),
                                   lambda i, j, k: (j, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(x, qs_p, scales_p)
    # (P, Mp, bn) -> (Mp, P*bn): one cheap transpose of the small output
    out = jnp.transpose(out, (1, 0, 2)).reshape(Mp, P * bn)
    return out[:M] if m_pad else out


# --------------------------------------------------------------------------- #
# Layer-stacked variants: the decoder keeps its weights STACKED on a leading
# (n_layers, ...) axis and runs the block under lax.scan. Feeding a pallas
# kernel from scan-sliced weights materializes a full per-layer copy every
# iteration (XLA fuses dynamic-slice into its own dots but NOT into
# custom-call operands) — measured 2.2x decode-layer traffic on 7B q8_0
# (0.836 ms/layer in-model vs the 0.38 ms kernel floor, /tmp/qa_queue_r3e.log).
# These kernels instead take the WHOLE stacked array plus the layer index as
# a scalar-prefetch argument and select the layer inside the BlockSpec index
# map, so each grid step DMAs straight from the big HBM buffer. Zero copies,
# same math, bit-identical results.
# ≙ ggml-cuda reads each layer's tensor in place from the model buffer
# (ggml/src/ggml-cuda.cu ggml_cuda_mul_mat — no staging copy either).
# --------------------------------------------------------------------------- #

def _qmm_stacked_kernel(li_ref, x_ref, qs_ref, sc_ref, o_ref, acc_ref, *,
                        out_dtype, fast: bool, group: int,
                        dq16: bool = False):
    del li_ref                        # consumed by the index maps
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant8_tile(qs_ref[0], sc_ref[0], group, fast, dq16)
    if fast:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "block_k", "fast", "dq16"))
def quant_matmul_stacked(
    x: jax.Array,           # (M, K)
    qs_all: jax.Array,      # (L, K, N) int8 — all layers, in place
    sc_all: jax.Array,      # (L, K // group, N)
    li: jax.Array,          # () int32 — layer index
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 0,
    fast: bool = False,
    dq16: bool = False,
) -> jax.Array:
    """x @ dequant(qs_all[li], sc_all[li]) with the layer selected inside
    the kernel's block index map — no per-layer weight copy."""
    M, K = x.shape
    L, K2, N = qs_all.shape
    group = K // sc_all.shape[1]
    assert K == K2 and sc_all.shape == (L, K // group, N) \
        and group in (16, 32)

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    block_n = _pick_block(N, block_n, 128)
    block_k = _pick_block(K, block_k or _auto_block_k(K, block_n), 8 * group)
    assert K % block_k == 0 and N % block_n == 0 and block_k % group == 0

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm_stacked_kernel, out_dtype=x.dtype, fast=fast,
                          group=group, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda i, j, k, li: (i, k)),
                pl.BlockSpec((1, block_k, block_n),
                             lambda i, j, k, li: (li[0], k, j)),
                pl.BlockSpec((1, block_k // group, block_n),
                             lambda i, j, k, li: (li[0], k, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, k, li: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), x, qs_all, sc_all)
    return out[:M] if m_pad else out


def _qmm_panel_stacked_kernel(li_ref, x_ref, qs_ref, sc_ref, o_ref, acc_ref,
                              *, out_dtype, fast: bool, group: int,
                              dq16: bool = False):
    del li_ref
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant8_tile(qs_ref[0, 0], sc_ref[0, 0], group, fast, dq16)
    if fast:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[0] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_k", "fast",
                                              "dq16"))
def quant_matmul_panel_stacked(
    x: jax.Array,           # (M, K)
    qs_p: jax.Array,        # (L, P, K, bn) int8 — stacked contiguous panels
    scales_p: jax.Array,    # (L, P, K // group, bn)
    li: jax.Array,          # () int32
    *,
    block_m: int = 256,
    block_k: int = 0,
    fast: bool = False,
    dq16: bool = False,
) -> jax.Array:
    """Panelized form of quant_matmul_stacked: one contiguous HBM DMA per
    weight block, layer selected by scalar prefetch."""
    M, K = x.shape
    L, P, K2, bn = qs_p.shape
    group = K // scales_p.shape[2]
    assert K == K2 and scales_p.shape == (L, P, K // group, bn) \
        and group in (16, 32)

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    block_k = _pick_block(K, block_k or _panel_block_k(K, bn), 8 * group)

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, P, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm_panel_stacked_kernel, out_dtype=x.dtype,
                          fast=fast, group=group, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((P, Mp, bn), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda i, j, k, li: (i, k)),
                pl.BlockSpec((1, 1, block_k, bn),
                             lambda i, j, k, li: (li[0], j, k, 0)),
                pl.BlockSpec((1, 1, block_k // group, bn),
                             lambda i, j, k, li: (li[0], j, k, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_m, bn),
                                   lambda i, j, k, li: (j, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), x, qs_p, scales_p)
    out = jnp.transpose(out, (1, 0, 2)).reshape(Mp, P * bn)
    return out[:M] if m_pad else out


# --------------------------------------------------------------------------- #
# Packed-nibble panels: the q4z sweep (docs/BENCH_NOTES.md round 4) showed the
# packed u8 stream — not dequant arithmetic — limits the q4 kernels, and that
# re-storing it in contiguous column panels recovers the stream rate the
# strided walk loses (chain-512, M=8, 7B shapes: qkv 671 vs 94 GB/s, gate_up
# 688 vs 518, o 459 vs 376, lm_head 690 vs 538). Same trick as the int8 panel
# section above, same bit-exact values, with whole-K single-step DMA (q4's
# half-width byte rows fit the VMEM budget where q8's could not).
# ≙ ggml-cuda mmq's repacked q4_0 tile layouts (ggml/src/ggml-cuda/mmq.cuh).
# --------------------------------------------------------------------------- #

def _panel4_block_k(K: int, bn: int) -> int:
    """Whole-K single step when the packed byte block fits the VMEM
    budget — exactly the q4z-panelf contract that won the chain-512
    sweep (gate_up K=3584 x bn=1024 ran whole-K at 687 GB/s: Mosaic
    streams the f32 dequant into the dot pipeline, so the nominal
    bk x bn x 4 B w tile never fully materializes and only the packed
    byte block budgets VMEM). Else the two-step auto split."""
    if (K // 2) * bn <= 6 * 1024 * 1024:
        return K
    return _auto_block_k(K, bn, 1)


def _qmm4_panel_kernel(x_ref, qp_ref, sc_ref, o_ref, acc_ref, *, out_dtype,
                       fast: bool, u8ops: bool = False, off: int = 0,
                       dq16: bool = False):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant4_tile(qp_ref[0], sc_ref[0], u8ops, off, fast, dq16)
    if fast:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[0] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_k", "fast",
                                              "u8ops", "off", "dq16"))
def quant_matmul_panel4(
    x: jax.Array,           # (M, K)
    qs4_p: jax.Array,       # (P, K // 2, bn) uint8 — packed nibble panels
    scales_p: jax.Array,    # (P, K // 32, bn)
    *,
    block_m: int = 256,
    block_k: int = 0,
    fast: bool = False,
    u8ops: bool | None = None,
    off: int = 0,
    dq16: bool = False,
) -> jax.Array:
    """x @ dequant(panels) -> (M, P*bn); min/offset terms are added by the
    caller (quant_linear_panel), exactly as in quant_matmul4."""
    M, K = x.shape
    P, K2, bn = qs4_p.shape
    assert K2 * 2 == K and scales_p.shape == (P, K // GROUP, bn)
    if u8ops is None:
        u8ops = _q4_u8ops_enabled()

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    block_k = _pick_block(K, block_k or _panel4_block_k(K, bn), 256)
    assert K % block_k == 0

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, P, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm4_panel_kernel, out_dtype=x.dtype, fast=fast,
                          u8ops=u8ops, off=off, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((P, Mp, bn), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((1, block_k // 2, bn),
                             lambda i, j, k: (j, k, 0)),
                pl.BlockSpec((1, block_k // GROUP, bn),
                             lambda i, j, k: (j, k, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_m, bn),
                                   lambda i, j, k: (j, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(x, qs4_p, scales_p)
    out = jnp.transpose(out, (1, 0, 2)).reshape(Mp, P * bn)
    return out[:M] if m_pad else out


def _qmm4_panel_stacked_kernel(li_ref, x_ref, qp_ref, sc_ref, o_ref, acc_ref,
                               *, out_dtype, fast: bool, u8ops: bool = False,
                               off: int = 0, dq16: bool = False):
    del li_ref
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant4_tile(qp_ref[0, 0], sc_ref[0, 0], u8ops, off, fast,
                       dq16)
    if fast:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[0] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_k", "fast",
                                              "u8ops", "off", "dq16"))
def quant_matmul_panel4_stacked(
    x: jax.Array,           # (M, K)
    qs4_p: jax.Array,       # (L, P, K // 2, bn) uint8 — stacked panels
    scales_p: jax.Array,    # (L, P, K // 32, bn)
    li: jax.Array,          # () int32
    *,
    block_m: int = 256,
    block_k: int = 0,
    fast: bool = False,
    u8ops: bool | None = None,
    off: int = 0,
    dq16: bool = False,
) -> jax.Array:
    """Panelized packed-nibble form of quant_matmul4_stacked: one
    contiguous HBM DMA per weight block, layer selected by scalar
    prefetch (zero per-layer copies — the 2.2x scan-slice tax)."""
    M, K = x.shape
    L, P, K2, bn = qs4_p.shape
    assert K2 * 2 == K and scales_p.shape == (L, P, K // GROUP, bn)
    if u8ops is None:
        u8ops = _q4_u8ops_enabled()

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    block_k = _pick_block(K, block_k or _panel4_block_k(K, bn), 256)
    assert K % block_k == 0

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, P, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm4_panel_stacked_kernel, out_dtype=x.dtype,
                          fast=fast, u8ops=u8ops, off=off, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((P, Mp, bn), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda i, j, k, li: (i, k)),
                pl.BlockSpec((1, 1, block_k // 2, bn),
                             lambda i, j, k, li: (li[0], j, k, 0)),
                pl.BlockSpec((1, 1, block_k // GROUP, bn),
                             lambda i, j, k, li: (li[0], j, k, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_m, bn),
                                   lambda i, j, k, li: (j, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(jnp.asarray(li, jnp.int32).reshape(1), x, qs4_p, scales_p)
    out = jnp.transpose(out, (1, 0, 2)).reshape(Mp, P * bn)
    return out[:M] if m_pad else out


def _qmm4_stacked_kernel(li_ref, x_ref, qp_ref, sc_ref, o_ref, acc_ref, *,
                         out_dtype, fast: bool, u8ops: bool = False,
                         off: int = 0, dq16: bool = False):
    del li_ref
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant4_tile(qp_ref[0], sc_ref[0], u8ops, off, fast, dq16)
    if fast:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "block_k", "fast", "u8ops",
                                              "off", "dq16"))
def quant_matmul4_stacked(
    x: jax.Array,           # (M, K)
    qs4_all: jax.Array,     # (L, K // 2, N) uint8 — packed nibbles
    sc_all: jax.Array,      # (L, K // 32, N)
    li: jax.Array,          # () int32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 0,
    fast: bool = False,
    u8ops: bool | None = None,   # None = env QA_Q4_U8 at trace time
    off: int = 0,            # 8 = symmetric q4_0 (q-8)*d, no mins stream
    dq16: bool = False,
) -> jax.Array:
    M, K = x.shape
    L, K2, N = qs4_all.shape
    assert K2 * 2 == K and sc_all.shape == (L, K // GROUP, N)
    if u8ops is None:
        u8ops = _q4_u8ops_enabled()

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    block_n = _pick_block(N, block_n, 128)
    block_k = _pick_block(K, block_k or _auto_block_k(K, block_n, 1), 256)

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm4_stacked_kernel, out_dtype=x.dtype, fast=fast,
                          u8ops=u8ops, off=off, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda i, j, k, li: (i, k)),
                pl.BlockSpec((1, block_k // 2, block_n),
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
    )(jnp.asarray(li, jnp.int32).reshape(1), x, qs4_all, sc_all)
    return out[:M] if m_pad else out


def quant_linear_stacked(x: jax.Array, qw: dict, li: jax.Array,
                         fast: bool = False) -> jax.Array:
    """Batched-activation entry for layer-stacked quant dicts: every leaf
    carries a leading (L,) axis; ``li`` selects the layer inside the
    kernels. Handles all three storage forms ("qs" strided, "qs_p"
    panelized, "qs4" packed nibbles) plus mins/bias terms (tiny XLA dots —
    dynamic-slice fuses there, no copy tax)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    off = 8 if ("mins" not in qw and ("qs4" in qw or "qs4_p" in qw)) else 0
    if "qs4_p" in qw:
        y = quant_matmul_panel4_stacked(x2d, qw["qs4_p"], qw["scales_p"], li,
                                        fast=fast, off=off,
                                        dq16=_dq16_armed())
    elif "qs_p" in qw:
        y = quant_matmul_panel_stacked(x2d, qw["qs_p"], qw["scales_p"], li,
                                       fast=fast, dq16=_dq8_armed())
    elif "qs4" in qw:
        y = quant_matmul4_stacked(x2d, qw["qs4"], qw["scales"], li, fast=fast,
                                  off=off, dq16=_dq16_armed())
    else:
        y = quant_matmul_stacked(x2d, qw["qs"], qw["scales"], li, fast=fast,
                                 dq16=_dq8_armed())
    if "mins" in qw:
        mins = jax.lax.dynamic_index_in_dim(qw["mins"], li, keepdims=False)
        y = y + group_min_term(x2d, mins,
                               group=K // mins.shape[0]).astype(y.dtype)
    return y.reshape(*lead, -1)


def quant_linear_panel(x: jax.Array, qw: dict, fast: bool = False
                       ) -> jax.Array:
    """Batched-activation entry for the panelized forms (int8 "qs_p" or
    packed-nibble "qs4_p")."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    if "qs4_p" in qw:
        y = quant_matmul_panel4(x2d, qw["qs4_p"], qw["scales_p"], fast=fast,
                                off=8 if "mins" not in qw else 0,
                                dq16=_dq16_armed())
    else:
        y = quant_matmul_panel(x2d, qw["qs_p"], qw["scales_p"], fast=fast,
                               dq16=_dq8_armed())
    if "mins" in qw:
        y = y + group_min_term(x2d, qw["mins"],
                               group=K // qw["mins"].shape[0]).astype(y.dtype)
    return y.reshape(*lead, -1)


def group_min_term(x2d: jax.Array, mins: jax.Array,
                   group: int = GROUP) -> jax.Array:
    """The per-group-min correction for q4_1/q5_1: with w = q*d + m (m
    constant over each 32-group), x @ W = x @ (q*d) + gsum(x) @ m where
    gsum is the exact per-group activation sum — a tiny (M, K/32) @
    (K/32, N) matmul, no kernel changes needed (≙ the m*s term of
    ggml_vec_dot_q4_1_q8_1, ggml/src/ggml-quants.c). k-quant formats with
    16-element sub-blocks pass group=16."""
    M, K = x2d.shape
    gsum = x2d.astype(jnp.float32).reshape(M, K // group, group).sum(-1)
    # tiny (M, K/32) matmul, but on TPU the default precision truncates
    # operands to bf16 — the min term (q4_0's folded -8*d rides on it)
    # needs the exact f32 product
    return jnp.dot(gsum, mins.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)


def quant_linear(x: jax.Array, qw: dict, fast: bool = False) -> jax.Array:
    """Batched-activation entry: x (..., K) @ quantized weight dict
    {"qs": (K,N), "scales": (K//32,N)[, "mins": (K//32,N)]} -> (..., N).
    Packed-nibble dicts ({"qs4"}) route to quant_linear4."""
    if "qs4" in qw:
        return quant_linear4(x, qw, fast=fast)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    y = quant_matmul(x2d, qw["qs"], qw["scales"], fast=fast,
                     dq16=_dq8_armed())
    if "mins" in qw:
        y = y + group_min_term(x2d, qw["mins"],
                               group=K // qw["mins"].shape[0]).astype(y.dtype)
    return y.reshape(*lead, -1)


def dequantize_weight(qw: dict, dtype=jnp.float32) -> jax.Array:
    """Reference dequantization (XLA, for tests / fallbacks)."""
    if "qs4" in qw:
        return dequantize_weight4(qw, dtype)
    q = qw["qs"].astype(jnp.float32)
    group = q.shape[0] // qw["scales"].shape[0]
    s = jnp.repeat(scales_f32(qw["scales"]), group, axis=0)
    w = q * s
    if "mins" in qw:
        w = w + jnp.repeat(qw["mins"].astype(jnp.float32), group, axis=0)
    return w.astype(dtype)


# --------------------------------------------------------------------------- #
# Packed-nibble (true 4-bit storage) matmul: this PJRT rejects jnp.int4
# arrays, so q4-class weights packed as int8 wasted half their bandwidth
# advantage. Here two nibbles share one uint8 byte in HBM — ggml's own
# in-group pairing (value j in the low nibble, j+16 in the high nibble of
# byte g*16+j, ggml-common.h block_q4_0) — and the kernel unpacks in VMEM
# right before the MXU. All q4 forms are expressed as UNSIGNED nibbles
# w = n*d + m (q4_0's -8 offset folds into the min term as m = -8*d), so
# one kernel serves q4_0 / q4_1 / q4_K.
# ≙ the 4-bit half of ggml-cuda's dmmv/mmvq dequant-on-the-fly kernels.
# --------------------------------------------------------------------------- #

def _qmm4_kernel(x_ref, qp_ref, sc_ref, o_ref, acc_ref, *, out_dtype,
                 fast: bool, u8ops: bool = False, off: int = 0,
                 dq16: bool = False):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _dequant4_tile(qp_ref[...], sc_ref[...], u8ops, off, fast, dq16)
    if fast:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jnp.dot(x_ref[...].astype(jnp.float32), w,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                              "block_k", "fast", "u8ops",
                                              "off", "dq16"))
def quant_matmul4(
    x: jax.Array,           # (M, K)
    qs4: jax.Array,         # (K // 2, N) uint8 — two nibbles per byte
    scales: jax.Array,      # (K // 32, N)
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 0,       # 0 = auto (two k-steps, see _auto_block_k)
    fast: bool = False,
    u8ops: bool | None = None,   # None = env QA_Q4_U8 at trace time
    off: int = 0,            # 8 = symmetric q4_0 (q-8)*d, no mins stream
    dq16: bool = False,
) -> jax.Array:
    """x @ (unpack4(qs4) * scales) -> (M, N); min/offset terms are added
    by the caller (quant_linear4)."""
    M, K = x.shape
    assert qs4.shape[0] * 2 == K and scales.shape == (K // GROUP, qs4.shape[1])
    N = qs4.shape[1]
    if u8ops is None:
        u8ops = _q4_u8ops_enabled()

    block_m = min(block_m, max(8, 1 << (M - 1).bit_length()))
    block_n = _pick_block(N, block_n, 128)
    # packed nibbles: the weight block is block_k//2 bytes deep
    block_k = _pick_block(K, block_k or _auto_block_k(K, block_n, 1), 256)
    assert K % block_k == 0 and N % block_n == 0

    m_pad = -M % block_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    grid = (Mp // block_m, N // block_n, K // block_k)
    out = pl.pallas_call(
        functools.partial(_qmm4_kernel, out_dtype=x.dtype, fast=fast,
                          u8ops=u8ops, off=off, dq16=dq16),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
                pl.BlockSpec((block_k // 2, block_n),
                             lambda i, j, k: (k, j)),
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
    )(x, qs4, scales)
    return out[:M] if m_pad else out


def quant_linear4(x: jax.Array, qw: dict, fast: bool = False) -> jax.Array:
    """Packed-nibble entry: {"qs4": (K/2,N) uint8, "scales": (K/32,N)
    [, "mins": (K/32,N)]} — the min term carries q4_1/q4_K's real
    per-group min (and q4_0's -8*d offset in the legacy mins-carrying
    form); a dict WITHOUT mins is the symmetric q4_0 form, dequantized
    (q-8)*d inside the kernel (QA_Q4_SYM — no separate mins stream)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2d = x.reshape(-1, K)
    sym = "mins" not in qw
    y = quant_matmul4(x2d, qw["qs4"], qw["scales"], fast=fast,
                      off=8 if sym else 0, dq16=_dq16_armed())
    if not sym:
        y = y + group_min_term(x2d, qw["mins"]).astype(y.dtype)
    return y.reshape(*lead, -1)


def dequantize_weight4(qw: dict, dtype=jnp.float32) -> jax.Array:
    """Reference unpack of the packed-nibble dict (tests / fallbacks)."""
    p = qw["qs4"].astype(jnp.uint8)       # qs4 may be stored int8 (QA_Q4_I8)
    K2, N = p.shape
    n_g = K2 * 2 // GROUP
    lo = (p & 0xF).astype(jnp.float32).reshape(n_g, 16, N)
    hi = (p >> 4).astype(jnp.float32).reshape(n_g, 16, N)
    q = jnp.concatenate([lo, hi], axis=1).reshape(K2 * 2, N)
    s = jnp.repeat(scales_f32(qw["scales"]), GROUP, axis=0)
    if "mins" not in qw:                  # symmetric q4_0: (q - 8) * d
        return ((q - 8.0) * s).astype(dtype)
    m = jnp.repeat(qw["mins"].astype(jnp.float32), GROUP, axis=0)
    return (q * s + m).astype(dtype)
