#!/usr/bin/env python
"""Per-shape quant-matmul microbench at decode M — decomposes where the 7B
q8_0 forward spends its time and A/Bs the strided (K,N) kernel against the
panelized contiguous-DMA layout (ops/quant_matmul.py::quant_matmul_panel).

Shapes are the fused Qwen2 decode matmuls (qkv / o / gate_up / down /
lm_head). Timing: dependent dispatch chains + final readback minus tunnel
RTT (CLAUDE.md methodology). Run in the BACKGROUND on TPU; never kill it.

    python -u tools/bench_qmm_shapes.py [--size 7b|1.5b] [--m 8] [--chain 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SHAPES = {
    # name -> (K, N) of the fused decode matmuls
    "7b": {
        "qkv": (3584, 4608),
        "o": (3584, 3584),
        "gate_up": (3584, 37888),
        "down": (18944, 3584),
        "lm_head": (3584, 152064),
    },
    "1.5b": {
        "qkv": (1536, 2048),
        "o": (1536, 1536),
        "gate_up": (1536, 17920),
        "down": (8960, 1536),
        "lm_head": (1536, 151936),
    },
    "tiny": {   # CPU interpret-mode smoke only
        "qkv": (256, 384),
        "o": (256, 256),
    },
}
LAYERS = {"7b": 28, "1.5b": 28, "tiny": 2}


def time_chain(step, x0, ops, chain, rtt_s=0.030, unroll=8):
    """Dependent-chain timing with dispatch amortization.

    Each tunnel dispatch costs a nontrivial, VARIABLE amount (hundreds of
    us observed), so dispatching `step` per link measures the tunnel, not
    the kernel, for sub-ms kernels. Jitting `unroll` dependent
    applications into ONE program makes each dispatch cover `unroll`
    device steps (unrolled, no fori_loop — CLAUDE.md: pallas in
    fori_loop has hung the remote-compile path).

    ``ops``: the weight operands, threaded as jit ARGUMENTS — a closure
    over device arrays would bake them into the program as constants,
    and a 545 MB lm_head constant blows the remote-compile request
    (HTTP 413) after minutes of serialization."""
    import jax

    @jax.jit
    def step_u(c, ops):
        for _ in range(unroll):
            c = step(c, *ops)
        return c

    _ = np.asarray(step_u(x0, ops))   # compile + warm
    links = max(1, chain // unroll)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = x0
        for _i in range(links):
            c = step_u(c, ops)
        _ = np.asarray(jax.numpy.sum(c[:1, :1]))
        best = min(best, max(time.perf_counter() - t0 - rtt_s, 1e-9)
                   / (links * unroll))
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b", choices=SHAPES)
    ap.add_argument("--m", type=int, default=8,
                    help="activation rows (8 = spec_k=7 decode forward)")
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--skip-current", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="include the exact-int8 group kernel (mmq analog)")
    ap.add_argument("--w8a8", action="store_true",
                    help="include the XLA-native per-channel int8 ceiling")
    ap.add_argument("--skip-panel", action="store_true")
    ap.add_argument("--shapes", default="",
                    help="comma list of shape names to run (default all); "
                         "long-chain confirmation runs on the big shapes "
                         "only, where RTT noise can't fabricate GB/s")
    ap.add_argument("--unroll", type=int, default=8,
                    help="device steps per dispatch (see time_chain)")
    ap.add_argument("--diag", action="store_true",
                    help="diagnostic variants: noscale kernel, bf16 "
                         "scales, XLA dense-bf16 reference")
    ap.add_argument("--q4", action="store_true",
                    help="include the packed-nibble kernel (quant_matmul4) "
                         "and its u16-scale form — quantifies the in-kernel "
                         "unpack cost vs the int8 kernel's halved bytes")
    ap.add_argument("--q4x", action="store_true",
                    help="q4 dequant-flavor sweep (round-4 VPU-bound "
                         "hypothesis): production contract w/ mins stream, "
                         "in-kernel -8 (no mins), bf16 dequant arithmetic, "
                         "two-dot no-concat unpack, wide block_n")
    ap.add_argument("--q4y", action="store_true",
                    help="q4 sweep round 2: 8-bit-domain mask/shift, "
                         "unpack-only and int8-floor ablations, "
                         "contiguous-panel q4")
    ap.add_argument("--q4z", action="store_true",
                    help="q4 sweep round 3 (after --q4y found the u8 "
                         "STREAM itself is the limiter and Mosaic "
                         "rejects u8-vector shifts): i8-dtype stream, "
                         "i32-repacked layout (8 nibbles/word), "
                         "whole-K blocks, panel with f32 scales, "
                         "and w4a8 with legal i32-domain unpack")
    ap.add_argument("--bk-sweep", action="store_true",
                    help="strided kernel at block_k 512/896/1792 "
                         "(VMEM-pressure probe)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        from qwen2_audio_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    from qwen2_audio_tpu.utils.watchdog import watchdog

    from qwen2_audio_tpu.ops.quant_matmul import (
        panelize_weight, pick_panel_width, quant_matmul, quant_matmul_panel)

    rng = np.random.default_rng(0)
    M = args.m
    print(f"backend={jax.default_backend()} M={M} chain={args.chain}",
          flush=True)

    total = {}
    shape_filter = {s for s in args.shapes.split(",") if s}
    for name, (K, N) in SHAPES[args.size].items():
        if shape_filter and name not in shape_filter:
            continue
        # synthetic q8_0-form weights (values irrelevant to bandwidth)
        qs = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
        sc = jnp.asarray(rng.standard_normal((K // 32, N)).astype(np.float32)
                         * 0.01)
        x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        gb = (qs.size + sc.size * 4) / 1e9

        def carry(x, y, K):
            return (x + y[:, :K] if y.shape[1] >= K
                    else x + jnp.tile(y, (1, -(-K // y.shape[1])))[:, :K])

        variants = []      # (tag, fn(c, *ops), ops, gbytes) — ops are jit args
        if not args.skip_current:
            def cur(x, qs, sc, K=K):
                return carry(x, quant_matmul(x, qs, sc, fast=True), K)
            variants.append(("current", cur, (qs, sc), gb))

        if args.int8:
            from qwen2_audio_tpu.ops.quant_matmul_int8 import quant_matmul_int8

            def i8(x, qs, sc, K=K):
                return carry(x, quant_matmul_int8(x, qs, sc), K)
            variants.append(("int8-mmq", i8, (qs, sc), gb))

        if args.w8a8:
            # per-channel w8a8 ceiling: XLA-native int8 dot (not the ggml
            # numeric contract — the streaming target the kernels chase)
            sc_n = jnp.asarray(rng.standard_normal((N,)).astype(np.float32)
                               * 0.01)

            def w8(x, qs, sc_n, K=K):
                xf = x.astype(jnp.float32)
                s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
                xq = jnp.round(xf * jnp.where(s_x > 0, 1.0 / s_x, 0.0)
                               ).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, qs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * s_x * sc_n).astype(x.dtype)
                return carry(x, y, K)
            variants.append(("w8a8-native", w8, (qs, sc_n), (qs.size + sc_n.size * 4) / 1e9))

        if args.q4:
            from qwen2_audio_tpu.ops.quant_matmul import quant_matmul4
            qs4 = jnp.asarray(rng.integers(0, 256, (K // 2, N),
                                           dtype=np.uint8))

            def q4(x, qs4, sc, K=K):
                return carry(x, quant_matmul4(x, qs4, sc, fast=True), K)
            variants.append(("q4-packed", q4, (qs4, sc),
                             (qs4.size + sc.size * 4) / 1e9))

            sc_u16 = jnp.asarray(np.asarray(sc).astype(np.float16)
                                 .view(np.uint16))

            def q4u(x, qs4, sc_u16, K=K):
                return carry(x, quant_matmul4(x, qs4, sc_u16, fast=True), K)
            variants.append(("q4-packed-scu16", q4u, (qs4, sc_u16),
                             (qs4.size + sc.size * 2) / 1e9))

            def q8u(x, qs, sc_u16, K=K):
                return carry(x, quant_matmul(x, qs, sc_u16, fast=True), K)
            variants.append(("strided-scu16", q8u, (qs, sc_u16),
                             (qs.size + sc.size * 2) / 1e9))

        if args.q4x:
            # ------------------------------------------------------------
            # q4 dequant-flavor sweep. Working hypothesis (round 4): the
            # packed-q4 kernels are VPU-DEQUANT-bound, not DMA-bound —
            # q4 halves q8's bytes yet decodes at the same speed, and the
            # dequant chain (mask/shift, int->f32 casts, concat shuffle,
            # scale broadcast, m_full broadcast+add, bf16 cast) is ~7 VPU
            # passes over every (bk, bn) weight block vs q8's ~4. Each
            # variant below removes specific passes; values are synthetic
            # (timing only), parity is proven separately for whichever
            # variant ships (tests + validator).
            # ------------------------------------------------------------
            import functools as _ft

            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            from qwen2_audio_tpu.ops.quant_matmul import (_auto_block_k,
                                                          _pick_block,
                                                          _use_interpret,
                                                          group_min_term,
                                                          quant_matmul4)
            from qwen2_audio_tpu.ops.quant_matmul import \
                scales_f32 as _scf32

            qs4 = jnp.asarray(rng.integers(0, 256, (K // 2, N),
                                           dtype=np.uint8))
            sc_u16 = jnp.asarray(np.asarray(sc).astype(np.float16)
                                 .view(np.uint16))
            mins = jnp.asarray((np.asarray(sc) * -8.0).astype(np.float32))
            gb4 = (qs4.size + sc.size * 2) / 1e9          # no-mins stream
            gb4m = (qs4.size + sc.size * 2 + mins.size * 4) / 1e9

            # 1. production contract today: packed kernel + external
            # gsum(x) @ mins dot (quant_linear4 path) — mins stream + dot
            def q4prod(x, qs4, sc_u16, mins, K=K):
                y = quant_matmul4(x, qs4, sc_u16, fast=True)
                y = y + group_min_term(x, mins).astype(y.dtype)
                return carry(x, y, K)
            variants.append(("q4-prod(mins)", q4prod, (qs4, sc_u16, mins),
                             gb4m))

            def _mk_q4(kind: str, bn_pref: int = 512):
                """Build a packed-q4 matmul with the given dequant flavor:
                o8      — (q - 8) in-kernel, scale broadcast fused into
                          the multiply ((n_g,32,bn) * (n_g,1,bn)), no mins
                o8bf16  — same but dequant arithmetic entirely in bf16
                          (nibbles exact in bf16; one 16-bit VPU chain)
                twodot  — no concat: two half-K dots straight off the
                          lo/hi nibble planes (x would be pre-permuted in
                          production; timing is permutation-invariant)
                """
                def kern(x_ref, qp_ref, sc_ref, o_ref, acc_ref):
                    @pl.when(pl.program_id(2) == 0)
                    def _init():
                        acc_ref[...] = jnp.zeros_like(acc_ref)
                    p = qp_ref[...].astype(jnp.int32)       # (bk2, bn)
                    bk2, bn = p.shape
                    n_g = bk2 // 16
                    s = _scf32(sc_ref[...])                 # (n_g, bn)
                    xb = x_ref[...].astype(jnp.bfloat16)
                    if kind == "o8":
                        lo = (p & 0xF).reshape(n_g, 16, bn)
                        hi = (p >> 4).reshape(n_g, 16, bn)
                        q = jnp.concatenate([lo, hi], axis=1)
                        w = ((q.astype(jnp.float32) - 8.0)
                             * s[:, None, :]).reshape(2 * bk2, bn)
                        acc_ref[...] += jnp.dot(
                            xb, w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                    elif kind == "o8bf16":
                        lo = (p & 0xF).reshape(n_g, 16, bn)
                        hi = (p >> 4).reshape(n_g, 16, bn)
                        q = jnp.concatenate([lo, hi], axis=1)
                        sb = s.astype(jnp.bfloat16)
                        w = ((q.astype(jnp.bfloat16) - jnp.bfloat16(8))
                             * sb[:, None, :]).reshape(2 * bk2, bn)
                        acc_ref[...] += jnp.dot(
                            xb, w, preferred_element_type=jnp.float32)
                    else:                                    # twodot
                        sb = s.astype(jnp.bfloat16)
                        s16 = jnp.broadcast_to(
                            sb[:, None, :], (n_g, 16, bn)).reshape(bk2, bn)
                        wl = ((p & 0xF).astype(jnp.bfloat16)
                              - jnp.bfloat16(8)) * s16
                        wh = ((p >> 4).astype(jnp.bfloat16)
                              - jnp.bfloat16(8)) * s16
                        acc_ref[...] += jnp.dot(
                            xb[:, :bk2], wl,
                            preferred_element_type=jnp.float32)
                        acc_ref[...] += jnp.dot(
                            xb[:, bk2:], wh,
                            preferred_element_type=jnp.float32)

                    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                    def _store():
                        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

                @_ft.partial(jax.jit, static_argnames=("bn_p",))
                def run(x, qs4, scu, bn_p=bn_pref):
                    Mx, Kx = x.shape
                    Nx = qs4.shape[1]
                    bm = max(8, 1 << (Mx - 1).bit_length())
                    bn_ = _pick_block(Nx, bn_p, 128)
                    bk_ = _pick_block(Kx, _auto_block_k(Kx, bn_, 1), 256)
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((Mx, Nx), x.dtype),
                        grid_spec=pl.GridSpec(
                            grid=(1, Nx // bn_, Kx // bk_),
                            in_specs=[
                                pl.BlockSpec((bm, bk_),
                                             lambda i, j, k: (i, k)),
                                pl.BlockSpec((bk_ // 2, bn_),
                                             lambda i, j, k: (k, j)),
                                pl.BlockSpec((bk_ // 32, bn_),
                                             lambda i, j, k: (k, j)),
                            ],
                            out_specs=pl.BlockSpec(
                                (bm, bn_), lambda i, j, k: (i, j)),
                            scratch_shapes=[
                                pltpu.VMEM((bm, bn_), jnp.float32)],
                        ),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel", "parallel",
                                                 "arbitrary")),
                        interpret=_use_interpret(),
                    )(x, qs4, scu)
                return run

            for tag, kind, bnp in (("q4-o8", "o8", 512),
                                   ("q4-o8-bf16", "o8bf16", 512),
                                   ("q4-twodot", "twodot", 512),
                                   ("q4-o8-bn1024", "o8", 1024),
                                   ("q4-twodot-bn1024", "twodot", 1024)):
                runner = _mk_q4(kind, bnp)

                def q4v(x, qs4, sc_u16, K=K, runner=runner):
                    return carry(x, runner(x, qs4, sc_u16), K)
                variants.append((tag, q4v, (qs4, sc_u16), gb4))

        if args.q4y:
            # ------------------------------------------------------------
            # q4 sweep round 2 (sharper ablations after --q4x found all
            # round-1 variants LOSING to the shipping kernel):
            #   u8ops      mask/shift in the 8-bit domain BEFORE widening
            #              (the shipping kernel widens u8->i32 first, 4x
            #              the vreg traffic for the mask/shift passes)
            #   u8ops-o8   + in-kernel -8 with the shipping broadcast form
            #   unpack0    unpack + dot, NO scale multiply (ablation: what
            #              does the scale handling cost on top of unpack?)
            #   int80      int8 dot, NO unpack NO scales (the byte-stream
            #              floor of any (bk/2, bn) u8 operand)
            #   panel      contiguous-panel q4 (one HBM range per block;
            #              the strided-vs-panel lesson from q8, applied)
            # ------------------------------------------------------------
            import functools as _ft

            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            from qwen2_audio_tpu.ops.quant_matmul import (_auto_block_k,
                                                          _pick_block,
                                                          _use_interpret)
            from qwen2_audio_tpu.ops.quant_matmul import \
                scales_f32 as _scf32

            qs4 = jnp.asarray(rng.integers(0, 256, (K // 2, N),
                                           dtype=np.uint8))
            sc_u16 = jnp.asarray(np.asarray(sc).astype(np.float16)
                                 .view(np.uint16))
            gb4 = (qs4.size + sc.size * 2) / 1e9

            def _mk_q4y(kind: str, bn_pref: int = 512):
                def kern(x_ref, qp_ref, sc_ref, o_ref, acc_ref):
                    @pl.when(pl.program_id(2) == 0)
                    def _init():
                        acc_ref[...] = jnp.zeros_like(acc_ref)
                    p8 = qp_ref[...]                     # (bk2, bn) uint8
                    bk2, bn = p8.shape
                    n_g = bk2 // 16
                    xb = x_ref[...].astype(jnp.bfloat16)
                    if kind == "int80":
                        # floor: one i8 cast + dot, no unpack, no scales
                        w = p8.astype(jnp.int8).astype(jnp.bfloat16)
                        acc_ref[...] += jnp.dot(
                            xb[:, :bk2], w,
                            preferred_element_type=jnp.float32)
                    else:
                        # 8-bit-domain mask/shift (quarter the vreg
                        # traffic of the shipping kernel's i32-domain ops)
                        lo8 = p8 & jnp.uint8(0xF)
                        hi8 = (p8 >> 4).astype(jnp.uint8)
                        lo = lo8.astype(jnp.int32).astype(jnp.float32)
                        hi = hi8.astype(jnp.int32).astype(jnp.float32)
                        q = jnp.concatenate(
                            [lo.reshape(n_g, 16, bn),
                             hi.reshape(n_g, 16, bn)],
                            axis=1).reshape(2 * bk2, bn)
                        if kind == "unpack0":
                            w = q
                        else:
                            # f32sc: scales arrive as f32 (no in-kernel
                            # u16 expansion — the e2e winner's contract)
                            s = (sc_ref[...] if kind == "u8ops-f32sc"
                                 else _scf32(sc_ref[...]))   # (n_g, bn)
                            if kind == "u8ops-o8":
                                q = q - 8.0
                            s_full = jnp.broadcast_to(
                                s[:, None, :],
                                (n_g, 32, bn)).reshape(2 * bk2, bn)
                            w = q * s_full
                        acc_ref[...] += jnp.dot(
                            xb, w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)

                    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                    def _store():
                        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

                @_ft.partial(jax.jit, static_argnames=("bn_p",))
                def run(x, qs4, scu, bn_p=bn_pref):
                    Mx, Kx = x.shape
                    Nx = qs4.shape[1]
                    bm = max(8, 1 << (Mx - 1).bit_length())
                    bn_ = _pick_block(Nx, bn_p, 128)
                    bk_ = _pick_block(Kx, _auto_block_k(Kx, bn_, 1), 256)
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((Mx, Nx), x.dtype),
                        grid_spec=pl.GridSpec(
                            grid=(1, Nx // bn_, Kx // bk_),
                            in_specs=[
                                pl.BlockSpec((bm, bk_),
                                             lambda i, j, k: (i, k)),
                                pl.BlockSpec((bk_ // 2, bn_),
                                             lambda i, j, k: (k, j)),
                                pl.BlockSpec((bk_ // 32, bn_),
                                             lambda i, j, k: (k, j)),
                            ],
                            out_specs=pl.BlockSpec(
                                (bm, bn_), lambda i, j, k: (i, j)),
                            scratch_shapes=[
                                pltpu.VMEM((bm, bn_), jnp.float32)],
                        ),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel", "parallel",
                                                 "arbitrary")),
                        interpret=_use_interpret(),
                    )(x, qs4, scu)
                return run

            for tag, kind in (("q4y-u8ops", "u8ops"),
                              ("q4y-u8ops-o8", "u8ops-o8"),
                              ("q4y-u8ops-f32sc", "u8ops-f32sc"),
                              ("q4y-unpack0", "unpack0"),
                              ("q4y-int80", "int80")):
                runner = _mk_q4y(kind)
                sc_op = sc if kind == "u8ops-f32sc" else sc_u16
                gbk = (qs4.size / 1e9 if kind == "int80"
                       else (qs4.size + sc.size * 4) / 1e9
                       if kind == "u8ops-f32sc" else gb4)

                def q4w(x, qs4, sc_op, K=K, runner=runner):
                    return carry(x, runner(x, qs4, sc_op), K)
                variants.append((tag, q4w, (qs4, sc_op), gbk))

            # w4a8: packed nibbles + EXACT int8 group dots (the mmq
            # numeric contract at half the weight bytes). Unpack stays in
            # the 8-bit domain (u8 mask/shift, -8 in i8); no f32 dequant
            # pass over the (bk, bn) tile at all — scales land as one
            # (bm, bn) FMA per 32-group after each int8 MXU dot.
            from qwen2_audio_tpu.ops.quant_matmul_int8 import \
                quantize_activations as _qact

            def _mk_w4a8():
                def kern(xq_ref, sxt_ref, qp_ref, sc_ref, o_ref, acc_ref):
                    @pl.when(pl.program_id(2) == 0)
                    def _init():
                        acc_ref[...] = jnp.zeros_like(acc_ref)
                    p8 = qp_ref[...]                 # (bk2, bn) uint8
                    bk2, bn = p8.shape
                    n_g = bk2 // 16
                    lo = (p8 & jnp.uint8(0xF)).astype(jnp.int8)
                    hi = (p8 >> 4).astype(jnp.int8)
                    w = jnp.concatenate(
                        [lo.reshape(n_g, 16, bn), hi.reshape(n_g, 16, bn)],
                        axis=1).reshape(2 * bk2, bn) - jnp.int8(8)
                    for g in range(n_g):             # static unroll
                        xg = xq_ref[:, g * 32:(g + 1) * 32]
                        wg = w[g * 32:(g + 1) * 32, :]
                        pd = jax.lax.dot_general(
                            xg, wg, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        scale = (sxt_ref[g, :][:, None]
                                 * sc_ref[g, :][None, :])
                        acc_ref[...] += pd.astype(jnp.float32) * scale

                    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                    def _store():
                        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

                @jax.jit
                def run(x, qs4, scf):
                    Mx, Kx = x.shape
                    Nx = qs4.shape[1]
                    bm = max(8, 1 << (Mx - 1).bit_length())
                    bn_ = _pick_block(Nx, 512, 128)
                    bk_ = _pick_block(Kx, 512, 256)
                    xq, sx = _qact(x)
                    sx_t = sx.T                      # (K//32, M): lanes=m
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((Mx, Nx), x.dtype),
                        grid_spec=pl.GridSpec(
                            grid=(1, Nx // bn_, Kx // bk_),
                            in_specs=[
                                pl.BlockSpec((bm, bk_),
                                             lambda i, j, k: (i, k)),
                                pl.BlockSpec((bk_ // 32, bm),
                                             lambda i, j, k: (k, i)),
                                pl.BlockSpec((bk_ // 2, bn_),
                                             lambda i, j, k: (k, j)),
                                pl.BlockSpec((bk_ // 32, bn_),
                                             lambda i, j, k: (k, j)),
                            ],
                            out_specs=pl.BlockSpec(
                                (bm, bn_), lambda i, j, k: (i, j)),
                            scratch_shapes=[
                                pltpu.VMEM((bm, bn_), jnp.float32)],
                        ),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel", "parallel",
                                                 "arbitrary")),
                        interpret=_use_interpret(),
                    )(xq, sx_t, qs4, scf)
                return run

            w4a8_run = _mk_w4a8()

            def q4w8(x, qs4, sc, K=K):
                return carry(x, w4a8_run(x, qs4, sc), K)
            variants.append(("q4y-w4a8", q4w8, (qs4, sc),
                             (qs4.size + sc.size * 4) / 1e9))

            # panelized q4: contiguous-panel storage, same dequant math
            def _mk_q4_panel():
                def kern(x_ref, qp_ref, sc_ref, o_ref, acc_ref):
                    @pl.when(pl.program_id(2) == 0)
                    def _init():
                        acc_ref[...] = jnp.zeros_like(acc_ref)
                    p = qp_ref[0].astype(jnp.int32)
                    bk2, bn = p.shape
                    n_g = bk2 // 16
                    lo = (p & 0xF).astype(jnp.float32)
                    hi = (p >> 4).astype(jnp.float32)
                    q = jnp.concatenate(
                        [lo.reshape(n_g, 16, bn), hi.reshape(n_g, 16, bn)],
                        axis=1).reshape(2 * bk2, bn)
                    s = _scf32(sc_ref[0])
                    s_full = jnp.broadcast_to(
                        s[:, None, :], (n_g, 32, bn)).reshape(2 * bk2, bn)
                    w = q * s_full
                    acc_ref[...] += jnp.dot(
                        x_ref[...].astype(jnp.bfloat16),
                        w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)

                    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                    def _store():
                        o_ref[0] = acc_ref[...].astype(jnp.bfloat16)

                @jax.jit
                def run(x, qp_p, sc_p):
                    Mx, Kx = x.shape
                    Pp, Kx2, bn_ = qp_p.shape
                    bm = max(8, 1 << (Mx - 1).bit_length())
                    # whole-K if the packed block fits ~6MB, else half
                    bk_ = Kx if Kx2 * bn_ <= 6 * 1024 * 1024 else Kx // 2
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((Pp, Mx, bn_),
                                                       x.dtype),
                        grid_spec=pl.GridSpec(
                            grid=(1, Pp, Kx // bk_),
                            in_specs=[
                                pl.BlockSpec((bm, bk_),
                                             lambda i, j, k: (i, k)),
                                pl.BlockSpec((1, bk_ // 2, bn_),
                                             lambda i, j, k: (j, k, 0)),
                                pl.BlockSpec((1, bk_ // 32, bn_),
                                             lambda i, j, k: (j, k, 0)),
                            ],
                            out_specs=pl.BlockSpec(
                                (1, bm, bn_), lambda i, j, k: (j, i, 0)),
                            scratch_shapes=[
                                pltpu.VMEM((bm, bn_), jnp.float32)],
                        ),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel", "parallel",
                                                 "arbitrary")),
                        interpret=_use_interpret(),
                    )(x, qp_p, sc_p)
                return run

            bn_p = _pick_block(N, 1024, 128)
            Pn = N // bn_p
            qp_pan = jnp.transpose(qs4.reshape(K // 2, Pn, bn_p), (1, 0, 2))
            sc_pan = jnp.transpose(sc_u16.reshape(K // 32, Pn, bn_p),
                                   (1, 0, 2))
            jax.block_until_ready(qp_pan)
            pan_run = _mk_q4_panel()

            def q4p(x, qp_pan, sc_pan, K=K):
                y = pan_run(x, qp_pan, sc_pan)
                y = jnp.transpose(y, (1, 0, 2)).reshape(x.shape[0], -1)
                return carry(x, y, K)
            variants.append(("q4y-panel", q4p, (qp_pan, sc_pan), gb4))

        if args.q4z:
            # ------------------------------------------------------------
            # q4 sweep round 3. q4y's int80 ablation (no unpack, no
            # scales) ran at the SAME rate as the full dequant kernel:
            # the limiter is streaming the (K/2, N) u8 array, not the
            # VPU arithmetic. These variants change the STREAM, keeping
            # the e2e-winning f32 scale contract:
            #   base     production quant_matmul4 w/ f32 scales (in-run
            #            baseline)
            #   i8cast   identical bytes stored int8 (sign-extended
            #            widening + extra mask) — is u8 zero-extension
            #            the slow path?
            #   i32pack  8 nibbles per i32 word, s-major/r-minor order
            #            (quarter the element count, same bytes, all
            #            i32-domain unpack)
            #   bk1x     whole-K blocks (q4 blocks are half q8's bytes,
            #            so the 6 MB budget allows what q8 couldn't)
            #   panelf   contiguous panels + f32 scales (q4y's panel
            #            carried the losing u16 scale contract)
            #   w4a8i    int8 group dots from packed nibbles, i32-domain
            #            unpack (q4y's w4a8 died on the u8 shift only)
            # ------------------------------------------------------------
            import functools as _ft

            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            from qwen2_audio_tpu.ops.quant_matmul import (_auto_block_k,
                                                          _pick_block,
                                                          _use_interpret,
                                                          quant_matmul4)

            qs4 = jnp.asarray(rng.integers(0, 256, (K // 2, N),
                                           dtype=np.uint8))
            gb4 = (qs4.size + sc.size * 4) / 1e9

            def q4base(x, qs4, sc, K=K):
                return carry(x, quant_matmul4(x, qs4, sc, fast=True), K)
            variants.append(("q4z-base", q4base, (qs4, sc), gb4))

            def _mk_q4z(kind: str, bk_mult: int = 1):
                def kern(x_ref, qp_ref, sc_ref, o_ref, acc_ref):
                    @pl.when(pl.program_id(2) == 0)
                    def _init():
                        acc_ref[...] = jnp.zeros_like(acc_ref)
                    xb = x_ref[...].astype(jnp.bfloat16)
                    bn = qp_ref.shape[1]
                    if kind == "i32pack":
                        p = qp_ref[...]                  # (bk//8, bn) i32
                        bk = qp_ref.shape[0] * 8
                        n_g = bk // 32
                        planes = [((p >> (4 * s)) & 0xF).astype(jnp.float32)
                                  for s in range(8)]
                        q = jnp.concatenate(
                            [pp.reshape(n_g, 4, bn) for pp in planes],
                            axis=1).reshape(bk, bn)
                    else:
                        p = qp_ref[...].astype(jnp.int32)  # (bk//2, bn)
                        bk = qp_ref.shape[0] * 2
                        n_g = bk // 32
                        lo = (p & 0xF).astype(jnp.float32)
                        # i8-stored bytes sign-extend: mask AFTER shift
                        hi = ((p >> 4) & 0xF).astype(jnp.float32)
                        q = jnp.concatenate(
                            [lo.reshape(n_g, 16, bn),
                             hi.reshape(n_g, 16, bn)],
                            axis=1).reshape(bk, bn)
                    s = sc_ref[...]                      # (n_g, bn) f32
                    w = q * jnp.broadcast_to(
                        s[:, None, :], (n_g, 32, bn)).reshape(bk, bn)
                    acc_ref[...] += jnp.dot(
                        xb, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)

                    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                    def _store():
                        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

                rdiv = 8 if kind == "i32pack" else 2

                @_ft.partial(jax.jit, static_argnames=("bk_m",))
                def run(x, qp, scf, bk_m=bk_mult):
                    Mx, Kx = x.shape
                    Nx = qp.shape[1]
                    bm = max(8, 1 << (Mx - 1).bit_length())
                    bn_ = _pick_block(Nx, 512, 128)
                    bk_ = _pick_block(Kx, _auto_block_k(Kx, bn_, 1), 256)
                    if bk_m > 1:
                        bk_ = _pick_block(Kx, min(Kx, bk_ * bk_m), 256)
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((Mx, Nx), x.dtype),
                        grid_spec=pl.GridSpec(
                            grid=(1, Nx // bn_, Kx // bk_),
                            in_specs=[
                                pl.BlockSpec((bm, bk_),
                                             lambda i, j, k: (i, k)),
                                pl.BlockSpec((bk_ // rdiv, bn_),
                                             lambda i, j, k: (k, j)),
                                pl.BlockSpec((bk_ // 32, bn_),
                                             lambda i, j, k: (k, j)),
                            ],
                            out_specs=pl.BlockSpec(
                                (bm, bn_), lambda i, j, k: (i, j)),
                            scratch_shapes=[
                                pltpu.VMEM((bm, bn_), jnp.float32)],
                        ),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel", "parallel",
                                                 "arbitrary")),
                        interpret=_use_interpret(),
                    )(x, qp, scf)
                return run

            qs4_i8 = jnp.asarray(np.asarray(qs4).view(np.int8))
            run_i8 = _mk_q4z("i8cast")

            def q4i8(x, qs4_i8, sc, K=K):
                return carry(x, run_i8(x, qs4_i8, sc), K)
            variants.append(("q4z-i8cast", q4i8, (qs4_i8, sc), gb4))

            run_bk1 = _mk_q4z("i8cast", bk_mult=8)

            def q4bk1(x, qs4_i8, sc, K=K):
                return carry(x, run_bk1(x, qs4_i8, sc), K)
            variants.append(("q4z-bk1x", q4bk1, (qs4_i8, sc), gb4))

            # i32 repack (host side): i32 row g*4+r nibble s = v[g*32+s*4+r]
            u8 = np.asarray(qs4)
            lo8, hi8 = u8 & 0xF, u8 >> 4
            v = np.concatenate([lo8.reshape(-1, 16, N),
                                hi8.reshape(-1, 16, N)],
                               axis=1).reshape(K, N)        # v[k, n]
            vg = v.reshape(K // 32, 8, 4, N).astype(np.uint32)
            w32 = np.zeros((K // 32, 4, N), np.uint32)
            for s_ in range(8):
                w32 |= vg[:, s_] << (4 * s_)
            qs4_32 = jnp.asarray(w32.reshape(K // 8, N).view(np.int32))
            jax.block_until_ready(qs4_32)
            run_32 = _mk_q4z("i32pack")

            def q4i32(x, qs4_32, sc, K=K):
                return carry(x, run_32(x, qs4_32, sc), K)
            variants.append(("q4z-i32pack", q4i32, (qs4_32, sc), gb4))

            # w4a8 with LEGAL i32-domain unpack + int8 group dots
            from qwen2_audio_tpu.ops.quant_matmul_int8 import \
                quantize_activations as _qact

            def _mk_w4a8i():
                def kern(xq_ref, sxt_ref, qp_ref, sc_ref, o_ref, acc_ref):
                    @pl.when(pl.program_id(2) == 0)
                    def _init():
                        acc_ref[...] = jnp.zeros_like(acc_ref)
                    p = qp_ref[...].astype(jnp.int32)    # (bk2, bn)
                    bk2, bn = p.shape
                    n_g = bk2 // 16
                    lo = (p & 0xF) - 8
                    hi = ((p >> 4) & 0xF) - 8
                    w = jnp.concatenate(
                        [lo.reshape(n_g, 16, bn), hi.reshape(n_g, 16, bn)],
                        axis=1).reshape(2 * bk2, bn).astype(jnp.int8)
                    for g in range(n_g):                 # static unroll
                        xg = xq_ref[:, g * 32:(g + 1) * 32]
                        wg = w[g * 32:(g + 1) * 32, :]
                        pd = jax.lax.dot_general(
                            xg, wg, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        scale = (sxt_ref[g, :][:, None]
                                 * sc_ref[g, :][None, :])
                        acc_ref[...] += pd.astype(jnp.float32) * scale

                    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                    def _store():
                        o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

                @jax.jit
                def run(x, qp, scf):
                    Mx, Kx = x.shape
                    Nx = qp.shape[1]
                    bm = max(8, 1 << (Mx - 1).bit_length())
                    bn_ = _pick_block(Nx, 512, 128)
                    bk_ = _pick_block(Kx, 512, 256)
                    xq, sx = _qact(x)
                    sx_t = sx.T
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((Mx, Nx), x.dtype),
                        grid_spec=pl.GridSpec(
                            grid=(1, Nx // bn_, Kx // bk_),
                            in_specs=[
                                pl.BlockSpec((bm, bk_),
                                             lambda i, j, k: (i, k)),
                                pl.BlockSpec((bk_ // 32, bm),
                                             lambda i, j, k: (k, i)),
                                pl.BlockSpec((bk_ // 2, bn_),
                                             lambda i, j, k: (k, j)),
                                pl.BlockSpec((bk_ // 32, bn_),
                                             lambda i, j, k: (k, j)),
                            ],
                            out_specs=pl.BlockSpec(
                                (bm, bn_), lambda i, j, k: (i, j)),
                            scratch_shapes=[
                                pltpu.VMEM((bm, bn_), jnp.float32)],
                        ),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel", "parallel",
                                                 "arbitrary")),
                        interpret=_use_interpret(),
                    )(xq, sx_t, qp, scf)
                return run

            w4_run = _mk_w4a8i()

            def q4w8i(x, qs4, sc, K=K):
                return carry(x, w4_run(x, qs4, sc), K)
            variants.append(("q4z-w4a8i", q4w8i, (qs4, sc), gb4))

            # panel + f32 scales (q4y's panel carried u16 scales)
            def _mk_q4z_panel():
                def kern(x_ref, qp_ref, sc_ref, o_ref, acc_ref):
                    @pl.when(pl.program_id(2) == 0)
                    def _init():
                        acc_ref[...] = jnp.zeros_like(acc_ref)
                    p = qp_ref[0].astype(jnp.int32)
                    bk2, bn = p.shape
                    n_g = bk2 // 16
                    lo = (p & 0xF).astype(jnp.float32)
                    hi = ((p >> 4) & 0xF).astype(jnp.float32)
                    q = jnp.concatenate(
                        [lo.reshape(n_g, 16, bn), hi.reshape(n_g, 16, bn)],
                        axis=1).reshape(2 * bk2, bn)
                    s = sc_ref[0]
                    w = q * jnp.broadcast_to(
                        s[:, None, :], (n_g, 32, bn)).reshape(2 * bk2, bn)
                    acc_ref[...] += jnp.dot(
                        x_ref[...].astype(jnp.bfloat16),
                        w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)

                    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                    def _store():
                        o_ref[0] = acc_ref[...].astype(jnp.bfloat16)

                @jax.jit
                def run(x, qp_p, sc_p):
                    Mx, Kx = x.shape
                    Pp, Kx2, bn_ = qp_p.shape
                    bm = max(8, 1 << (Mx - 1).bit_length())
                    bk_ = Kx if Kx2 * bn_ <= 6 * 1024 * 1024 else Kx // 2
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((Pp, Mx, bn_),
                                                       x.dtype),
                        grid_spec=pl.GridSpec(
                            grid=(1, Pp, Kx // bk_),
                            in_specs=[
                                pl.BlockSpec((bm, bk_),
                                             lambda i, j, k: (i, k)),
                                pl.BlockSpec((1, bk_ // 2, bn_),
                                             lambda i, j, k: (j, k, 0)),
                                pl.BlockSpec((1, bk_ // 32, bn_),
                                             lambda i, j, k: (j, k, 0)),
                            ],
                            out_specs=pl.BlockSpec(
                                (1, bm, bn_), lambda i, j, k: (j, i, 0)),
                            scratch_shapes=[
                                pltpu.VMEM((bm, bn_), jnp.float32)],
                        ),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("parallel", "parallel",
                                                 "arbitrary")),
                        interpret=_use_interpret(),
                    )(x, qp_p, sc_p)
                return run

            bn_p = _pick_block(N, 1024, 128)
            Pn = N // bn_p
            qp_pan = jnp.transpose(qs4.reshape(K // 2, Pn, bn_p), (1, 0, 2))
            sc_pan = jnp.transpose(
                jnp.asarray(sc).reshape(K // 32, Pn, bn_p), (1, 0, 2))
            jax.block_until_ready(qp_pan)
            panf_run = _mk_q4z_panel()

            def q4pf(x, qp_pan, sc_pan, K=K):
                y = panf_run(x, qp_pan, sc_pan)
                y = jnp.transpose(y, (1, 0, 2)).reshape(x.shape[0], -1)
                return carry(x, y, K)
            variants.append(("q4z-panelf", q4pf, (qp_pan, sc_pan), gb4))

        if args.bk_sweep:
            # VMEM-pressure probe: the f32 dequant temporaries scale with
            # block_k (bk x bn x 4 B x ~3 live values) — if big blocks
            # break Mosaic's DMA/compute overlap, small bk wins despite
            # shorter DMA runs
            from qwen2_audio_tpu.ops.quant_matmul import _pick_block
            seen_bk = set()
            for bk in (512, 896, 1792):
                # label with the EFFECTIVE block_k: _pick_block sanitizes
                # to a 256-multiple divisor, so e.g. bk=896 at K=3584
                # actually runs 512 — a mislabeled duplicate otherwise
                eff = _pick_block(K, bk, 256)
                if K % bk or eff in seen_bk:
                    continue
                seen_bk.add(eff)

                def sk(x, qs, sc, K=K, bk=bk):
                    return carry(x, quant_matmul(x, qs, sc, fast=True,
                                                 block_k=bk), K)
                variants.append((f"strided bk={eff}", sk, (qs, sc), gb))

        if args.diag:
            # noscale: the SAME blocked dequant kernel minus the scales
            # operand — isolates what the per-group scale handling
            # (strided f32 DMA + sublane broadcast) costs.
            import functools as _ft

            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            from qwen2_audio_tpu.ops.quant_matmul import (_auto_block_k,
                                                          _pick_block,
                                                          _use_interpret)

            def _ns_kernel(x_ref, qs_ref, o_ref, acc_ref):
                @pl.when(pl.program_id(2) == 0)
                def _init():
                    acc_ref[...] = jnp.zeros_like(acc_ref)
                w = qs_ref[...].astype(jnp.float32) * 0.01
                acc_ref[...] += jnp.dot(
                    x_ref[...].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)

                @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
                def _store():
                    o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

            @_ft.partial(jax.jit, static_argnames=("bn", "bk"))
            def _ns(x, qs, bn=512, bk=0):
                Mx, Kx = x.shape
                Nx = qs.shape[1]
                bm = max(8, 1 << (Mx - 1).bit_length())
                bn_ = _pick_block(Nx, bn, 128)
                bk_ = _pick_block(Kx, bk or _auto_block_k(Kx, bn_), 256)
                return pl.pallas_call(
                    _ns_kernel,
                    out_shape=jax.ShapeDtypeStruct((Mx, Nx), x.dtype),
                    grid_spec=pl.GridSpec(
                        grid=(1, Nx // bn_, Kx // bk_),
                        in_specs=[
                            pl.BlockSpec((bm, bk_), lambda i, j, k: (i, k)),
                            pl.BlockSpec((bk_, bn_), lambda i, j, k: (k, j)),
                        ],
                        out_specs=pl.BlockSpec((bm, bn_),
                                               lambda i, j, k: (i, j)),
                        scratch_shapes=[pltpu.VMEM((bm, bn_), jnp.float32)],
                    ),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("parallel", "parallel",
                                             "arbitrary")),
                    interpret=_use_interpret(),
                )(x, qs)

            def ns(x, qs, K=K):
                return carry(x, _ns(x, qs), K)
            variants.append(("noscale", ns, (qs,), qs.size / 1e9))

            # scales passed as bf16: same strides, half the scale bytes
            sc16 = sc.astype(jnp.bfloat16)

            def sb(x, qs, sc16, K=K):
                return carry(x, quant_matmul(x, qs, sc16, fast=True), K)
            variants.append(("sc-bf16", sb, (qs, sc16), (qs.size + sc.size * 2) / 1e9))

            # XLA dense bf16 reference (2x the weight bytes, XLA pipeline)
            wdense = (qs.astype(jnp.bfloat16) *
                      jnp.repeat(sc, 32, axis=0).astype(jnp.bfloat16))
            jax.block_until_ready(wdense)

            def dn(x, w, K=K):
                return carry(x, x @ w, K)
            variants.append(("dense-bf16", dn, (wdense,), wdense.size * 2 / 1e9))

        panel_widths = () if args.skip_panel else sorted(
            {pick_panel_width(N, 512), pick_panel_width(N, 1024)})
        for bn in panel_widths:
            qp = panelize_weight({"qs": qs, "scales": sc}, block_n=bn)
            jax.block_until_ready(qp["qs_p"])
            for bk_tag, bk in (("auto", 0), ("K", K)):
                def pan(x, qs_p, scales_p, bk=bk, K=K):
                    y = quant_matmul_panel(x, qs_p, scales_p,
                                           fast=True, block_k=bk)
                    return (x + y[:, :K] if y.shape[1] >= K
                            else x + jnp.tile(y, (1, -(-K // y.shape[1]))
                                              )[:, :K])
                variants.append((f"panel bn={bn} bk={bk_tag}", pan,
                                 (qp["qs_p"], qp["scales_p"]), gb))

        for tag, fn, ops, gb_v in variants:
            # re-arm per variant: one deadline spanning all ~40 serial
            # remote compiles of a cold --diag run WILL fire mid-compile
            # (the documented tunnel-wedge scenario); each variant's
            # compile+3 timed reps fits 1800 s comfortably
            cancel = watchdog(1800.0, f"qmm:{name}:{tag}")
            try:
                sec = time_chain(fn, x0, ops, args.chain,
                                 unroll=args.unroll)
            except Exception as e:
                print(f"  {name:8s} {tag:24s} FAILED: {type(e).__name__}: "
                      f"{e}", flush=True)
                continue
            finally:
                cancel()
            print(f"  {name:8s} {tag:24s} {sec*1e6:9.1f} us  "
                  f"{gb_v/sec:7.1f} GB/s", flush=True)
            total.setdefault(tag, {})[name] = sec

    L = LAYERS[args.size]
    per_layer = [n for n in ("qkv", "o", "gate_up", "down")
                 if n in SHAPES[args.size]]
    for tag, times in total.items():
        if len(times) == len(SHAPES[args.size]) and "lm_head" in times:
            per_fwd = (sum(times[n] for n in per_layer) * L
                       + times["lm_head"])
            print(f"TOTAL {tag:24s}: matmul-only forward "
                  f"{per_fwd*1e3:7.2f} ms -> ceiling "
                  f"{1.0/per_fwd:6.1f} fwd/s", flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
