#!/usr/bin/env python
"""HBM stream-ceiling microbench: what does it cost just to MOVE the q4
weight bytes, per storage dtype, at the exact decode panel shapes?

Three kernels per (shape, dtype) cell, each streaming the same bytes:

  dma     touch one row of each block         -> pure HBM->VMEM DMA rate
  widen   sum(block.astype(int32))            -> DMA + VPU widen/reduce
  unpack  nibble mask/shift in i32 + sum      -> DMA + the q4 dequant ALU

dtypes u8 / i8 / i32 / bf16 are VIEWS of the same byte payload, so every
cell moves identical bytes; only the declared element type (and hence the
VPU load/widen path) changes. This is the "minimal-kernel stream-ceiling
measurement" the q4_0 speed-of-light hunt needs: if `dma` rates agree
across dtypes, the HBM stream is dtype-blind and the e2e u8-vs-i8 delta
(112.2 vs 116.9 tok/s, docs/BENCH_NOTES.md r4g) must come from the
in-kernel widen path — reconciling the int80-ablation contradiction
(ablating the unpack ALU changed nothing because the *widen*, not the
mask/shift, is the VPU cost that rides on top of DMA).

Methodology: unrolled-jit dependent chains (CLAUDE.md: per-dispatch
chains measure the tunnel below ~5 ms/op; never wrap pallas in
fori_loop). Run on TPU in the BACKGROUND; never kill mid-op.

    python -u tools/bench_stream.py [--size 7b] [--chain 64] [--unroll 8]

Reference role: ggml's own bench machinery measures, it does not guess
(/root/reference/src/qwen2-whisper.cpp:3690-3959 memcpy + mul_mat GB/s);
this is the TPU-native equivalent aimed at the q4 decode stream.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from tools.bench_qmm_shapes import SHAPES, time_chain  # noqa: E402


def _stream_kernel(c_ref, q_ref, o_ref, *, mode: str):
    """o = c + eps * reduce(q-block). The c operand threads the dependent
    chain through the call; eps keeps the magnitude bounded without letting
    anything fold away (the call is opaque to XLA either way)."""
    import jax
    import jax.numpy as jnp

    # Mosaic rejects unsigned->float casts (lowering.py::_convert_helper
    # falls through to NotImplementedError); integer payloads must widen
    # via int32 first (CLAUDE.md: same rule as the 8-bit shift hazard).
    def _to_f32(v):
        if jnp.issubdtype(v.dtype, jnp.floating):
            return v.astype(jnp.float32)
        return v.astype(jnp.int32).astype(jnp.float32)

    if mode == "dma":
        # consume one sublane: the pipeline DMAs the whole block into
        # VMEM regardless of how much the body reads
        r = jnp.sum(_to_f32(q_ref[0, :128]))
    elif mode == "widen":
        q = q_ref[...]
        if jnp.issubdtype(q.dtype, jnp.floating):
            r = jnp.sum(q.astype(jnp.float32))
        else:
            r = jnp.sum(q.astype(jnp.int32)).astype(jnp.float32)
    elif mode == "unpack":
        w = q_ref[...].astype(jnp.int32)
        lo = (w & 0xF) - 8
        hi = ((w >> 4) & 0xF) - 8
        r = jnp.sum(lo + hi).astype(jnp.float32)
    elif mode in ("dot", "dotb32"):
        # production-shaped consumption: unpack to int8 nibble values and
        # feed s8 x s8 -> i32 MXU dots (the quant_matmul_int8/_q4b body).
        # "dot" = 8-bit-declared storage, per-byte widen then mask/shift
        # (quant_matmul_int8._kernel_stacked packed path); "dotb32" =
        # i32-declared words, packed-domain mask + SWAR sub + bitcast
        # (quant_matmul_q4b). Identical MXU work — the delta is the
        # unpack ALU the q4 speed-of-light hunt is chasing.
        from jax.experimental.pallas import tpu as pltpu
        if mode == "dot":
            p = q_ref[...].astype(jnp.int32)
            lo = ((p & 0xF) - 8).astype(jnp.int8)
            hi = (((p >> 4) & 0xF) - 8).astype(jnp.int8)
        else:
            w = q_ref[...]
            B = -0x7F7F7F80                      # 0x80808080 as i32

            def sw(v):
                return ((v | B) - 0x08080808) ^ B
            lo = pltpu.bitcast(sw(w & 0x0F0F0F0F), jnp.int8)
            hi = pltpu.bitcast(sw((w >> 4) & 0x0F0F0F0F), jnp.int8)
        br2, bn = lo.shape
        ones = jnp.ones((8, br2), jnp.int8)
        dim = (((1,), (0,)), ((), ()))
        d = (jax.lax.dot_general(ones, lo, dim,
                                 preferred_element_type=jnp.int32)
             + jax.lax.dot_general(ones, hi, dim,
                                   preferred_element_type=jnp.int32))
        r = jnp.sum(d[0, :128].astype(jnp.float32))
    else:
        raise ValueError(mode)
    o_ref[...] = c_ref[...] + r * jnp.float32(1e-30)


def make_stream_step(R: int, C: int, dtype, mode: str, interpret: bool):
    """step(c, q) -> c' streaming the full (R, C) array once per call."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    elt = np.dtype(dtype).itemsize
    # panel-shaped blocks: quant-K rows x a column slab, sized so a
    # double-buffered block stays well inside VMEM (<= ~2 MB each).
    # Mosaic requires lane dim % 128 == 0 and sublane dim % 8 == 0 (or
    # the full array dim), so pick the largest 128-multiple divisor of C
    # that fits; if even 128 lanes x full R overflows (deep-K shapes like
    # `down`), split rows too.
    budget = 2 * 1024 * 1024
    br = R
    cands = [b for b in range(128, C + 1, 128)
             if C % b == 0 and R * b * elt <= budget]
    if cands:
        bc = max(cands)
    else:
        bc = min((b for b in range(128, C + 1, 128) if C % b == 0),
                 default=C)
        rcands = [r for r in range(8, R + 1, 8)
                  if R % r == 0 and r * bc * elt <= budget]
        br = max(rcands) if rcands else R
    grid = (R // br, C // bc)

    kernel = functools.partial(_stream_kernel, mode=mode)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((br, bc), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )

    def step(c, q):
        return call(c, q)

    return step


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b", choices=SHAPES)
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--shapes", default="",
                    help="comma list filter (default: all)")
    ap.add_argument("--modes", default="dma,widen,unpack")
    ap.add_argument("--dtypes", default="u8,i8,i32,bf16")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke (no timing value)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    interpret = args.interpret or jax.default_backend() not in ("tpu", "axon")
    if interpret:
        print("NOTE: interpret mode — correctness smoke only", flush=True)

    rng = np.random.default_rng(0)
    want = [s for s in args.shapes.split(",") if s]
    dtypes = {
        "u8": np.uint8, "i8": np.int8, "i32": np.int32, "bf16": None,
    }
    sel_dtypes = [d for d in args.dtypes.split(",") if d]
    modes = [m for m in args.modes.split(",") if m]

    for name, (K, N) in SHAPES[args.size].items():
        if want and name not in want:
            continue
        R = K // 2                       # packed-nibble row count
        payload = rng.integers(0, 256, size=(R, N), dtype=np.uint8)
        gb = payload.nbytes / 1e9
        for dt in sel_dtypes:
            if dt == "bf16":
                host = payload.view(np.uint16)  # bit pattern; bf16 on dev
                arr = jnp.asarray(host).view(jnp.bfloat16)
                C = N // 2
            else:
                host = payload.view(dtypes[dt])
                arr = jnp.asarray(host)
                C = host.shape[1]
            for mode in modes:
                if mode == "unpack" and dt == "bf16":
                    continue            # nibble ops on float lanes: no
                if mode == "dot" and dt not in ("u8", "i8"):
                    continue            # 8-bit-declared consumption only
                if mode == "dotb32" and dt != "i32":
                    continue            # word-packed consumption only
                step = make_stream_step(R, C, host.dtype, mode, interpret)
                x0 = jnp.zeros((8, 128), jnp.float32)
                if interpret:
                    _ = np.asarray(step(x0, arr))
                    print(f"{name:8s} {dt:4s} {mode:6s} OK (interpret)",
                          flush=True)
                    continue
                t = time_chain(lambda c, q: step(c, q), x0, (arr,),
                               args.chain, unroll=args.unroll)
                print(f"{name:8s} {dt:4s} {mode:6s} "
                      f"{t*1e6:9.1f} us  {gb/t:7.1f} GB/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
