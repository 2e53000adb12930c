#!/usr/bin/env python
"""On-chip legality + byte-order probe for the b32 q4 unpack design.

The stream-ceiling microbench (tools/bench_stream.py, BENCH_NOTES r5)
showed the q4 decode limiter is the PER-BYTE unpack ALU: 8-bit-declared
storage unpacks at ~403 GB/s vs ~970 GB/s DMA, because every byte is
widened to its own i32 lane before mask/shift. The b32 design masks
nibbles in the PACKED i32 domain (4 bytes per lane-op), then uses
Mosaic's sublane-repacking tpu.bitcast (pltpu.bitcast — the XLA
lax.bitcast_convert_type is rejected in-kernel: "Changing bitwidths not
supported") to reinterpret the masked words as int8 sublanes:

    w    : (bk2//4, bn) int32          -- 4 K-rows packed per word
    lo_p = w & 0x0F0F0F0F              -- 4 lo-nibbles per lane-op
    lo_s = ((lo_p | 0x80808080) - 0x08080808) ^ 0x80808080
                                       -- SWAR per-byte (q-8) two's
                                       -- complement; minuend bytes all
                                       -- >= 0x80 so no borrow escapes
    val  = pltpu.bitcast(lo_s, int8)   -- (bk2, bn) SIGNED q-8 sublanes

(vector<i8> subtract does NOT legalize on this Mosaic build — probed:
"failed to legalize operation 'arith.subi'" on vector<8x128x4xi8> —
so the -8 must happen in the packed i32 domain, same hazard class as
the rejected 8-bit shifts.)

This probe answers, standalone-per-kernel (CLAUDE.md: validate each
kernel standalone before composing; run in BACKGROUND, never kill):

  1. does pltpu.bitcast(i32 -> i8) legalize on this Mosaic build?
  2. which source byte lands in which result sublane (the host pack
     order must invert this mapping)?
  3. are vector<i8> subtract and the s8 x s8 -> i32 MXU dot fed by the
     bitcast path exact?

Writes /tmp/qa_probe_b32 (containing the discovered byte mapping) on
full success. Reference for the math being accelerated: ggml's
vec_dot_q4_0_q8_1 nibble unpack
(/root/reference/ggml/src/ggml-cuda/vecdotq.cuh:40-70 __vsubss4 path).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def pack_candidates(p: np.ndarray) -> dict[str, np.ndarray]:
    """All plausible host packings of u8 (R, N) into i32 (R//4, N).

    consec_*: word r4 packs rows 4*r4 .. 4*r4+3 (LSB-first / MSB-first).
    planar_*: word r4 packs rows r4, r4+R//4, r4+2R//4, r4+3R//4.
    """
    R, N = p.shape
    w = p.astype(np.uint32)
    out = {}
    c = p.reshape(R // 4, 4, N).astype(np.uint32)
    out["consec_le"] = (c[:, 0] | (c[:, 1] << 8) | (c[:, 2] << 16)
                        | (c[:, 3] << 24)).astype(np.int32)
    out["consec_be"] = (c[:, 3] | (c[:, 2] << 8) | (c[:, 1] << 16)
                        | (c[:, 0] << 24)).astype(np.int32)
    q = w.reshape(4, R // 4, N)
    out["planar_le"] = (q[0] | (q[1] << 8) | (q[2] << 16)
                        | (q[3] << 24)).astype(np.int32)
    out["planar_be"] = (q[3] | (q[2] << 8) | (q[1] << 16)
                        | (q[0] << 24)).astype(np.int32)
    return out


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() not in ("tpu", "axon")
    print(f"backend={jax.default_backend()} interpret={interpret}",
          flush=True)

    rng = np.random.default_rng(0)
    R, N = 64, 512                       # bk2 x bn, lanes 128-aligned
    payload = rng.integers(0, 256, size=(R, N), dtype=np.uint8)
    cands = pack_candidates(payload)

    # ---- 1+2: bitcast legality + byte mapping ----------------------
    def k_ident(w_ref, o_ref):
        o_ref[...] = pltpu.bitcast(w_ref[...], jnp.int8).astype(jnp.int32)

    mapping = None
    for name, w_host in cands.items():
        out = pl.pallas_call(
            k_ident,
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.int32),
            interpret=interpret,
        )(jnp.asarray(w_host))
        got = np.asarray(out).astype(np.uint8)
        if (got == payload).all():
            mapping = name
            break
    if mapping is None:
        print("probe FAIL: no candidate packing matches tpu.bitcast; "
              "got[0:5,0] =", got[:5, 0], "payload[0:5,0] =",
              payload[:5, 0], flush=True)
        return 1
    print(f"pltpu.bitcast i32->i8 OK, host pack = {mapping}", flush=True)
    w32 = jnp.asarray(cands[mapping])

    # ---- 3a: full b32 unpack (packed mask + SWAR sub + bitcast) ----
    def _sub8(p):
        # per-byte (q-8) in two's complement, entirely in i32 lanes
        return ((p | jnp.int32(-0x7F7F7F80)) - 0x08080808) \
            ^ jnp.int32(-0x7F7F7F80)   # -0x7F7F7F80 == 0x80808080 as i32

    def k_unpack(w_ref, o_ref):
        w = w_ref[...]
        lo = pltpu.bitcast(_sub8(w & 0x0F0F0F0F), jnp.int8)
        hi = pltpu.bitcast(_sub8((w >> 4) & 0x0F0F0F0F), jnp.int8)
        o_ref[...] = jnp.concatenate([lo, hi], axis=0).astype(jnp.int32)

    out2 = np.asarray(pl.pallas_call(
        k_unpack,
        out_shape=jax.ShapeDtypeStruct((2 * R, N), jnp.int32),
        interpret=interpret,
    )(w32))
    ref_lo = (payload & 0xF).astype(np.int32) - 8
    ref_hi = (payload >> 4).astype(np.int32) - 8
    ref2 = np.concatenate([ref_lo, ref_hi], axis=0)
    if not (out2 == ref2).all():
        print("probe FAIL: b32 unpack mismatch", flush=True)
        return 1
    print("b32 unpack (packed mask + bitcast + i8 sub) EXACT", flush=True)

    # ---- 3b: s8 dot fed by the bitcast path ------------------------
    M = 8
    xq = rng.integers(-127, 128, size=(M, R), dtype=np.int8)
    xj = jnp.asarray(xq)

    def k_dot(x_ref, w_ref, o_ref):
        w = w_ref[...]
        lo = pltpu.bitcast(_sub8(w & 0x0F0F0F0F), jnp.int8)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    out3 = np.asarray(pl.pallas_call(
        k_dot,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        interpret=interpret,
    )(xj, w32))
    ref3 = xq.astype(np.int64) @ ref_lo.astype(np.int64)
    if not (out3.astype(np.int64) == ref3).all():
        print("probe FAIL: s8 dot mismatch", flush=True)
        return 1
    print("s8 x s8 -> i32 dot over bitcast nibbles EXACT", flush=True)

    if not interpret:
        Path("/tmp/qa_probe_b32").write_text(mapping)
        print("marker /tmp/qa_probe_b32 written:", mapping, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
