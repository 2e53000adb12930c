#!/usr/bin/env python
"""Derive the word-packed (b32) 7B bench param cache from the existing
sym cache — a host-side repack (seconds), NOT a fresh 60-min build.

The b32 form is byte-identical data in a different declaration: qs4
(K/2, N) u8/i8 -> qs4b (K/8, N) i32 via ops/quant_matmul_q4b.pack_b32
(consec_le word order). Scales and every dense leaf copy through. The
CLAUDE.md rule for derived variants ("dtype VIEWS of the sym cache —
never re-run the full build") extends to this one repack.

    python tools/derive_b32_cache.py [--size 7b] [--src PATH] [--dst PATH]

Default src:  <param_cache>/bench-<size>-q4_0-q4i8-sym.npz (falls back
              to -sym.npz — same bits, u8-declared)
Default dst:  <param_cache>/bench-<size>-q4_0-q4i8-sym-b32.npz (the name
              tools/bench_decode.py computes under QA_Q4_B32=1 on a host
              with the qmm_q4i8 + qmm_q4sym markers armed)
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from qwen2_audio_tpu.ops.quant_matmul_q4b import pack_b32  # noqa: E402

_SEP = "\x1f"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b")
    ap.add_argument("--src", default="")
    ap.add_argument("--dst", default="")
    args = ap.parse_args()

    from qwen2_audio_tpu.utils.cache import param_cache_dir
    d = param_cache_dir()
    src = args.src
    if not src:
        for cand in (f"bench-{args.size}-q4_0-q4i8-sym.npz",
                     f"bench-{args.size}-q4_0-sym.npz"):
            p = os.path.join(d, cand)
            if os.path.exists(p):
                src = p
                break
    if not src or not os.path.exists(src):
        print(f"no sym source cache found in {d}", file=sys.stderr)
        return 1
    dst = args.dst or os.path.join(
        d, f"bench-{args.size}-q4_0-q4i8-sym-b32.npz")

    t0 = time.time()
    z = np.load(src, mmap_mode="r")
    out: dict[str, np.ndarray] = {}
    n_pack = 0
    for key in z.files:
        a = z[key]
        parts = key.split(_SEP)
        if parts[-1] == "qs4":
            out[_SEP.join(parts[:-1] + ["qs4b"])] = pack_b32(a)
            n_pack += 1
        elif parts[-1] == "mins":
            raise SystemExit(f"{src} carries a mins leaf at {key!r} — "
                             "not a sym cache; refusing to derive b32")
        else:
            out[key] = np.ascontiguousarray(a)
    tmp = dst + ".tmp.npz"
    np.savez(tmp, **out)
    os.replace(tmp, dst)
    print(f"derived {dst} from {src}: {n_pack} qs4 leaves repacked "
          f"in {time.time()-t0:.1f}s "
          f"({os.path.getsize(dst)/1e9:.2f} GB)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
