#!/usr/bin/env python
"""On-chip validation for the bf16-exponent one-shot attention variant
(QA_FA_PEXP16 — VERDICT r4 #8's lever at the ~140 us/layer VPU exp
tail). Standalone so it can chain in a fresh-host queue.

Writes /tmp/qa_kernel_ok_fa_pexp16 when the lowering compiles and the
output tracks (a) the production f32-exponent kernel and (b) an f64
numpy oracle within the bf16-probability class (<= ~2^-8 relative per
weight pre-normalization).

Run in the BACKGROUND and never kill it (CLAUDE.md tunnel-wedge hazard).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def oracle(q, k, v, scale):
    s = (q.astype(np.float64) @ k.astype(np.float64).swapaxes(-1, -2)
         ) * scale
    s -= s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    return p @ v.astype(np.float64)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from qwen2_audio_tpu.ops.flash_attention import flash_attention

    print(f"[validate] backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(17)
    B, H, T, d = 1, 4, 512, 64
    q = rng.standard_normal((B, H, T, d)).astype(np.float32)
    k = rng.standard_normal((B, H, T, d)).astype(np.float32)
    v = rng.standard_normal((B, H, T, d)).astype(np.float32)
    scale = d ** -0.5

    want64 = oracle(q, k, v, scale)
    kw = dict(sm_scale=scale, single=True, block_k=512)
    base = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kw))
    got = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), pexp16=True, **kw))

    def rel(a, b):
        return np.abs(a - b.astype(np.float32)).max() / \
            (np.abs(b).max() + 1e-9)

    e_base = rel(base, want64)
    e_p16 = rel(got, want64)
    e_pair = rel(got, base.astype(np.float64))
    print(f"[validate] fa_pexp16 vs f64 oracle: base {e_base:.2e} "
          f"pexp16 {e_p16:.2e} pairwise {e_pair:.2e}", flush=True)
    assert e_p16 < 1.5e-2, e_p16        # bf16-probability class
    assert e_pair < 1.5e-2, e_pair

    if jax.default_backend() in ("tpu", "axon"):
        Path("/tmp/qa_kernel_ok_fa_pexp16").write_text(str(time.time()))
        print("[validate] fa_pexp16: OK (marker written)", flush=True)
    else:
        print("[validate] fa_pexp16: OK (cpu smoke — marker NOT written)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
