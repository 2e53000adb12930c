#!/usr/bin/env python
"""On-chip validation for the two queued q4 e2e levers, standalone so it
can chain after tools/validate_tpu_kernels.py in a fresh-host queue:

  - qmm_q4i8:    int8-stored packed-nibble stream (QA_Q4_I8=1 — same bits
    as uint8; unpack4_f32 masks after the shift).  Validates strided,
    panel, layer-stacked, panel-stacked and fused-MLP-sym lowerings of
    the i8 dtype before any e2e --panel run may stream it.
  - qmm_panelbn: QA_PANEL_BN=2048 wide panels (whole-K packed blocks at
    the 7B qkv/o/lm_head widths) through the panel + panel-stacked
    kernels.

Run in the BACKGROUND and never kill it (CLAUDE.md tunnel-wedge hazard).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def mark(name: str) -> None:
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"[validate] {name}: OK (cpu smoke — marker NOT written)",
              flush=True)
        return
    Path(f"/tmp/qa_kernel_ok_{name}").write_text(str(time.time()))
    print(f"[validate] {name}: OK", flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.ops.quant_matmul import (panelize_weight,
                                                  quant_linear,
                                                  quant_linear_panel,
                                                  quant_linear_stacked)
    from qwen2_audio_tpu.quant.qparams import (Q4Form,
                                               quantize_array_for_device)

    print(f"[validate] backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(3)
    M, K, N = 8, 512, 1024
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32) * 0.1
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05

    # every payload form is PINNED explicitly (Q4Form) — ambient defaults
    # here would depend on which markers armed earlier in the chained run
    # (the r4e mid-run drift hazard).  Reference payload: mins-carrying
    # u8 packed form (the longest-validated lowering).
    qw_u8 = quantize_array_for_device(
        w, GGMLType.Q4_0, form=Q4Form(sym=False, i8=False, scale="f32"))
    qw_sy = quantize_array_for_device(
        w, GGMLType.Q4_0, form=Q4Form(sym=True, i8=False, scale="f32"))
    qw_i8 = quantize_array_for_device(
        w, GGMLType.Q4_0, form=Q4Form(sym=True, i8=True, scale="f32"))
    qw_mi = quantize_array_for_device(          # mins + i8 (q4_1 combo)
        w, GGMLType.Q4_0, form=Q4Form(sym=False, i8=True, scale="f32"))
    assert qw_i8["qs4"].dtype == np.int8 and "mins" not in qw_i8
    assert np.array_equal(np.asarray(qw_i8["qs4"]).view(np.uint8),
                          np.asarray(qw_sy["qs4"])), "i8 must be same bits"
    assert qw_mi["qs4"].dtype == np.int8 and "mins" in qw_mi

    want = np.asarray(quant_linear(x, qw_u8))             # validated form

    # 1. strided i8 (+ the mins-carrying i8 combo q4_1/q4_K would use)
    got = np.asarray(quant_linear(x, qw_i8))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()
    got = np.asarray(quant_linear(x, qw_mi))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()
    # 2. panel i8
    got = np.asarray(quant_linear_panel(x, panelize_weight(qw_i8)))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()
    # 3. layer-stacked + panel-stacked i8 (the decode hot path)
    st = {k: jnp.asarray(v)[None] for k, v in qw_i8.items()}
    got = np.asarray(quant_linear_stacked(x, st, jnp.asarray(0, jnp.int32)))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()
    stp = {k: jnp.asarray(v)[None]
           for k, v in panelize_weight(qw_i8).items()}
    got = np.asarray(quant_linear_stacked(x, stp, jnp.asarray(0, jnp.int32)))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()
    # 4. fused-MLP sym with i8 streams
    from qwen2_audio_tpu.ops.fused_mlp import fused_mlp4_sym_stacked
    Kf, If = 512, 256
    wg = rng.standard_normal((Kf, If)).astype(np.float32) * 0.05
    wu = rng.standard_normal((Kf, If)).astype(np.float32) * 0.05
    wd = rng.standard_normal((If, Kf)).astype(np.float32) * 0.05
    f_sy = Q4Form(sym=True, i8=False, scale="f32")
    f_i8 = Q4Form(sym=True, i8=True, scale="f32")
    qg0, qu0, qd0 = (quantize_array_for_device(a, GGMLType.Q4_0, form=f_sy)
                     for a in (wg, wu, wd))
    qg, qu, qd = (quantize_array_for_device(a, GGMLType.Q4_0, form=f_i8)
                  for a in (wg, wu, wd))
    xf = x[:, :Kf]
    want_f = np.asarray(fused_mlp4_sym_stacked(
        xf, jnp.concatenate([qg0["qs4"], qu0["qs4"]], axis=1)[None],
        jnp.concatenate([qg0["scales"], qu0["scales"]], axis=1)[None],
        qd0["qs4"][None], qd0["scales"][None], jnp.asarray(0, jnp.int32)))
    got = np.asarray(fused_mlp4_sym_stacked(
        xf, jnp.concatenate([qg["qs4"], qu["qs4"]], axis=1)[None],
        jnp.concatenate([qg["scales"], qu["scales"]], axis=1)[None],
        qd["qs4"][None], qd["scales"][None], jnp.asarray(0, jnp.int32)))
    assert np.abs(got - want_f).max() < 1e-4, np.abs(got - want_f).max()
    mark("qmm_q4i8")

    # 5. wide panels (QA_PANEL_BN=2048): panel + panel-stacked at a shape
    # where bn really is 2048 (N multiple of 2048), sym payload
    N2 = 2048
    w2 = rng.standard_normal((K, N2)).astype(np.float32) * 0.05
    qw2 = quantize_array_for_device(w2, GGMLType.Q4_0, form=f_sy)
    want2 = np.asarray(quant_linear(x, qw2))
    p2 = panelize_weight(qw2, block_n=2048)
    assert p2["qs4_p"].shape[0] == 1 and p2["qs4_p"].shape[2] == 2048
    got = np.asarray(quant_linear_panel(x, p2))
    assert np.abs(got - want2).max() < 1e-4, np.abs(got - want2).max()
    stp2 = {k: jnp.asarray(v)[None] for k, v in p2.items()}
    got = np.asarray(quant_linear_stacked(x, stp2,
                                          jnp.asarray(0, jnp.int32)))
    assert np.abs(got - want2).max() < 1e-4, np.abs(got - want2).max()
    mark("qmm_panelbn")
    print("[validate] q4i8/panelbn: ALL OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
