#!/usr/bin/env python
"""On-chip validation for the bf16-domain dequant modes: packed-q4
(QA_Q4_DQ16, marker qmm_dq16) and int8-valued q8/k-quant (QA_Q8_DQ16,
marker qmm_dq16_q8) — strided, panel, stacked, and panel-stacked kernels
with the dequant multiply/broadcast at bf16 lane width.

Standalone so it can chain in a fresh-host queue (CLAUDE.md playbook).
Run in the BACKGROUND and never kill it (tunnel-wedge hazard).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.ops.quant_matmul import (panelize_weight,
                                                  quant_linear4,
                                                  quant_linear_panel,
                                                  quant_linear_stacked)
    from qwen2_audio_tpu.quant.qparams import (Q4Form,
                                               quantize_array_for_device)

    print(f"[validate] backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(23)
    M, K, N = 8, 512, 1024
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32) * 0.1
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qw = quantize_array_for_device(
        w, GGMLType.Q4_0, form=Q4Form(sym=True, i8=True, scale="f32"))

    old = os.environ.get("QA_Q4_DQ16")
    try:
        os.environ["QA_Q4_DQ16"] = "0"
        base = np.asarray(quant_linear4(x, qw, fast=True))
        os.environ["QA_Q4_DQ16"] = "1"
        pairs = [("strided", quant_linear4(x, qw, fast=True))]
        pairs.append(("panel", quant_linear_panel(
            x, panelize_weight(qw), fast=True)))
        st = {k: jnp.asarray(v)[None] for k, v in qw.items()}
        pairs.append(("stacked", quant_linear_stacked(
            x, st, jnp.asarray(0, jnp.int32), fast=True)))
        stp = {k: jnp.asarray(v)[None]
               for k, v in panelize_weight(qw).items()}
        pairs.append(("panel-stacked", quant_linear_stacked(
            x, stp, jnp.asarray(0, jnp.int32), fast=True)))
        for name, got in pairs:
            got = np.asarray(got)
            err = np.abs(got - base).max() / (np.abs(base).max() + 1e-9)
            assert err < 2e-2, (name, err)
            print(f"[validate] dq16 {name}: rel-err {err:.2e}", flush=True)
    finally:
        if old is None:
            os.environ.pop("QA_Q4_DQ16", None)
        else:
            os.environ["QA_Q4_DQ16"] = old

    if jax.default_backend() in ("tpu", "axon"):
        Path("/tmp/qa_kernel_ok_qmm_dq16").write_text(str(time.time()))
        print("[validate] qmm_dq16: OK (marker written)", flush=True)
    else:
        print("[validate] qmm_dq16: OK (cpu smoke — marker NOT written)",
              flush=True)

    # q8 family (int8-valued kernels) — same lever, own gate/marker
    from qwen2_audio_tpu.ops.quant_matmul import quant_linear
    qw8 = quantize_array_for_device(w, GGMLType.Q8_0)
    old8 = os.environ.get("QA_Q8_DQ16")
    try:
        os.environ["QA_Q8_DQ16"] = "0"
        base8 = np.asarray(quant_linear(x, qw8, fast=True))
        os.environ["QA_Q8_DQ16"] = "1"
        pairs = [("strided", quant_linear(x, qw8, fast=True))]
        pairs.append(("panel", quant_linear_panel(
            x, panelize_weight(qw8), fast=True)))
        st8 = {k: jnp.asarray(v)[None] for k, v in qw8.items()}
        pairs.append(("stacked", quant_linear_stacked(
            x, st8, jnp.asarray(0, jnp.int32), fast=True)))
        stp8 = {k: jnp.asarray(v)[None]
                for k, v in panelize_weight(qw8).items()}
        pairs.append(("panel-stacked", quant_linear_stacked(
            x, stp8, jnp.asarray(0, jnp.int32), fast=True)))
        for name, got in pairs:
            got = np.asarray(got)
            err = np.abs(got - base8).max() / (np.abs(base8).max() + 1e-9)
            assert err < 2e-2, (name, err)
            print(f"[validate] dq16-q8 {name}: rel-err {err:.2e}",
                  flush=True)
    finally:
        if old8 is None:
            os.environ.pop("QA_Q8_DQ16", None)
        else:
            os.environ["QA_Q8_DQ16"] = old8

    if jax.default_backend() in ("tpu", "axon"):
        Path("/tmp/qa_kernel_ok_qmm_dq16_q8").write_text(str(time.time()))
        print("[validate] qmm_dq16_q8: OK (marker written)", flush=True)
    else:
        print("[validate] qmm_dq16_q8: OK (cpu smoke — marker NOT "
              "written)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
