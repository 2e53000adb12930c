#!/usr/bin/env python
"""Validate each Pallas kernel on the real TPU, one at a time, writing a
/tmp/qa_kernel_ok_<name> marker after each success.

Run in the BACKGROUND and never kill it: a timeout-kill mid-compile wedges
the axon tunnel for hours. bench.py and the runtime read the markers to
decide which kernels are safe to compose on this host.

Order: standalone kernels first, then compositions.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


@contextlib.contextmanager
def pinned_env(**pins: str):
    """Pin env vars for a block, RESTORING prior values on exit — an
    unconditional pop would silently unset an operator-exported variable
    for every later block in the same run (the mid-run form-drift hazard,
    ADVICE r4). Payload forms should prefer explicit Q4Form arguments;
    this is for the flags Q4Form cannot express (q8_0 scale storage)."""
    old = {k: os.environ.get(k) for k in pins}
    os.environ.update(pins)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def mark(name: str) -> None:
    """Arm a fast-path marker — ONLY when running on real hardware. A
    JAX_PLATFORMS=cpu run (interpret-mode smoke) must not write markers:
    they mean 'validated on this host's chip', and consumers (bench.py,
    ops/linear.py, decoding.py) arm composed Pallas paths on them."""
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"[validate] {name}: OK (cpu smoke — marker NOT written)",
              flush=True)
        return
    Path(f"/tmp/qa_kernel_ok_{name}").write_text(str(time.time()))
    print(f"[validate] {name}: OK", flush=True)


def validate_fused_mlp4(rng: np.random.Generator) -> None:
    """Packed-nibble fused MLP in BOTH q4 forms — the fused_mlp4 marker
    gates ops/linear.py::fused_mlp_at's packed dispatch for mins-carrying
    AND sym payloads, so both lowerings must prove out before it arms.
    (Form pinned per iteration: the old block quantized with the default
    env and KeyError'd on "mins" once qmm_q4sym armed earlier in the same
    fresh-host run.)"""
    import os

    import jax as _jx
    import jax.numpy as _jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.ops.fused_mlp import (fused_mlp4_stacked,
                                               fused_mlp4_sym_stacked)
    from qwen2_audio_tpu.ops.quant_matmul import quant_linear_stacked
    from qwen2_audio_tpu.quant.qparams import (Q4Form,
                                               quantize_array_for_device)
    Km, Im = 512, 1024
    for sym in (False, True):
        form = Q4Form(packed=True, sym=sym, i8=False, scale="f32")
        gu_l = [quantize_array_for_device(
            rng.standard_normal((Km, 2 * Im)).astype(np.float32) * 0.1,
            GGMLType.Q4_0, form=form) for _ in range(2)]
        dn_l = [quantize_array_for_device(
            rng.standard_normal((Im, Km)).astype(np.float32) * 0.1,
            GGMLType.Q4_0, form=form) for _ in range(2)]
        gu_s = {k: _jnp.stack([d[k] for d in gu_l]) for k in gu_l[0]}
        dn_s = {k: _jnp.stack([d[k] for d in dn_l]) for k in dn_l[0]}
        assert "qs4" in gu_s, "pack4 path disabled; nothing to validate"
        assert ("mins" in gu_s) == (not sym)
        xm = _jnp.asarray(rng.standard_normal((8, Km)), _jnp.float32)
        for lif in (0, 1):
            lij = _jnp.asarray(lif, _jnp.int32)
            if sym:
                got = np.asarray(fused_mlp4_sym_stacked(
                    xm, gu_s["qs4"], gu_s["scales"],
                    dn_s["qs4"], dn_s["scales"], lij, fast=True))
            else:
                got = np.asarray(fused_mlp4_stacked(
                    xm, gu_s["qs4"], gu_s["scales"], gu_s["mins"],
                    dn_s["qs4"], dn_s["scales"], dn_s["mins"], lij,
                    fast=True))
            gu_out = quant_linear_stacked(xm, gu_s, lij, fast=True)
            gated = _jx.nn.silu(gu_out[:, :Im]) * gu_out[:, Im:]
            want = np.asarray(quant_linear_stacked(gated, dn_s, lij,
                                                   fast=True))
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert np.isfinite(got).all() and rel < 0.03, (sym, lif, rel)


def validate_fused_mlp_split(rng: np.random.Generator) -> None:
    """SPLIT-schema fused MLP over every quant form it dispatches on.

    The q4 form is pinned per iteration: once qmm_q4sym is armed, default
    quantization goes symmetric (NO mins leaf) — the r4e fresh-host run
    caught the old hardcoded ("qs4","scales","mins") order KeyError-ing
    there, silently leaving the TP/canonical schema on the three-launch
    MLP. Both forms stay covered (mins still carries q4_1/q5_1)."""
    import os

    import jax as _jx
    import jax.numpy as _jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_split_stacked
    from qwen2_audio_tpu.ops.quant_matmul import quant_linear_stacked
    from qwen2_audio_tpu.quant.qparams import (Q4Form,
                                               quantize_array_for_device)
    Km, Im = 512, 1024
    for ttype, packed, sym, i8 in ((GGMLType.Q8_0, False, None, False),
                                   (GGMLType.Q4_0, True, False, False),
                                   (GGMLType.Q4_0, True, True, False),
                                   (GGMLType.Q4_0, True, True, True)):
        form = (None if sym is None else
                Q4Form(packed=True, sym=sym, i8=i8, scale="f32"))
        parts = ([quantize_array_for_device(
            rng.standard_normal(shp).astype(np.float32) * 0.1,
            ttype, form=form) for _ in range(2)]
            for shp in ((Km, Im), (Km, Im), (Im, Km)))
        gs, us, ds = parts
        order = tuple(k for k in ("qs", "qs4", "scales", "mins")
                      if k in gs[0])
        g_l, u_l, d_l = ({k: _jnp.stack([d[k] for d in two])
                          for k in order} for two in (gs, us, ds))
        xm = _jnp.asarray(rng.standard_normal((8, Km)), _jnp.float32)
        for lif in (0, 1):
            lij = _jnp.asarray(lif, _jnp.int32)
            got = np.asarray(fused_mlp_split_stacked(
                xm, tuple(g_l[k] for k in order),
                tuple(u_l[k] for k in order),
                tuple(d_l[k] for k in order), lij, packed=packed,
                fast=True))
            gated = _jx.nn.silu(quant_linear_stacked(xm, g_l, lij,
                                                     fast=True)) \
                * quant_linear_stacked(xm, u_l, lij, fast=True)
            want = np.asarray(quant_linear_stacked(gated, d_l, lij,
                                                   fast=True))
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert np.isfinite(got).all() and rel < 0.03, \
                (ttype, sym, lif, rel)


def main() -> int:
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    print(f"[validate] backend={jax.default_backend()}", flush=True)

    # 0. sanity
    assert float(np.asarray(jnp.ones((8, 8)).sum())) == 64.0
    mark("tpu")

    # 1. flash attention, standalone (non-causal + causal GQA)
    from qwen2_audio_tpu.ops.flash_attention import flash_attention
    q = jnp.asarray(rng.standard_normal((1, 4, 512, 64)), jnp.float32)
    o = np.asarray(flash_attention(q, q, q, sm_scale=0.125))
    assert np.isfinite(o).all()
    q2 = jnp.asarray(rng.standard_normal((1, 8, 256, 128)), jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((1, 2, 256, 128)), jnp.bfloat16)
    o2 = np.asarray(flash_attention(q2, k2, k2, sm_scale=0.09, causal=True))
    assert np.isfinite(o2.astype(np.float32)).all()
    mark("fa")

    # 1b. one-shot single-KV-block variant at the exact encoder shape,
    # checked against the online kernel (soft-fail: keep later markers)
    try:
        qs = jnp.asarray(rng.standard_normal((1, 20, 1500, 64)) * 0.3,
                         jnp.bfloat16)
        kw = dict(sm_scale=0.125, block_q=128, block_k=1536)
        a1 = np.asarray(flash_attention(qs, qs, qs, single=True, **kw)
                        ).astype(np.float32)
        a0 = np.asarray(flash_attention(qs, qs, qs, single=False, **kw)
                        ).astype(np.float32)
        assert np.isfinite(a1).all()
        assert np.abs(a1 - a0).max() < 1e-2, np.abs(a1 - a0).max()
        mark("fa_single")
    except Exception as e:      # noqa: BLE001
        print(f"[validate] fa_single REJECTED on this host: {e!r} — "
              "marker not written, online-softmax kernel remains the "
              "default", flush=True)

    # 1b2. lite one-shot variant (scale in Q, mask bias + softmax
    # denominator on the pad lanes) at the exact encoder shape, checked
    # against the online kernel (soft-fail: keep later markers).
    # CORRECTNESS-ONLY: production no longer reads the fa_lite marker —
    # the variant measured a 42% e2e loss (docs/BENCH_NOTES.md) and is
    # the QA_FA_LITE=1 escape hatch; this stage keeps that hatch proven.
    try:
        qs = jnp.asarray(rng.standard_normal((1, 20, 1500, 64)) * 0.3,
                         jnp.bfloat16)
        kw = dict(sm_scale=0.125, block_q=128, block_k=1536)
        a1 = np.asarray(flash_attention(qs, qs, qs, single=True, lite=True,
                                        **kw)).astype(np.float32)
        a0 = np.asarray(flash_attention(qs, qs, qs, single=False, **kw)
                        ).astype(np.float32)
        assert np.isfinite(a1).all()
        assert np.abs(a1 - a0).max() < 1e-2, np.abs(a1 - a0).max()
        mark("fa_lite")
    except Exception as e:      # noqa: BLE001
        print(f"[validate] fa_lite REJECTED on this host: {e!r} — "
              "marker not written, the plain one-shot kernel remains the "
              "default", flush=True)

    # 1b3. exp2-domain softmax (LOG2E folded into sm_scale, kernels
    # exponentiate with exp2) at the exact encoder shape, checked against
    # the base-e one-shot kernel (soft-fail: keep later markers).
    try:
        from qwen2_audio_tpu.ops.flash_attention import _LOG2E
        qs = jnp.asarray(rng.standard_normal((1, 20, 1500, 64)) * 0.3,
                         jnp.bfloat16)
        kw = dict(block_q=128, block_k=1536, single=True)
        a1 = np.asarray(flash_attention(qs, qs, qs, sm_scale=0.125 * _LOG2E,
                                        exp2=True, **kw)).astype(np.float32)
        a0 = np.asarray(flash_attention(qs, qs, qs, sm_scale=0.125, **kw)
                        ).astype(np.float32)
        assert np.isfinite(a1).all()
        assert np.abs(a1 - a0).max() < 1e-2, np.abs(a1 - a0).max()
        mark("fa_exp2")
    except Exception as e:      # noqa: BLE001
        print(f"[validate] fa_exp2 REJECTED on this host: {e!r} — "
              "marker not written, base-e exp remains the default",
              flush=True)

    # 1c. unpadded one-shot variant (d=64 lane blocks, OOB q tail):
    # checked against the padded online kernel at the exact encoder shape
    # (soft-fail: keep later markers)
    try:
        from qwen2_audio_tpu.ops.fa_variants import \
            flash_attention_nopad as _flash_attention_nopad
        qs = jnp.asarray(rng.standard_normal((1, 20, 1500, 64)) * 0.3,
                         jnp.bfloat16)
        a1 = np.asarray(_flash_attention_nopad(qs, qs, qs, sm_scale=0.125,
                                               block_q=128)
                        ).astype(np.float32)
        a0 = np.asarray(flash_attention(qs, qs, qs, sm_scale=0.125,
                                        block_q=128, block_k=1536,
                                        single=False)).astype(np.float32)
        assert a1.shape == (1, 20, 1500, 64), a1.shape
        assert np.isfinite(a1).all()
        assert np.abs(a1 - a0).max() < 1e-2, np.abs(a1 - a0).max()
        mark("fa_nopad")
    except Exception as e:      # noqa: BLE001
        print(f"[validate] fa_nopad REJECTED on this host: {e!r} — "
              "marker not written, the padded one-shot kernel remains "
              "the default", flush=True)

    # 2. quant matmul, standalone (q8_0 int8, then q4_0 int4)
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.ops.quant_matmul import dequantize_weight, quant_matmul
    from qwen2_audio_tpu.quant.qparams import quantize_array_for_device
    w = rng.standard_normal((512, 512)).astype(np.float32) * 0.05
    qw = quantize_array_for_device(w, GGMLType.Q8_0)
    x = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    got = np.asarray(quant_matmul(x, qw["qs"], qw["scales"]))
    # oracle in numpy f64: an on-device `x @ deq` reference would itself run
    # at bf16 matmul precision and miss a tight threshold
    want = np.asarray(x, np.float64) @ np.asarray(dequantize_weight(qw),
                                                  np.float64)
    assert np.abs(got - want).max() < 2e-3, np.abs(got - want).max()
    mark("qmm_q8")

    from qwen2_audio_tpu.quant.qparams import Q4Form
    # explicit forms everywhere below: ambient defaults flip as markers
    # arm mid-run (pack4 / sym / i8), so a default-env build here would
    # validate a DIFFERENT payload on a re-run than on a fresh host
    qw4 = quantize_array_for_device(w, GGMLType.Q4_0,
                                    form=Q4Form(packed=False))
    got = np.asarray(quant_matmul(x, qw4["qs"], qw4["scales"]))
    want = np.asarray(x, np.float64) @ np.asarray(dequantize_weight(qw4),
                                                  np.float64)
    assert np.abs(got - want).max() < 2e-3
    mark("qmm_q4")

    # 2a. packed-nibble (true 4-bit storage) matmul, standalone: must be
    # bit-identical to the int8-form weights of the same payload
    from qwen2_audio_tpu.ops.quant_matmul import quant_linear4
    _mins_form = Q4Form(packed=True, sym=False, i8=False, scale="f32")
    qw4p = quantize_array_for_device(w, GGMLType.Q4_0, form=_mins_form)
    assert "qs4" in qw4p
    got = np.asarray(quant_linear4(x, qw4p))
    want = np.asarray(x, np.float64) @ np.asarray(dequantize_weight(qw4p),
                                                  np.float64)
    assert np.abs(got - want).max() < 2e-3, np.abs(got - want).max()
    mark("qmm_q4p")

    # 2b. exact-integer group matmul (ggml-mmq analog), standalone:
    # oracle = the SAME integer math in numpy (weight dots exact, q8_1
    # activation rounding) — must match almost bit-for-bit
    from qwen2_audio_tpu.ops.quant_matmul_int8 import (
        quant_matmul_int8, quantize_activations)
    for qw_i, name in ((qw, "q8"), (qw4, "q4")):
        got = np.asarray(quant_matmul_int8(x, qw_i["qs"].astype(jnp.int8),
                                           qw_i["scales"]))
        xq, sx = map(np.asarray, quantize_activations(x))
        qsn = np.asarray(qw_i["qs"]).astype(np.int32)
        scn = np.asarray(qw_i["scales"])
        if scn.dtype == np.uint16:   # qparams u16 storage: raw f16 bits
            scn = scn.view(np.float16).astype(np.float64)
        M, K = xq.shape
        N = qsn.shape[1]
        G = K // 32
        p = np.einsum("mgk,gkn->mgn", xq.reshape(M, G, 32).astype(np.int32),
                      qsn.reshape(G, 32, N))
        want = np.einsum("mgn,mg,gn->mn", p.astype(np.float64), sx, scn)
        err = np.abs(got - want).max()
        assert err < 1e-2, (name, err)
    mark("qmm_int8")

    # 2c. contiguous-panel matmul (decode HBM streaming layout): must be
    # numerically identical to the strided kernel on the same payload
    from qwen2_audio_tpu.ops.quant_matmul import (panelize_weight,
                                                  quant_linear,
                                                  quant_linear_panel)
    qp = panelize_weight(qw)
    got = np.asarray(quant_linear_panel(x, qp))
    want_p = np.asarray(quant_linear(x, qw))
    assert np.abs(got - want_p).max() < 1e-4, np.abs(got - want_p).max()
    mark("qmm_panel")

    # 2c-bis. packed-nibble panels (q4z-panelf, the chain-512 HBM-stream
    # winner): panel4 kernel must match the strided packed kernel on the
    # same qs4 payload — identical unpack + f32 dequant math, new layout
    # and BlockSpecs only. Validates BOTH the per-weight and the
    # layer-stacked scalar-prefetch bodies before any e2e --panel run.
    qw4pp = quantize_array_for_device(w, GGMLType.Q4_0, form=_mins_form)
    assert "qs4" in qw4pp
    qp4 = panelize_weight(qw4pp)
    assert "qs4_p" in qp4
    got = np.asarray(quant_linear_panel(x, qp4))
    want_p4 = np.asarray(quant_linear(x, qw4pp))
    assert np.abs(got - want_p4).max() < 1e-4, np.abs(got - want_p4).max()
    mark("qmm_q4panel")

    # 2c-ter. SYMMETRIC q4_0 (QA_Q4_SYM: no mins leaf, (q-8)*d in-kernel
    # — unpack4_f32(off=8)): every packed lowering that changes must
    # match the mins-carrying form of the same payload on this hardware:
    # strided, panel, layer-stacked, panel-stacked, fused-MLP sym, and
    # the integer-exact off=8 int8-mode kernel.
    _sym_form = Q4Form(packed=True, sym=True, i8=False, scale="f32")
    qw4sy = quantize_array_for_device(w, GGMLType.Q4_0, form=_sym_form)
    assert "mins" not in qw4sy
    want_sy = np.asarray(quant_linear(x, qw4pp))          # mins form
    got = np.asarray(quant_linear(x, qw4sy))              # strided sym
    assert np.abs(got - want_sy).max() < 1e-4, np.abs(got - want_sy).max()
    got = np.asarray(quant_linear_panel(x, panelize_weight(qw4sy)))
    assert np.abs(got - want_sy).max() < 1e-4, np.abs(got - want_sy).max()
    from qwen2_audio_tpu.ops.quant_matmul import quant_linear_stacked \
        as _qls
    import jax.numpy as _jnp
    st_sy = {k: _jnp.asarray(v)[None] for k, v in qw4sy.items()}
    got = np.asarray(_qls(x, st_sy, _jnp.asarray(0, _jnp.int32)))
    assert np.abs(got - want_sy).max() < 1e-4, np.abs(got - want_sy).max()
    stp_sy = {k: _jnp.asarray(v)[None]
              for k, v in panelize_weight(qw4sy).items()}
    got = np.asarray(_qls(x, stp_sy, _jnp.asarray(0, _jnp.int32)))
    assert np.abs(got - want_sy).max() < 1e-4, np.abs(got - want_sy).max()
    from qwen2_audio_tpu.ops.quant_matmul_int8 import (
        quant_linear_int8_stacked as _qlis)
    got = np.asarray(_qlis(x, st_sy, _jnp.asarray(0, _jnp.int32)))
    want_i8 = np.asarray(x, np.float64) @ np.asarray(
        dequantize_weight(qw4pp), np.float64)
    assert np.abs(got - want_i8).max() < 2e-1, np.abs(got - want_i8).max()
    # fused-MLP sym (one-launch SwiGLU, no mins operands)
    from qwen2_audio_tpu.ops.fused_mlp import fused_mlp4_sym_stacked
    Kf, If = 512, 256
    wg = rng.standard_normal((Kf, If)).astype(np.float32) * 0.05
    wu = rng.standard_normal((Kf, If)).astype(np.float32) * 0.05
    wd = rng.standard_normal((If, Kf)).astype(np.float32) * 0.05
    qg, qu, qd = (quantize_array_for_device(a, GGMLType.Q4_0,
                                            form=_sym_form)
                  for a in (wg, wu, wd))
    gu_qp = _jnp.concatenate([qg["qs4"], qu["qs4"]], axis=1)[None]
    gu_sc = _jnp.concatenate([qg["scales"], qu["scales"]], axis=1)[None]
    xf = x[:, :Kf]
    got = np.asarray(fused_mlp4_sym_stacked(
        xf, gu_qp, gu_sc, qd["qs4"][None], qd["scales"][None],
        _jnp.asarray(0, _jnp.int32)))
    gref = np.asarray(xf, np.float64) @ np.asarray(
        dequantize_weight(qg), np.float64)
    uref = np.asarray(xf, np.float64) @ np.asarray(
        dequantize_weight(qu), np.float64)
    gated = gref / (1 + np.exp(-gref)) * uref
    want_f = gated @ np.asarray(dequantize_weight(qd), np.float64)
    assert np.abs(got - want_f).max() < 2e-2, np.abs(got - want_f).max()
    mark("qmm_q4sym")

    # 2d. per-16-group k-quant path (q6_K): group size derived from the
    # scales' shape inside the same kernels
    qw6 = quantize_array_for_device(w, GGMLType.Q6_K)
    assert qw6["scales"].shape[0] == 512 // 16
    got = np.asarray(quant_linear(x, qw6))
    want = np.asarray(x, np.float64) @ np.asarray(dequantize_weight(qw6),
                                                  np.float64)
    assert np.abs(got - want).max() < 2e-3, np.abs(got - want).max()
    got_p = np.asarray(quant_linear_panel(x, panelize_weight(qw6)))
    assert np.abs(got_p - got).max() < 1e-4
    mark("qmm_g16")

    # 2e. layer-stacked kernels (scalar-prefetch layer select): must be
    # bit-identical to the per-layer kernel on the sliced weight — the
    # decode scan depends on these (no per-layer copy materialization)
    from qwen2_audio_tpu.ops.quant_matmul import quant_linear_stacked
    import jax.numpy as _jnp
    ws = [rng.standard_normal((512, 512)).astype(np.float32) * 0.05
          for _ in range(3)]
    qws = [quantize_array_for_device(wi, GGMLType.Q8_0) for wi in ws]
    stacked = {k: _jnp.stack([d[k] for d in qws]) for k in qws[0]}
    qps = [panelize_weight(d) for d in qws]
    stacked_p = {k: _jnp.stack([d[k] for d in qps]) for k in qps[0]}
    for li in (0, 2):
        want = np.asarray(quant_linear(x, qws[li]))
        got = np.asarray(quant_linear_stacked(x, stacked,
                                              _jnp.asarray(li, _jnp.int32)))
        assert (got == want).all(), ("stacked strided", li)
        want = np.asarray(quant_linear_panel(x, qps[li]))
        got = np.asarray(quant_linear_stacked(x, stacked_p,
                                              _jnp.asarray(li, _jnp.int32)))
        assert (got == want).all(), ("stacked panel", li)
    qws4 = [quantize_array_for_device(wi, GGMLType.Q4_0, form=_mins_form)
            for wi in ws]
    qps4 = [panelize_weight(d) for d in qws4]
    stacked_p4 = {k: _jnp.stack([d[k] for d in qps4]) for k in qps4[0]}
    for li in (0, 2):
        want = np.asarray(quant_linear_panel(x, qps4[li]))
        got = np.asarray(quant_linear_stacked(x, stacked_p4,
                                              _jnp.asarray(li, _jnp.int32)))
        assert (got == want).all(), ("stacked panel4", li)
    mark("qmm_stacked")

    # 2f. f16 scale storage (lossless for the raw-f16-d formats): kernels
    # must accept float16 scale operands and produce BIT-identical output
    # (f16 -> f32 conversion is exact). SOFT-FAIL: sc16 is an optional
    # optimization gated on its own marker — if Mosaic rejects 16-bit
    # scale operand tiling on this host, skip the marker and keep going
    # (an abort here would silently drop every LATER marker too).
    try:
        with pinned_env(QA_SCALE16="1"):
            qw16 = quantize_array_for_device(w, GGMLType.Q8_0)
        with pinned_env(QA_SCALE16="0"):
            qw32 = quantize_array_for_device(w, GGMLType.Q8_0)
        assert qw16["scales"].dtype == jnp.float16
        got16 = np.asarray(quant_linear(x, qw16))
        got32 = np.asarray(quant_linear(x, qw32))
        assert (got16 == got32).all()
        got16p = np.asarray(quant_linear_panel(x, panelize_weight(qw16)))
        got32p = np.asarray(quant_linear_panel(x, panelize_weight(qw32)))
        assert (got16p == got32p).all()
        got16i = np.asarray(quant_matmul_int8(x, qw16["qs"].astype(jnp.int8),
                                              qw16["scales"]))
        got32i = np.asarray(quant_matmul_int8(x, qw32["qs"].astype(jnp.int8),
                                              qw32["scales"]))
        assert (got16i == got32i).all()
        mark("qmm_sc16")
    except Exception as e:  # noqa: BLE001 — report, don't abort the run
        print(f"[validate] qmm_sc16: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, f32 scales remain the default",
              flush=True)

    # 2f'. uint16-bit-pattern scale storage: the same lossless half-width
    # stream stored as raw f16 bits and expanded in-kernel with integer
    # ops (ops/quant_matmul.py::scales_f32) — sidesteps the Mosaic f16
    # operand rejection that fails 2f on this build. SOFT-FAIL like 2f.
    try:
        with pinned_env(QA_SCALE16="0", QA_SCALE_U16="1"):
            qwu = quantize_array_for_device(w, GGMLType.Q8_0)
        with pinned_env(QA_SCALE16="0", QA_SCALE_U16="0"):
            qw32u = quantize_array_for_device(w, GGMLType.Q8_0)
        assert qwu["scales"].dtype == jnp.uint16
        gotu = np.asarray(quant_linear(x, qwu))
        got32u = np.asarray(quant_linear(x, qw32u))
        assert (gotu == got32u).all()
        gotup = np.asarray(quant_linear_panel(x, panelize_weight(qwu)))
        got32up = np.asarray(quant_linear_panel(x, panelize_weight(qw32u)))
        assert (gotup == got32up).all()
        gotui = np.asarray(quant_matmul_int8(x, qwu["qs"].astype(jnp.int8),
                                             qwu["scales"]))
        got32i2 = np.asarray(quant_matmul_int8(x, qw32u["qs"].astype(jnp.int8),
                                               qw32u["scales"]))
        assert (gotui == got32i2).all()
        # stacked form — the production decode path reads scales this way
        stku = {k: _jnp.stack([v, v]) for k, v in qwu.items()}
        stk32 = {k: _jnp.stack([v, v]) for k, v in qw32u.items()}
        gotus = np.asarray(quant_linear_stacked(x, stku,
                                                _jnp.asarray(1, _jnp.int32)))
        got32s = np.asarray(quant_linear_stacked(x, stk32,
                                                 _jnp.asarray(1, _jnp.int32)))
        assert (gotus == got32s).all()
        # packed-q4 SYM PANELS with u16 scales — the post-sym scale-byte
        # re-A/B combo (scales are ~20% of the sym q4 stream; u16 halves
        # them; pre-sym this lost 5.5% e2e to the in-kernel expansion)
        q4u = quantize_array_for_device(
            w, GGMLType.Q4_0,
            form=Q4Form(packed=True, sym=True, i8=False, scale="u16"))
        q4f = quantize_array_for_device(w, GGMLType.Q4_0, form=_sym_form)
        if q4u["scales"].dtype == jnp.uint16:   # CPU prefers plain f16
            g1 = np.asarray(quant_linear_panel(x, panelize_weight(q4u)))
            g2 = np.asarray(quant_linear_panel(x, panelize_weight(q4f)))
            assert (g1 == g2).all()
        mark("qmm_scu16")
    except Exception as e:  # noqa: BLE001 — report, don't abort the run
        print(f"[validate] qmm_scu16: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, f32 scales remain the default",
              flush=True)

    # 2g. one-launch SwiGLU MLP kernel (optional — soft-fail like 2f):
    # must track the two-kernel stacked path within fast-mode rounding
    try:
        import jax as _jx
        from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_stacked
        from qwen2_audio_tpu.ops.quant_matmul import quant_linear_stacked
        Km, Im = 512, 1024
        gu_l = [quantize_array_for_device(
            rng.standard_normal((Km, 2 * Im)).astype(np.float32) * 0.1,
            GGMLType.Q8_0) for _ in range(2)]
        dn_l = [quantize_array_for_device(
            rng.standard_normal((Im, Km)).astype(np.float32) * 0.1,
            GGMLType.Q8_0) for _ in range(2)]
        gu_s = {k: _jnp.stack([d[k] for d in gu_l]) for k in gu_l[0]}
        dn_s = {k: _jnp.stack([d[k] for d in dn_l]) for k in dn_l[0]}
        xm = jnp.asarray(rng.standard_normal((8, Km)), jnp.float32)
        for lif in (0, 1):
            lij = _jnp.asarray(lif, _jnp.int32)
            got = np.asarray(fused_mlp_stacked(
                xm, gu_s["qs"], gu_s["scales"], dn_s["qs"], dn_s["scales"],
                lij, fast=True))
            gu_out = quant_linear_stacked(xm, gu_s, lij, fast=True)
            gated = _jx.nn.silu(gu_out[:, :Im]) * gu_out[:, Im:]
            want = np.asarray(quant_linear_stacked(gated, dn_s, lij,
                                                   fast=True))
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert np.isfinite(got).all() and rel < 0.03, (lif, rel)
        mark("fused_mlp")
    except Exception as e:  # noqa: BLE001
        print(f"[validate] fused_mlp: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, two-kernel MLP remains the default",
              flush=True)

    # 2h. packed-nibble fused MLP (q4_0/q4_1 decode path) — soft-fail
    try:
        validate_fused_mlp4(rng)
        mark("fused_mlp4")
    except Exception as e:  # noqa: BLE001
        print(f"[validate] fused_mlp4: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, two-kernel MLP remains the q4 default",
              flush=True)

    # 2i. strided-int8 + mins fused MLP (q5_1/q5_K/q2_K) — soft-fail
    try:
        import jax as _jx
        from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_m_stacked
        from qwen2_audio_tpu.ops.quant_matmul import quant_linear_stacked
        Km, Im = 512, 1024
        gu_l = [quantize_array_for_device(
            rng.standard_normal((Km, 2 * Im)).astype(np.float32) * 0.1,
            GGMLType.Q5_1) for _ in range(2)]
        dn_l = [quantize_array_for_device(
            rng.standard_normal((Im, Km)).astype(np.float32) * 0.1,
            GGMLType.Q5_1) for _ in range(2)]
        gu_s = {k: _jnp.stack([d[k] for d in gu_l]) for k in gu_l[0]}
        dn_s = {k: _jnp.stack([d[k] for d in dn_l]) for k in dn_l[0]}
        assert "mins" in gu_s and "qs" in gu_s
        xm = jnp.asarray(rng.standard_normal((8, Km)), jnp.float32)
        for lif in (0, 1):
            lij = _jnp.asarray(lif, _jnp.int32)
            got = np.asarray(fused_mlp_m_stacked(
                xm, gu_s["qs"], gu_s["scales"], gu_s["mins"],
                dn_s["qs"], dn_s["scales"], dn_s["mins"], lij, fast=True))
            gu_out = quant_linear_stacked(xm, gu_s, lij, fast=True)
            gated = _jx.nn.silu(gu_out[:, :Im]) * gu_out[:, Im:]
            want = np.asarray(quant_linear_stacked(gated, dn_s, lij,
                                                   fast=True))
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert np.isfinite(got).all() and rel < 0.03, (lif, rel)
        mark("fused_mlp_m")
    except Exception as e:  # noqa: BLE001
        print(f"[validate] fused_mlp_m: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, two-kernel MLP remains the min-format "
              "default", flush=True)

    # 2i2. STACKED exact-int8 kernels (strided + packed-nibble forms —
    # linear_at's "int8" mode gates on this marker) — soft-fail
    try:
        from qwen2_audio_tpu.ops.quant_matmul_int8 import (
            quant_linear_int8, quant_linear_int8_stacked)
        Km, Nm = 512, 640
        for ttype in (GGMLType.Q8_0, GGMLType.Q4_0):
            ds = [quantize_array_for_device(
                rng.standard_normal((Km, Nm)).astype(np.float32) * 0.1,
                ttype) for _ in range(2)]
            st = {k: _jnp.stack([d[k] for d in ds]) for k in ds[0]}
            xm = jnp.asarray(rng.standard_normal((8, Km)), jnp.float32)
            for lif in (0, 1):
                lij = _jnp.asarray(lif, _jnp.int32)
                got = np.asarray(quant_linear_int8_stacked(xm, st, lij))
                if "qs4" in ds[lif]:
                    from qwen2_audio_tpu.ops.quant_matmul import \
                        dequantize_weight4
                    from qwen2_audio_tpu.ops.quant_matmul_int8 import \
                        quantize_activations
                    xq, sx = quantize_activations(xm)
                    xdq = np.asarray(xq, np.float32) * np.repeat(
                        np.asarray(sx, np.float32), 32, axis=1)
                    want = xdq @ np.asarray(dequantize_weight4(ds[lif]))
                else:
                    want = np.asarray(quant_linear_int8(xm, ds[lif]))
                rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
                assert np.isfinite(got).all() and rel < 2e-2, \
                    (ttype, lif, rel)
        mark("qmm_int8_stacked")
    except Exception as e:  # noqa: BLE001
        print(f"[validate] qmm_int8_stacked: FAILED ({type(e).__name__}: "
              f"{e}) — marker not written, int8 mode keeps the slice-copy "
              "path", flush=True)

    # 2j. SPLIT-schema fused MLP (canonical gate/up — the TP shard form;
    # ops/linear.py::fused_mlp_split_at gates on this marker) — soft-fail
    try:
        validate_fused_mlp_split(rng)
        mark("fused_mlp_split")
    except Exception as e:  # noqa: BLE001
        print(f"[validate] fused_mlp_split: FAILED ({type(e).__name__}: "
              f"{e}) — marker not written, canonical/TP schema keeps the "
              "three-launch MLP", flush=True)

    # 3. fused mel kernel
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.audio.mel import log_mel_spectrogram
    from qwen2_audio_tpu.ops.mel_kernel import log_mel_spectrogram_fused
    f = mel_filterbank(128)
    t = np.arange(16000 * 5) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    a = log_mel_spectrogram(audio, f)
    b = log_mel_spectrogram_fused(audio, f)
    assert np.abs(a.data - b.data).max() < 1e-3
    mark("mel")

    # 4. composed: full encoder jit with flash attention inside
    from qwen2_audio_tpu.config import WHISPER_PRESETS
    from qwen2_audio_tpu.models.encoder import encoder_forward, random_encoder_params
    hp = WHISPER_PRESETS["qwen2-audio"]
    params = random_encoder_params(rng, hp, dtype=jnp.bfloat16)
    mel = jnp.asarray(rng.standard_normal((1, hp.n_mels, 2 * hp.n_audio_ctx)),
                      jnp.bfloat16)
    t0 = time.time()
    out = encoder_forward(params, mel, hp, use_flash=True,
                          compute_dtype=jnp.bfloat16)
    o = np.asarray(out)
    print(f"[validate] fa_encoder compile+run {time.time()-t0:.1f}s "
          f"out={o.shape}", flush=True)
    assert np.isfinite(o.astype(np.float32)).all()
    mark("fa_encoder")

    # 4b. composed: the whole wav->embedding pipeline in ONE jit — device
    # mel window (fused kernel + clamp/normalize) feeding the full flash
    # encoder, no host round trip between the phases (soft-fail: the
    # split mel/encode path remains the default without the marker)
    try:
        import jax as _jx
        from qwen2_audio_tpu.ops.mel_kernel import (frame_rows, mel_tables,
                                                    mel_window_device)
        fme = mel_filterbank(hp.n_mels)
        t30 = np.arange(16000 * 30) / 16000
        aud30 = (0.3 * np.sin(2 * np.pi * 220 * t30)
                 + 0.05 * rng.standard_normal(t30.size)).astype(np.float32)
        rows_np, _nl, _no, n_content = frame_rows(aud30)
        bc, bs, filt, n_mel = mel_tables(fme)
        rows = jnp.asarray(rows_np)

        @_jx.jit
        def pipe(params, rows):
            win = mel_window_device(rows, bc, bs, filt,
                                    n_frames=2 * hp.n_audio_ctx,
                                    n_content=n_content, n_mels=n_mel)
            return encoder_forward(params, win[None].astype(jnp.bfloat16),
                                   hp, use_flash=True,
                                   compute_dtype=jnp.bfloat16)

        t0 = time.time()
        emb = np.asarray(pipe(params, rows)).astype(np.float32)
        # reference: host mel + the already-validated encoder jit
        host_win = log_mel_spectrogram(aud30, fme)
        from qwen2_audio_tpu.audio.mel import mel_input_window
        hw = jnp.asarray(mel_input_window(host_win, 0, hp.n_audio_ctx)[None],
                         jnp.bfloat16)
        ref = np.asarray(encoder_forward(params, hw, hp, use_flash=True,
                                         compute_dtype=jnp.bfloat16)
                         ).astype(np.float32)
        err = np.abs(emb - ref).max() / (np.abs(ref).max() + 1e-6)
        print(f"[validate] pipeline compile+run {time.time()-t0:.1f}s "
              f"rel_err={err:.2e}", flush=True)
        # 3% like the other composed bf16 stages: device mel and host mel
        # differ in the last bf16 bit and 32 layers amplify (measured
        # 2.1-2.2% on this chip; exact mel parity is covered in f32 by
        # tests/test_mel_kernel.py — this stage proves the COMPOSITION)
        assert np.isfinite(emb).all() and err < 0.03, err
        mark("pipeline")
    except Exception as e:  # noqa: BLE001
        print(f"[validate] pipeline: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, split mel/encode remains the default",
              flush=True)

    # 5. composed: quantized encoder layer path
    from qwen2_audio_tpu.quant.qparams import quantize_encoder_params
    hp_small = WHISPER_PRESETS["base"]
    p = random_encoder_params(rng, hp_small, dtype=jnp.float32)
    qp = quantize_encoder_params(p, GGMLType.Q8_0)
    mel = jnp.asarray(rng.standard_normal((1, hp_small.n_mels,
                                           2 * hp_small.n_audio_ctx)),
                      jnp.float32)
    a = np.asarray(encoder_forward(p, mel, hp_small))
    b = np.asarray(encoder_forward(qp, mel, hp_small))
    assert np.abs(a - b).max() < 1.0
    mark("qmm_encoder")

    # 6. composed: flash attention inside the scanned decoder prefill
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, random_decoder_params)
    dcfg = Qwen2DecoderConfig(
        vocab_size=1024, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=2,
        head_dim=64, tie_word_embeddings=False)
    dp = random_decoder_params(rng, dcfg, dtype=jnp.bfloat16)
    cache = create_cache(dcfg, 1, 512, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 384, 512)) * 0.1, jnp.bfloat16)
    logits, cache = decoder_forward(dp, dcfg, x, cache, 0, block_only=True,
                                    logits_last_only=True, use_flash=True)
    assert np.isfinite(np.asarray(logits)).all()
    mark("fa_decoder")

    # 7. composed: exact-int8 group matmul inside the scanned quantized
    # decoder (prefill + one T=1 decode step) vs the dequant kernel path
    from qwen2_audio_tpu.ops.linear import set_group_matmul_mode
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
    dpq = quantize_decoder_params(dp, GGMLType.Q8_0)
    step = jnp.asarray(rng.standard_normal((1, 1, 512)) * 0.1, jnp.bfloat16)
    outs = {}
    for mode in ("dequant", "int8", "bf16"):
        set_group_matmul_mode(mode)
        cache = create_cache(dcfg, 1, 512, dtype=jnp.bfloat16)
        lg, cache = decoder_forward(dpq, dcfg, x, cache, 0, block_only=True,
                                    logits_last_only=True)
        lg2, cache = decoder_forward(dpq, dcfg, step, cache, x.shape[1])
        outs[mode] = np.asarray(lg2, np.float32)
        # separate jit cache per mode: decoder_forward hashes on arg
        # structure only, so clear between modes
        decoder_forward.clear_cache()
    set_group_matmul_mode(None)
    scale = np.abs(outs["dequant"]).max() + 1e-6
    for mode, marker in (("int8", "qmm_int8_decoder"),
                         ("bf16", "qmm_bf16_decoder")):
        diff = np.abs(outs[mode] - outs["dequant"]).max()
        assert np.isfinite(outs[mode]).all() and diff / scale < 0.05, \
            (mode, diff, scale)
        mark(marker)

    # 8. composed: packed-nibble q4_0 inside the scanned decoder — must
    # match the int8-form weights of the SAME payload bit-for-bit in the
    # dequantized values. Run with f32 activations: the contract here is
    # weight-form equivalence, and at bf16 the two kernels' different
    # matmul orders compound through 4 layers to ~2% of logit scale —
    # a marginal threshold that flaked on chip (0.0224 vs 0.02) with no
    # decoder-path change. f32 shrinks order noise below 1e-3.
    from qwen2_audio_tpu.quant.qparams import Q4Form as _Q4F
    dpq4_i8 = quantize_decoder_params(dp, GGMLType.Q4_0,
                                      form=_Q4F(packed=False))
    dpq4_p = quantize_decoder_params(
        dp, GGMLType.Q4_0,
        form=_Q4F(packed=True, sym=False, i8=False, scale="f32"))
    x32 = x.astype(jnp.float32)
    step32 = step.astype(jnp.float32)
    outs4 = {}
    # pin "dequant" (f32-exact) mode: on TPU the auto mode is "bf16",
    # whose per-kernel rounding differs between the packed and int8
    # forms — the on-chip bf16 comparison measured 1.3e-2 where the
    # f32 contract measures 1.3e-6
    set_group_matmul_mode("dequant")
    for name, dq in (("i8", dpq4_i8), ("p4", dpq4_p)):
        cache = create_cache(dcfg, 1, 512, dtype=jnp.float32)
        lg, cache = decoder_forward(dq, dcfg, x32, cache, 0, block_only=True,
                                    logits_last_only=True)
        lg2, cache = decoder_forward(dq, dcfg, step32, cache, x32.shape[1])
        outs4[name] = np.asarray(lg2, np.float32)
        decoder_forward.clear_cache()
    set_group_matmul_mode(None)
    scale4 = np.abs(outs4["i8"]).max() + 1e-6
    diff4 = np.abs(outs4["p4"] - outs4["i8"]).max()
    assert np.isfinite(outs4["p4"]).all() and diff4 / scale4 < 5e-3, \
        (diff4, scale4)
    mark("qmm_q4p_decoder")

    # 9. flash-decode (decode-step cache attention), standalone: bf16
    # cache, int8 cache, per-stream positions — vs the einsum paths
    from qwen2_audio_tpu.models.qwen2_decoder import (_gqa_attention,
                                                      _gqa_attention_quant,
                                                      _quantize_kv)
    from qwen2_audio_tpu.ops.flash_decode import (flash_decode,
                                                  flash_decode_quant)
    B, S, Hq, Hkv, dh = 2, 640, 12, 2, 128
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, dh)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, S, Hkv, dh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, S, Hkv, dh)), jnp.float32)
    posv = jnp.asarray([100, 639], jnp.int32)
    want = np.asarray(_gqa_attention(q, kc, vc, posv, S))[:, 0]
    got = np.asarray(flash_decode(q[:, 0], kc, vc, posv,
                                  sm_scale=dh ** -0.5)).reshape(B, -1)
    assert np.abs(got - want).max() < 2e-3, np.abs(got - want).max()
    mark("fd")

    kq_c, ks_c = _quantize_kv(kc)
    vq_c, vs_c = _quantize_kv(vc)
    want = np.asarray(_gqa_attention_quant(q, kq_c, ks_c, vq_c, vs_c,
                                           posv))[:, 0]
    got = np.asarray(flash_decode_quant(q[:, 0], kq_c, ks_c, vq_c, vs_c,
                                        posv,
                                        sm_scale=dh ** -0.5)).reshape(B, -1)
    # kernel-vs-einsum on IDENTICAL int8 cache payloads: the diff is pure
    # bf16 accumulation-order noise. 2e-3 proved marginal (r4 measured
    # 2.03e-3 on chip and aborted every LATER stage with it) — 3e-3 keeps
    # the contract tight without the flake.
    assert np.abs(got - want).max() < 3e-3, np.abs(got - want).max()
    mark("fd_quant")

    # 10. composed (the risky one, deliberately LAST): flash-decode inside
    # the scanned decoder, then inside lax.while_loop — the production
    # decode loop. Numerics: per-step LOGITS within tolerance vs the
    # einsum path (token-exact is not a meaningful bar in bf16 — argmax
    # ties on random weights flip and the sequences diverge); the
    # while_loop leg proves the risky compile+run itself.
    from qwen2_audio_tpu.runtime.generate import generate_on_device
    dcfg_fd = Qwen2DecoderConfig(
        vocab_size=1024, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=2,
        head_dim=128, tie_word_embeddings=False)
    dp_fd = random_decoder_params(rng, dcfg_fd, dtype=jnp.bfloat16)
    pre = jnp.asarray(rng.standard_normal((1, 16, 512)) * 0.1, jnp.bfloat16)
    stepx = jnp.asarray(rng.standard_normal((1, 1, 512)) * 0.1, jnp.bfloat16)
    step_lg = {}
    _fd_prior = os.environ.get("QA_FLASH_DECODE")   # restore, don't pop
    for flag in ("0", "1"):
        os.environ["QA_FLASH_DECODE"] = flag
        decoder_forward.clear_cache()
        for cdt in ("bf16", "q8"):
            cache = create_cache(dcfg_fd, 1, 64,
                                 dtype=jnp.bfloat16 if cdt == "bf16" else "q8")
            _, cache = decoder_forward(dp_fd, dcfg_fd, pre, cache, 0,
                                       block_only=True, logits_last_only=True)
            lg, cache = decoder_forward(dp_fd, dcfg_fd, stepx, cache, 16)
            step_lg[flag, cdt] = np.asarray(lg, np.float32)
    for cdt in ("bf16", "q8"):
        a, b = step_lg["1", cdt], step_lg["0", cdt]
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
        assert np.isfinite(a).all() and rel < 0.05, (cdt, rel)
    # while_loop composition: compile + run with the kernel in the body
    for cdt in ("bf16", "q8"):
        t0 = time.time()
        toks, _, cnt, _, _ = generate_on_device(
            dp_fd, dcfg_fd, pre, None, max_new_tokens=24,
            eos_token_id=-1, cache_max_ctx=64,
            cache_dtype=jnp.bfloat16 if cdt == "bf16" else "q8")
        toks = np.asarray(toks)
        assert int(cnt) == 24 and (toks >= 0).all(), cdt
        print(f"[validate] fd_loop cache={cdt} "
              f"compile+run {time.time()-t0:.1f}s", flush=True)
    # fori_loop composition: the continuous-batching chunk decoder
    # (runtime/generate.py::decode_chunk_slots) wraps the kernel in
    # lax.fori_loop — validate it BEFORE arming the marker, which gates
    # all loop compositions
    from qwen2_audio_tpu.runtime.generate import (decode_chunk_slots,
                                                  prefill_slot)
    cache = create_cache(dcfg_fd, 2, 64, dtype=jnp.bfloat16)
    slot_pos = jnp.zeros((2,), jnp.int32)
    slot_logits = jnp.zeros((2, dcfg_fd.vocab_size), jnp.float32)
    slot_active = jnp.zeros((2,), bool)
    for s in range(2):
        cache, slot_pos, slot_logits, slot_active = prefill_slot(
            dp_fd, dcfg_fd, cache, slot_pos, slot_logits, slot_active,
            jnp.int32(s), pre)
    t0 = time.time()
    cache, slot_pos, slot_logits, slot_active, toks, lps = decode_chunk_slots(
        dp_fd, dcfg_fd, cache, slot_pos, slot_logits, slot_active,
        chunk=8, eos_token_id=-1)
    toks = np.asarray(toks)
    assert np.isfinite(np.asarray(slot_logits)).all() and (toks >= 0).all()
    print(f"[validate] fd_slots (fori_loop) compile+run "
          f"{time.time()-t0:.1f}s", flush=True)
    if _fd_prior is None:                           # ADVICE r4: an
        os.environ.pop("QA_FLASH_DECODE", None)     # unconditional pop
    else:                                           # drops an operator-
        os.environ["QA_FLASH_DECODE"] = _fd_prior   # exported value
    decoder_forward.clear_cache()
    generate_on_device.clear_cache()
    mark("fd_loop")

    # speculative while_loop composition: T=K+1 forwards (einsum cache
    # attention + the active quant matmul path) with in-loop dynamic
    # slices — exactness vs the plain loop is the assert
    from qwen2_audio_tpu.runtime.generate import generate_speculative
    t0 = time.time()
    g = generate_on_device(dp_fd, dcfg_fd, pre, None, max_new_tokens=24,
                           eos_token_id=-1, cache_max_ctx=64,
                           cache_dtype=jnp.bfloat16)
    s = generate_speculative(dp_fd, dcfg_fd, pre, None, max_new_tokens=24,
                             eos_token_id=-1, cache_max_ctx=96,
                             cache_dtype=jnp.bfloat16, spec_k=6)
    # bf16 + random weights = many near-tie argmaxes; the K+1-wide forward
    # rounds differently from a T=1 forward, and ONE flipped tie diverges
    # the whole suffix (random models cycle), so sequence agreement is not
    # a usable hardware assertion — the logic-exactness proof is the f32
    # test suite. Here: determinism (spec == spec), full count, and the
    # first token (produced by the identical prefill program) must match.
    s2 = generate_speculative(dp_fd, dcfg_fd, pre, None, max_new_tokens=24,
                              eos_token_id=-1, cache_max_ctx=96,
                              cache_dtype=jnp.bfloat16, spec_k=6)
    gt, st = np.asarray(g[0])[0], np.asarray(s[0])[0]
    assert (st == np.asarray(s2[0])[0]).all(), "spec nondeterministic"
    assert int(g[2]) == int(s[2]) == 24 and gt[0] == st[0], \
        ("spec vs greedy", int(g[2]), int(s[2]), int(gt[0]), int(st[0]))
    agree = float((gt == st).mean())
    print(f"[validate] spec/greedy agreement {agree:.2f} "
          "(<1.0 = bf16 near-tie flip, expected w/ random weights)",
          flush=True)
    print(f"[validate] spec_loop (K+1-wide while_loop) compile+run "
          f"{time.time()-t0:.1f}s", flush=True)
    mark("spec_loop")

    # batched-speculative slot pool: (B, K+1) verify forwards with
    # per-slot positions under one while_loop (soft-fail — the serving
    # auto-on gates on this marker, plain chunk loop remains the default)
    try:
        from qwen2_audio_tpu.runtime.generate import decode_chunk_slots_spec
        cache = create_cache(dcfg_fd, 2, 96, dtype=jnp.bfloat16)
        slot_pos = jnp.zeros((2,), jnp.int32)
        slot_logits = jnp.zeros((2, dcfg_fd.vocab_size), jnp.float32)
        slot_active = jnp.zeros((2,), bool)
        for s in range(2):
            cache, slot_pos, slot_logits, slot_active = prefill_slot(
                dp_fd, dcfg_fd, cache, slot_pos, slot_logits, slot_active,
                jnp.int32(s), pre)
        hist = jnp.zeros((2, 64), jnp.int32)
        hlen = jnp.zeros((2,), jnp.int32)
        t0 = time.time()
        (cache, slot_pos, slot_logits, slot_active, hist, hlen, toks, lps,
         n_new, iters) = decode_chunk_slots_spec(
            dp_fd, dcfg_fd, cache, slot_pos, slot_logits, slot_active,
            hist, hlen, chunk=8, eos_token_id=-1, spec_k=6)
        toks = np.asarray(toks)
        n_new = np.asarray(n_new)
        assert (n_new == 8).all() and (toks[:, :8] >= 0).all() \
            and np.isfinite(np.asarray(slot_logits)).all(), \
            (n_new.tolist(), int(iters))
        # determinism across a repeat from identical state is covered by
        # the f32 exactness suite; here the composed program must compile,
        # run, and emit full chunks
        print(f"[validate] spec_slots (B x K+1 while_loop) compile+run "
              f"{time.time()-t0:.1f}s iters={int(iters)}", flush=True)
        mark("spec_slots")
    except Exception as e:  # noqa: BLE001
        print(f"[validate] spec_slots: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, plain chunk loop remains the serving "
              "default", flush=True)

    # 10. q4 stream levers (qmm_q4i8 int8-stored nibbles — the PRODUCTION
    # q4_0 default since the r4/r5 e2e wins — and qmm_panelbn wide
    # panels), folded in so ONE fresh-host run arms everything
    # (tools/validate_q4i8.py stays as the standalone re-arm entry).
    # Soft-fail: without the marker the default stays u8.
    try:
        from tools.validate_q4i8 import main as _q4i8_main
        _q4i8_main()
    except Exception as e:  # noqa: BLE001
        print(f"[validate] q4i8/panelbn: FAILED ({type(e).__name__}: {e}) "
              "— markers not written, u8 stream remains the default",
              flush=True)

    # 11. word-packed s8-dot q4 form (qmm_q4b/_decoder) and the bf16
    # softmax exponent (fa_pexp16) — round-5 levers, folded in so ONE
    # fresh-host run arms everything (tools/validate_q4b.py and
    # tools/validate_fa_pexp16.py stay as standalone re-arm entries).
    # Soft-fail: without the markers the env gates stay closed.
    try:
        from tools.validate_q4b import main as _q4b_main
        _q4b_main()
    except Exception as e:  # noqa: BLE001
        print(f"[validate] q4b: FAILED ({type(e).__name__}: {e}) — "
              "markers not written, the b32 form stays unavailable",
              flush=True)
    try:
        from tools.validate_fa_pexp16 import main as _pexp16_main
        _pexp16_main()
    except Exception as e:  # noqa: BLE001
        print(f"[validate] fa_pexp16: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, f32 exponent remains the default",
              flush=True)
    try:
        from tools.validate_dq16 import main as _dq16_main
        _dq16_main()
    except Exception as e:  # noqa: BLE001
        print(f"[validate] dq16: FAILED ({type(e).__name__}: {e}) — "
              "marker not written, f32-domain dequant remains the default",
              flush=True)

    print("[validate] ALL OK", flush=True)
    return 0


def _mlp_split_only() -> int:
    """Re-validate just the fused-MLP blocks the sym-default KeyError
    disarmed (fused_mlp4 + fused_mlp_split) without replaying the whole
    ~30 min fresh-host sequence. Soft-fail per marker like main()."""
    import jax
    print(f"[validate] backend={jax.default_backend()}", flush=True)
    rc = 0
    for fn, name in ((validate_fused_mlp4, "fused_mlp4"),
                     (validate_fused_mlp_split, "fused_mlp_split")):
        try:
            fn(np.random.default_rng(0))
            mark(name)
        except Exception as e:  # noqa: BLE001
            print(f"[validate] {name}: FAILED ({type(e).__name__}: {e})",
                  flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    if "--mlp-split-only" in sys.argv:
        sys.exit(_mlp_split_only())
    sys.exit(main())
