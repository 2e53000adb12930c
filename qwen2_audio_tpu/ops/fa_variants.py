"""Quarantined flash-attention kernel VARIANTS (non-shipping paths).

Production attention lives in ops/flash_attention.py and uses exactly two
kernel bodies: the one-shot single-KV-block kernel (the encoder winner)
and the blockwise online-softmax kernel (the general fallback).  This
module holds the experimental variants that were built, hardware-validated
and A/B-measured but did NOT win end-to-end, together with their measured
negative results.  They stay importable (parity tests + validator keep
them correct) and env-gated for future A/Bs, but out of the hot module.

Measured outcomes (full encoder forward A/B on the v5e chip, round 3):

- **lite** (`_attn_kernel_single_lite`): softmax bookkeeping moved onto
  the MXU via the d_head-64 pad lanes.  42% e2e LOSS (29.16 vs 20.49
  ms/clip): the three `.at[..., d].set()` column writes on Q/K/V do not
  fuse into the pad copies in the composed program, so the VPU-work
  saving is swamped by three extra full-array HBM round trips per layer.
  Env `QA_FA_LITE=1`.
- **nopad** (`flash_attention_nopad`): skips the XLA-side 64->128 lane
  pad of Q/K/V.  2% e2e LOSS (22.66 vs 22.21 ms/clip): d=64 lane blocks
  DMA at half tile efficiency, eating the pad-removal saving.  Env
  `QA_FA_NOPAD=1`.
- **exp2** (softmax base 2, LOG2E folded into the free Q pre-scale so
  kernels exponentiate with `exp2`): NEUTRAL e2e (+0.2%) — the attention
  tail over the MXU floor is the exp transcendental itself, not its
  argument scaling.  Env `QA_FA_EXP2=1`.  The `exp2=` kwarg itself lives
  in the shipping kernels (one-line option); only the gate is here.

Gating rule (the round-3 closeout discipline): the on-chip validator
(tools/validate_tpu_kernels.py) proves a variant CORRECT on a host, but
only a full-forward e2e A/B may flip a production default — so all three
default OFF on TPU and arm only via their env knobs.  On TPU the env
knob additionally requires the host's validation marker: unvalidated
Mosaic lowerings have wedged the remote-compile tunnel (CLAUDE.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _env_gate(env: str, marker: str, default: bool = False) -> bool:
    """Env-knob gate for a variant: explicit 0/1 wins, but on TPU an
    enable additionally requires this host's validation marker (ADVICE
    r3: QA_FA_EXP2=1 must not launch a never-validated lowering on a
    fresh host — kernel compiles have wedged the tunnel)."""
    ov = os.environ.get(env)
    if ov is None:
        return default
    on = ov not in ("0", "false", "off")
    if on and not _use_interpret():
        return os.path.exists(f"/tmp/qa_kernel_ok_{marker}")
    return on


def lite_ok() -> bool:
    """Lite variant gate — OFF by default on TPU (42% e2e loss, header).
    Interpret mode (the CPU test mesh) always exercises it so parity
    stays covered; `QA_FA_LITE=1` is the A/B escape hatch."""
    if os.environ.get("QA_FA_LITE") is None and _use_interpret():
        return True
    return _env_gate("QA_FA_LITE", "fa_lite")


def nopad_ok() -> bool:
    """Nopad variant gate — OFF by default everywhere (2% e2e loss,
    header).  `QA_FA_NOPAD=1` is the escape hatch for future shapes
    where the padded copies dominate."""
    return _env_gate("QA_FA_NOPAD", "fa_nopad")


def exp2_ok() -> bool:
    """exp2-domain softmax gate — OFF by default (neutral e2e, header;
    only an e2e WIN may flip a default).  `QA_FA_EXP2=0/1` overrides."""
    return _env_gate("QA_FA_EXP2", "fa_exp2")


def pexp16_ok() -> bool:
    """bf16-domain softmax exponent in the one-shot kernel (VERDICT r4
    #8 lever at the ~140 us/layer VPU exp tail): the shifted scores
    round to bf16 BEFORE the transcendental and the probability tile
    lands directly in the AV dot's dtype.  MEASURED: 2.9% e2e LOSS
    (RTF 1558.4 vs 1604.1, round-5 queue r5i) — Mosaic serves bf16
    `exp` by widening to f32 internally, so the cast buys no lanes and
    costs a rounding pass.  This closes the r4 #8 exp-tail ledger: of
    the three levers tried (exp2 neutral, lite -42%, pexp16 -2.9%) none
    beats the f32 exp; the ~140 us/layer tail stands as the measured
    cost of the transcendental itself.  OFF by default (only an e2e WIN
    may flip a default).  `QA_FA_PEXP16=0/1`."""
    return _env_gate("QA_FA_PEXP16", "fa_pexp16")


def _attn_kernel_single_lite(q_ref, k_ref, v_ref, o_ref, *, d_l: int,
                             exp2: bool = False):
    """One-shot attention with the softmax bookkeeping moved onto the MXU.

    The plain single-pass kernel (flash_attention._attn_kernel_single)
    still pays four VPU sweeps over the (block_q, block_k) score tile —
    iota/compare/select for the key mask, the scale multiply, and a full
    sum reduction for the softmax denominator — which at the encoder's
    d_head-64 shapes costs as much as the two MXU dots themselves.  This
    variant eliminates all of them using the lane padding that d_head 64
    forces anyway:

    - Q is pre-scaled by sm_scale and carries 1.0 in pad column ``d_l``;
      K carries the key-validity bias (0 valid / -1e30 padded) in the same
      column — so QK^T lands ALREADY scaled and masked, no VPU pass.
    - V carries 1.0 in pad column ``d_l``, so column ``d_l`` of the PV dot
      IS sum(p): the denominator comes out of the MXU for free.

    What remains on the VPU: one max reduction and one exp (fused with the
    m-subtract and the bf16 cast).  The kernel divides by acc[:, d_l]; the
    caller slices columns [:d_l] so the ones column never escapes.

    NEGATIVE RESULT: see module header — the .at[].set column writes do
    not fuse in the composed program; 42% e2e loss at the encoder config.
    """
    q = q_ref[0, 0]                         # (block_q, d) — pre-scaled
    k = k_ref[0, 0]                         # (block_k, d) — bias in col d_l
    t = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # scaled + masked
    m = jnp.max(t, axis=1, keepdims=True)
    p = (jnp.exp2 if exp2 else jnp.exp)(t - m).astype(v_ref.dtype)
    acc = jax.lax.dot(p, v_ref[0, 0], preferred_element_type=jnp.float32)
    l = acc[:, d_l:d_l + 1]                 # sum(p) via V's ones column
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)


def lite_call(q, k, v, *, d: int, Tq: int, sm_scale: float, kv_valid: int,
              block_q: int, block_k: int, kv_group: int, exp2: bool):
    """pallas_call wrapper for the lite kernel over ALREADY-PADDED
    (B, H|Hkv, TQ|TK, Dq) inputs (flash_attention does the shared pad).
    Bakes scale/mask/denominator into the pad lanes, launches, un-pads."""
    B, H, TQ, Dq = q.shape
    q = (q * jnp.asarray(sm_scale, q.dtype)).at[..., d].set(1.0)
    key_bias = jnp.where(
        jax.lax.iota(jnp.float32, k.shape[2]) < kv_valid, 0.0, -1e30
    ).astype(k.dtype)
    k = k.at[..., d].set(key_bias[None, None, :])
    v = v.at[..., d].set(1.0)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_single_lite, d_l=d, exp2=exp2),
        out_shape=jax.ShapeDtypeStruct((B, H, TQ, Dq), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, H, TQ // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dq),
                             lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, Dq),
                             lambda b, h, i: (b, h // kv_group, 0, 0)),
                pl.BlockSpec((1, 1, block_k, Dq),
                             lambda b, h, i: (b, h // kv_group, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, Dq),
                                   lambda b, h, i: (b, h, i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_use_interpret(),
    )(q, k, v)
    return out[:, :, :Tq, :d]


def flash_attention_nopad(q, k, v, *, sm_scale: float, block_q: int,
                          exp2: bool = False):
    """One-shot single-KV-block attention with NO XLA-side padding.

    The padded single path (flash_attention single=True) costs three HBM
    round trips per layer: jnp.pad of Q/K/V to 128 lanes (the d_head-64
    encoder doubles its own byte volume), plus the output un-pad slice.
    Here the kernel reads (…, d=64) blocks directly — a block whose last
    dim equals the array's last dim is legal for Mosaic (it pads the VMEM
    tile internally, no HBM copy) — and the q sequence tail is handled by
    Pallas' own out-of-bounds semantics: tail q rows compute garbage rows
    that the bounds-masked write discards (row-local: softmax is
    per-row). K/V keep a zero seq-pad (cheap: no lane doubling) because an
    out-of-bounds V tail could read NaN bit patterns and 0 x NaN poisons
    the PV dot; the padded keys are additionally kv_valid-masked so they
    contribute nothing to the softmax. MXU compute per tile is unchanged
    (the lane padding happens in VMEM either way); what this buys is pure
    HBM traffic + pad/slice dispatch removal.

    NEGATIVE RESULT: see module header — d=64 lane blocks DMA at half
    tile efficiency; 2% e2e loss at the encoder config."""
    from qwen2_audio_tpu.ops.flash_attention import _attn_kernel_single
    B, H, Tq, d = q.shape
    Tk = k.shape[2]
    n_kv = k.shape[1]
    kv_group = H // n_kv
    block_k = Tk + (-Tk % _LANES)           # whole KV in one tile
    if block_k != Tk:
        pad = ((0, 0), (0, 0), (0, block_k - Tk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    nq = -(-Tq // block_q)

    return pl.pallas_call(
        functools.partial(_attn_kernel_single, sm_scale=sm_scale,
                          kv_valid=Tk, block_k=block_k, exp2=exp2),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, H, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, i: (b, h // kv_group, 0, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, i: (b, h // kv_group, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b, h, i: (b, h, i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_use_interpret(),
    )(q, k, v)
