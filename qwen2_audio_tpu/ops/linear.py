"""Linear-layer dispatch: dense jnp matmul, the ggml-block Pallas kernels,
or the w8a8 int8-MXU fast path — selected by the parameter dict's keys:

    {"w"[, "b"]}                  dense
    {"qs", "scales"[, "b"]}       ggml q4_0/q8_0 blocks. Two kernels serve
                                  this form: the exact-integer group matmul
                                  (ops/quant_matmul_int8.py — int8 MXU dots
                                  + per-32-group scales, ggml-mmq numerics,
                                  fast) or the dequant-in-VMEM matmul
                                  (ops/quant_matmul.py — float-exact in the
                                  activations too, slower). See
                                  set_group_matmul_mode below.
    {"qs8", "scale_n"[, "b"]}     per-channel int8 weights + on-the-fly
                                  per-row int8 activations: one native
                                  int8 x int8 -> int32 MXU matmul (peak
                                  decode throughput, coarser scales)

This is the TPU analog of ggml's per-tensor-type matmul routing
(ggml_cuda_mul_mat, ggml/src/ggml-cuda.cu:1882-1946)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from qwen2_audio_tpu.ops.quant_matmul import (quant_linear, quant_linear4,
                                              quant_linear_panel,
                                              quant_linear_stacked)
from qwen2_audio_tpu.ops.quant_matmul_int8 import quant_linear_int8

# How {"qs","scales"} weights are multiplied:
#   "bf16"    dequantize-in-VMEM, ONE native bf16 MXU pass. Weights and
#             activations each single-rounded to 8 mantissa bits — the
#             same information budget as ggml-mmq's 8-bit q8_1 activation
#             quantization, finer than its f16 dmmv path. Fastest decode.
#   "int8"    exact-integer group matmul (ggml-mmq analog; weight values
#             enter the dot EXACTLY, activations see q8_1-equivalent
#             rounding). Bandwidth-equal to bf16 mode but pays one
#             K=32-deep MXU dot per group — slower at decode; use when
#             integer-exact weight dots are required.
#   "dequant" dequantize-in-VMEM + f32 HIGHEST matmul (no rounding beyond
#             the f32 dequant itself; ~2.5x slower at decode)
#   None      auto: "bf16" on TPU once tools/validate_tpu_kernels.py wrote
#             the composed-decoder marker for this host, else "dequant"
# NOTE: read at TRACE time. Set it before the first forward; flipping it
# later will not invalidate already-compiled jit caches.
_GROUP_MATMUL_MODE: str | None = None
_INT8_MARKER = "/tmp/qa_kernel_ok_qmm_int8_decoder"
_BF16_MARKER = "/tmp/qa_kernel_ok_qmm_bf16_decoder"


def set_group_matmul_mode(mode: str | None) -> None:
    assert mode in (None, "bf16", "int8", "dequant"), mode
    global _GROUP_MATMUL_MODE
    _GROUP_MATMUL_MODE = mode


def group_matmul_mode() -> str:
    if _GROUP_MATMUL_MODE is not None:
        return _GROUP_MATMUL_MODE
    if jax.default_backend() in ("tpu", "axon"):
        if os.path.exists(_BF16_MARKER):
            return "bf16"
        if os.path.exists(_INT8_MARKER):
            return "int8"
    return "dequant"


def _w8a8(x: jax.Array, p: dict) -> jax.Array:
    """Per-row-quantized activations @ per-channel int8 weights."""
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    inv = jnp.where(s_x > 0, 1.0 / s_x, 0.0)
    x_q = jnp.round(xf * inv).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p["qs8"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * p["scale_n"].astype(jnp.float32)
    return y.astype(x.dtype)


_INT8_STACKED_MARKER = "/tmp/qa_kernel_ok_qmm_int8_stacked"


def _int8_stacked_ok() -> bool:
    """Stacked exact-int8 kernels (quant_matmul_int8_stacked) gate on
    their own hardware-validation marker; CPU interpret mode always
    qualifies. Env QA_INT8_STACKED=0 opts out for A/Bs."""
    if os.environ.get("QA_INT8_STACKED") in ("0", "false"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return True
    return os.path.exists(_INT8_STACKED_MARKER)


_FUSED_MLP_MARKER = "/tmp/qa_kernel_ok_fused_mlp"
_FUSED_MLP4_MARKER = "/tmp/qa_kernel_ok_fused_mlp4"
_FUSED_MLP_M_MARKER = "/tmp/qa_kernel_ok_fused_mlp_m"


def _fused_mlp_enabled() -> bool:
    """One-launch SwiGLU MLP (ops/fused_mlp.py). Env QA_FUSED_MLP=0/1
    overrides; default on when hardware-validated (marker) or on CPU."""
    env = os.environ.get("QA_FUSED_MLP")
    if env is not None:
        return env not in ("0", "false", "")
    if jax.default_backend() not in ("tpu", "axon"):
        return True
    return os.path.exists(_FUSED_MLP_MARKER)


def fused_mlp_at(x: jax.Array, gu: dict, dn: dict, li: jax.Array
                 ) -> jax.Array | None:
    """One-launch silu(x@gate)*(x@up)@down for layer-stacked quant dicts
    at decode M — strided int8 ({"qs"}) or packed nibbles ({"qs4"},
    q4_0/q4_1, mins folded in-kernel); returns None when the fused kernel
    does not apply (caller falls back to two linear_at calls)."""
    if not _fused_mlp_enabled():
        return None
    if "b" in gu or "b" in dn:
        return None
    K = x.shape[-1]
    packed = "qs4" in gu and "qs4" in dn
    if packed:
        sym = "mins" not in gu and "mins" not in dn   # QA_Q4_SYM form
        if not sym and not ("mins" in gu and "mins" in dn):
            return None
        I = dn["qs4"].shape[1] * 2
        if K // gu["scales"].shape[1] != 32 or I // dn["scales"].shape[1] != 32:
            return None
        if jax.default_backend() in ("tpu", "axon") \
                and os.environ.get("QA_FUSED_MLP") is None \
                and not os.path.exists(_FUSED_MLP4_MARKER):
            return None
    else:
        if not ("qs" in gu and "qs" in dn):
            return None
        with_mins = "mins" in gu and "mins" in dn
        if ("mins" in gu) != ("mins" in dn):
            return None
        I = dn["qs"].shape[1]
        if K // gu["scales"].shape[1] != I // dn["scales"].shape[1]:
            return None
        if with_mins and jax.default_backend() in ("tpu", "axon") \
                and os.environ.get("QA_FUSED_MLP") is None \
                and not os.path.exists(_FUSED_MLP_M_MARKER):
            return None
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    if x2.shape[0] > 64:       # prefill: MXU-bound, launch count moot
        return None
    mode = group_matmul_mode()
    if mode == "int8":
        return None
    if packed and sym:
        from qwen2_audio_tpu.ops.fused_mlp import fused_mlp4_sym_stacked
        y = fused_mlp4_sym_stacked(x2, gu["qs4"], gu["scales"],
                                   dn["qs4"], dn["scales"], li,
                                   fast=mode == "bf16")
    elif packed:
        from qwen2_audio_tpu.ops.fused_mlp import fused_mlp4_stacked
        y = fused_mlp4_stacked(x2, gu["qs4"], gu["scales"], gu["mins"],
                               dn["qs4"], dn["scales"], dn["mins"], li,
                               fast=mode == "bf16")
    elif with_mins:
        from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_m_stacked
        y = fused_mlp_m_stacked(x2, gu["qs"], gu["scales"], gu["mins"],
                                dn["qs"], dn["scales"], dn["mins"], li,
                                fast=mode == "bf16")
    else:
        from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_stacked
        y = fused_mlp_stacked(x2, gu["qs"], gu["scales"], dn["qs"],
                              dn["scales"], li, fast=mode == "bf16")
    return y.reshape(*lead, -1)


_FUSED_MLP_SPLIT_MARKER = "/tmp/qa_kernel_ok_fused_mlp_split"


def fused_mlp_split_at(x: jax.Array, g: dict, u: dict, dn: dict,
                       li: jax.Array) -> jax.Array | None:
    """One-launch SwiGLU for the SPLIT gate/up schema (canonical layers
    and TP shards — parallel/tp.py requires unfused weights, so the
    fused-schema kernel never engaged there; this entry closes that gap,
    VERDICT r3 weak #6). Returns None when the fused kernel does not
    apply and the caller should fall back to three linear_at calls."""
    if not _fused_mlp_enabled():
        return None
    if any("b" in w for w in (g, u, dn)):
        return None
    K = x.shape[-1]
    packed = all("qs4" in w for w in (g, u, dn))
    if packed:
        p_mins = [("mins" in w) for w in (g, u, dn)]
        if any(p_mins) != all(p_mins):   # sym form lacks mins everywhere
            return None
        I = dn["qs4"].shape[1] * 2
        if K // g["scales"].shape[1] != 32 or I // dn["scales"].shape[1] != 32:
            return None
        group = 32
    else:
        if not all("qs" in w for w in (g, u, dn)):
            return None
        mins = [("mins" in w) for w in (g, u, dn)]
        if any(mins) != all(mins):
            return None
        I = dn["qs"].shape[1]
        group = K // g["scales"].shape[1]
        if group != I // dn["scales"].shape[1]:
            return None
    if u.keys() != g.keys():
        return None
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    if x2.shape[0] > 64:       # prefill: MXU-bound, launch count moot
        return None
    mode = group_matmul_mode()
    if mode == "int8":
        return None
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and os.environ.get("QA_FUSED_MLP") is None \
            and not os.path.exists(_FUSED_MLP_SPLIT_MARKER):
        return None
    from qwen2_audio_tpu.ops.fused_mlp import (fused_mlp_split_stacked,
                                               pick_block_i)
    kdiv = 2 if packed else 1
    bi = pick_block_i(I, group)
    # whole-I fallback blocks can blow the Mosaic scoped-VMEM budget
    # (~16 MB stack limit; the shipping block_i=256 keeps weight blocks
    # ~5.5 MB) — refuse rather than risk a failed remote compile
    # (unvalidated Mosaic compiles have wedged the tunnel, CLAUDE.md)
    D = dn["qs4" if packed else "qs"].shape[2]
    if (bi // kdiv) * D + (K // kdiv) * bi * 2 > 12 * 1024 * 1024:
        return None
    order = (("qs4", "scales", "mins") if "mins" in g
             else ("qs4", "scales")) if packed else \
        (("qs", "scales", "mins") if "mins" in g else ("qs", "scales"))
    leaves = tuple(tuple(w[k] for k in order) for w in (g, u, dn))
    y = fused_mlp_split_stacked(x2, *leaves, li, packed=packed,
                                fast=mode == "bf16")
    return y.reshape(*lead, -1)


def linear_at(x: jax.Array, p: dict, li: jax.Array) -> jax.Array:
    """Layer-stacked linear: every leaf of ``p`` carries a leading
    (n_layers,) axis and ``li`` (traced int32 scalar) selects the layer.

    Why not slice-then-linear (what lax.scan over stacked params does):
    XLA fuses a dynamic-slice into its own dot_general, but a Pallas
    custom-call operand must be MATERIALIZED — scan-sliced quant weights
    cost a full per-layer HBM copy every decode step (measured 2.2x layer
    time on 7B q8_0). Quant forms therefore route to the scalar-prefetch
    stacked kernels (layer chosen inside the BlockSpec index map, zero
    copies); dense and w8a8 forms slice normally because their XLA dots
    fuse the slice. ≙ ggml-cuda reading each layer's tensor in place from
    the model buffer (ggml_cuda_mul_mat, ggml/src/ggml-cuda.cu:1882)."""
    def at(a):
        return jax.lax.dynamic_index_in_dim(a, li, keepdims=False)

    if "qs8" in p:
        y = _w8a8(x, {"qs8": at(p["qs8"]), "scale_n": at(p["scale_n"])})
    elif "qs4b" in p:
        # word-packed sym q4_0 (Q4Form.b32): packed-domain unpack feeding
        # s8 MXU dots — the stream-ceiling form (ops/quant_matmul_q4b.py)
        from qwen2_audio_tpu.ops.quant_matmul_q4b import \
            quant_linear_q4b_stacked
        y = quant_linear_q4b_stacked(x, p, li)
    elif "qs_p" in p or "qs4_p" in p or "qs4" in p or "qs" in p:
        mode = group_matmul_mode()
        if "qs_p" not in p and "qs4_p" not in p and mode == "int8" \
                and x.shape[-1] // p["scales"].shape[1] == 32:
            if _int8_stacked_ok():
                # scalar-prefetch stacked exact kernel: zero weight
                # copies (the 2.2x scan-slice tax, CLAUDE.md), and the
                # packed-nibble form streams at half the int8 bytes
                from qwen2_audio_tpu.ops.quant_matmul_int8 import \
                    quant_linear_int8_stacked
                y = quant_linear_int8_stacked(x, p, li)
            elif "qs" in p:
                # unvalidated host: pay the slice copy on the old kernel
                y = quant_linear_int8(x, {k: at(v) for k, v in p.items()
                                          if k != "b"})
            else:
                y = quant_linear_stacked(x, p, li, fast=False)
        else:
            y = quant_linear_stacked(x, p, li, fast=mode == "bf16")
    else:
        y = x @ at(p["w"]).astype(x.dtype)
    if "b" in p:
        y = y + at(p["b"]).astype(y.dtype)
    return y


def linear(x: jax.Array, p: dict) -> jax.Array:
    if "qs8" in p:
        y = _w8a8(x, p)
    elif "qs4b" in p:
        # word-packed sym q4_0 (Q4Form.b32) — see linear_at
        from qwen2_audio_tpu.ops.quant_matmul_q4b import quant_linear_q4b
        y = quant_linear_q4b(x, p)
    elif "qs_p" in p or "qs4_p" in p:
        # contiguous-panel storage of the ggml-block form (decode HBM
        # streaming; see ops/quant_matmul.py panel section)
        y = quant_linear_panel(x, p, fast=group_matmul_mode() == "bf16")
    elif "qs4" in p:
        # true-4-bit packed nibbles (half the HBM read of the int8 form);
        # the f32-exactness modes apply the same way
        y = quant_linear4(x, p, fast=group_matmul_mode() == "bf16")
    elif "qs" in p:
        mode = group_matmul_mode()
        # the exact-int8 kernel is built around 32-deep group dots; the
        # per-16-group k-quants (q2_K/q3_K/q6_K) take the dequant kernels
        if mode == "int8" and x.shape[-1] // p["scales"].shape[0] == 32:
            y = quant_linear_int8(x, p)
        else:
            y = quant_linear(x, p, fast=mode == "bf16")
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
