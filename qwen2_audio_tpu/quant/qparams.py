"""Device-side quantized weight construction.

Bridges the ggml block formats (quant/codecs.py) to the TPU kernel layout
(ops/quant_matmul.py): values are carried over BIT-EXACT from the ggml
blocks — (nibble-8)*d for q4_0, int8*d for q8_0 — so a checkpoint quantized
by ggml and loaded here produces identical dequantized weights, which is the
logits-parity requirement (BASELINE.md config #3).

Weight layout conversion: ggml stores torch [out, in] rows with 32-element
groups along `in`; the device layout is [in, out] with scales (in//32, out).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.io.ggml_format import GGMLTensor
from qwen2_audio_tpu.quant.codecs import QK

_INT4_SUPPORTED: bool | None = None


def _int4_supported() -> bool:
    """Probe once whether the active backend can hold int4 arrays (the axon
    TPU plugin raises a RecursionError in dispatch on int4 creation; CPU and
    standard TPU PJRT support it)."""
    global _INT4_SUPPORTED
    if _INT4_SUPPORTED is None:
        if not hasattr(jnp, "int4"):
            _INT4_SUPPORTED = False
        else:
            try:
                jnp.asarray(np.zeros((32, 32), np.int8), dtype=jnp.int4)
                _INT4_SUPPORTED = True
            except Exception:
                _INT4_SUPPORTED = False
    return _INT4_SUPPORTED


def _qs_dtype(narrow: bool):
    return jnp.int4 if (narrow and _int4_supported()) else jnp.int8


_PACK4_MARKER = "/tmp/qa_kernel_ok_qmm_q4p"


def _pack4_enabled() -> bool:
    """True-4-bit packed storage (two nibbles per HBM byte, in-kernel
    unpack — ops/quant_matmul.py::quant_matmul4). Env QA_PACK4=0/1
    overrides; default on when the kernel is hardware-validated on this
    host (marker) or the backend is CPU (interpret mode)."""
    import os
    env = os.environ.get("QA_PACK4")
    if env is not None:
        return env not in ("0", "false", "")
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return True
    return os.path.exists(_PACK4_MARKER)


_SCALE16_MARKER = "/tmp/qa_kernel_ok_qmm_sc16"


def _scale16_enabled() -> bool:
    """Store group scales as float16 where that is LOSSLESS — the formats
    whose device scale IS the block's f16 ``d`` payload (q4_0/q8_0/q5_0/
    q4_1/q5_1). Halves the scale HBM stream (scales are 1/8 of the qs
    bytes at group 32: ~6% of a q8_0 decode step's traffic); every kernel
    converts to f32 on read, so results are bit-identical. Formats whose
    device scale is a computed product (q4_K sub-scales, k-quant d*q) keep
    f32 — f16 would round them. ≙ ggml keeping d in f16 in the blocks
    themselves (ggml-common.h block_q8_0). Env QA_SCALE16=0/1 overrides;
    default on when hardware-validated (marker) or on CPU."""
    import os
    env = os.environ.get("QA_SCALE16")
    if env is not None:
        return env not in ("0", "false", "")
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return True
    return os.path.exists(_SCALE16_MARKER)


_SCALE_U16_MARKER = "/tmp/qa_kernel_ok_qmm_scu16"


def _scale_u16_enabled(packed4: bool = False) -> bool:
    """f16-scale storage as uint16 BIT PATTERNS, expanded to f32 inside the
    kernels with integer ops (ops/quant_matmul.py::scales_f32). Same
    lossless half-width HBM stream as _scale16_enabled, but it sidesteps
    this Mosaic build's rejection of f16 kernel operands ("Unsupported
    type in mosaic dialect: 'f16'"). Env QA_SCALE_U16=0/1 overrides;
    default on when hardware-validated (marker qmm_scu16). On CPU the
    plain-f16 path already defaults on (and is the preferred storage),
    so u16 stays opt-in there.

    ``packed4``: the scales feed a packed-nibble kernel, where the u16
    form is a measured e2e LOSS (7B q4_0 decode 96.6 tok/s u16 vs 101.9
    f32, r4 A/B; the q4 kernels are VPU-dequant-bound, so the in-kernel
    integer expansion of a stream 1/8 the nibble payload costs more than
    the halved scale bytes save). Default f32 there; the env override
    still wins both ways."""
    import os
    env = os.environ.get("QA_SCALE_U16")
    if env is not None:
        return env not in ("0", "false", "")
    if packed4:
        return False
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return os.path.exists(_SCALE_U16_MARKER)


_Q4SYM_MARKER = "/tmp/qa_kernel_ok_qmm_q4sym"


def _q4_sym_enabled() -> bool:
    """Symmetric packed q4_0: emit {"qs4","scales"} with NO mins leaf —
    the kernels dequantize (q-8)*d in the i32 domain (ggml's own
    dequantize_row_q4_0 formulation, unpack4_f32(off=8)). For q4_0 the
    folded mins array (-8*d) duplicates the scale stream byte for byte:
    at group 32 with f32 scales that is ~17% of the whole decode weight
    traffic (and the fused-MLP kernels stream it as full operands too).
    Env QA_Q4_SYM=0/1 overrides.  Default ON: the e2e A/B won (+6.3%,
    7B q4_0 --panel 105.6 -> 112.2 tok/s, r4 queue I), so per the
    round-3 gating rule the default may follow the measurement — on TPU
    still only once the qmm_q4sym marker proves the lowering on this
    host; off-TPU (CPU interpret, tests) unconditionally."""
    import os
    env = os.environ.get("QA_Q4_SYM")
    if env is not None:
        return env not in ("0", "false", "")
    import jax
    if jax.default_backend() in ("tpu", "axon"):
        return os.path.exists(_Q4SYM_MARKER)
    return True


@dataclasses.dataclass(frozen=True)
class Q4Form:
    """EXPLICIT payload form for the packed-q4 device layout.

    Every ambient default (env override, hardware-validation marker,
    backend) resolves into one of these ONCE, at resolve_q4_form(); code
    that builds payloads can pin the form explicitly instead of depending
    on process env or on which markers armed earlier in the same run —
    the silent-form hazard that twice broke the fused-MLP validation
    (docs/BENCH_NOTES.md r4e; VERDICT r4 weak #4).

    Fields: ``packed`` two-nibbles-per-byte storage ("qs4") vs strided
    int8 ("qs"); ``sym`` no-mins (q-8)*d q4_0 form; ``i8`` store the
    packed stream as int8 instead of uint8 (same bits); ``b32`` store the
    packed stream as int32 WORDS ("qs4b", 4 byte-rows per word — the
    stream-ceiling form consumed by ops/quant_matmul_q4b.py s8-dot
    kernels; sym-only); ``scale`` group scale storage, one of
    "f32" | "f16" | "u16".
    """
    packed: bool = True
    sym: bool = True
    i8: bool = False
    b32: bool = False
    scale: str = "f32"

    def __post_init__(self):
        if self.scale not in ("f32", "f16", "u16"):
            raise ValueError(f"Q4Form.scale must be f32|f16|u16, "
                             f"got {self.scale!r}")
        if self.b32 and not (self.packed and self.sym):
            raise ValueError("Q4Form.b32 requires packed symmetric q4_0 "
                             "(the word-packed kernel has no mins path)")

    def env(self) -> dict[str, str]:
        """The env pins that make a SUBPROCESS quantize in this form."""
        return {
            "QA_PACK4": "1" if self.packed else "0",
            "QA_Q4_SYM": "1" if self.sym else "0",
            "QA_Q4_I8": "1" if self.i8 else "0",
            "QA_Q4_B32": "1" if self.b32 else "0",
            "QA_SCALE16": "1" if self.scale == "f16" else "0",
            "QA_SCALE_U16": "1" if self.scale == "u16" else "0",
        }


def resolve_q4_form() -> Q4Form:
    """Resolve the ambient q4 payload form (env overrides, then hardware
    markers/backend defaults) into an explicit Q4Form — call once and
    thread the result; do not re-read ambient state per payload."""
    sym = _q4_sym_enabled()
    return Q4Form(
        packed=_pack4_enabled(),
        sym=sym,
        i8=_pack4_i8_enabled(),
        b32=sym and _pack4_b32_enabled(),
        scale=("f16" if _scale16_enabled()
               else "u16" if _scale_u16_enabled(packed4=True) else "f32"),
    )


@contextlib.contextmanager
def pinned_form(form: Q4Form):
    """Pin ``form``'s env for a code block, RESTORING prior values on exit
    (an unconditional pop would silently unset an operator-exported
    variable for the rest of the process — the mid-run drift hazard)."""
    import os
    pins = form.env()
    old = {k: os.environ.get(k) for k in pins}
    os.environ.update(pins)
    try:
        yield form
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def payload_form(qw: dict) -> str:
    """Canonical name of a quantized payload's form, derived from its
    STRUCTURE (keys + dtypes) — the one source of truth the kernels also
    dispatch on. Use this in validators/tests to assert the form instead
    of trusting whatever env produced it."""
    def _sc(a) -> str:
        return {"float32": "f32sc", "float16": "f16sc",
                "uint16": "u16sc"}.get(str(np.dtype(a.dtype)),
                                       f"{np.dtype(a.dtype)}sc")
    if "qs8" in qw:
        return "w8a8"
    if "qs4b" in qw:
        return "packed4-b32+sym+" + _sc(qw["scales"])
    for qkey, panel in (("qs4", False), ("qs4_p", True)):
        if qkey in qw:
            return "+".join((
                "packed4" + ("-panel" if panel else ""),
                "sym" if "mins" not in qw else "mins",
                "i8" if np.dtype(qw[qkey].dtype) == np.int8 else "u8",
                _sc(qw["scales_p" if panel else "scales"]),
            ))
    for qkey, panel in (("qs", False), ("qs_p", True)):
        if qkey in qw:
            return "+".join((
                "strided" + ("-panel" if panel else ""),
                "sym" if "mins" not in qw else "mins",
                _sc(qw["scales_p" if panel else "scales"]),
            ))
    raise ValueError(f"not a quantized payload: keys={sorted(qw)}")


_Q4I8_MARKER = "/tmp/qa_kernel_ok_qmm_q4i8"


def _pack4_i8_enabled(sym: bool | None = None) -> bool:
    """Store the packed-nibble stream as int8 instead of uint8 (same
    bits; unpack4_f32 masks after the shift so both decode identically).
    The sign-extended i8 widening path streams faster than u8
    zero-extension on the VPU.  Default ON for SYM payloads: the e2e A/B
    won (7B q4_0 --panel 112.2 -> 116.9 tok/s, r4 queue G; confirmed
    across the r5a grid — bn512 115.6, skip-gu 114.6, strided 112.4, all
    above every u8 cell), so per the round-3 gating rule the default
    follows the measurement — on TPU once the qmm_q4i8 marker proves the
    lowering on this host, off-TPU unconditionally.  Mins-carrying
    payloads (q4_1/q4_K) keep u8 by default — that combination is
    chip-validated but has no e2e A/B; Q4Form(i8=True) composes
    explicitly.  Env QA_Q4_I8=0/1 overrides both ways."""
    import os
    env = os.environ.get("QA_Q4_I8")
    if env is not None:
        return env not in ("0", "false", "")
    if sym is not None and not sym:
        return False
    import jax
    if jax.default_backend() in ("tpu", "axon"):
        return os.path.exists(_Q4I8_MARKER)
    return True


_Q4B_MARKER = "/tmp/qa_kernel_ok_qmm_q4b"


def _pack4_b32_enabled() -> bool:
    """Word-packed (int32) nibble stream consumed by the s8-dot kernels
    (ops/quant_matmul_q4b.py — packed-domain unpack, no per-byte widen).
    Default OFF everywhere: per the round-3 gating rule a variant may
    only auto-arm after it WINS an e2e A/B (fa_lite burned us);
    QA_Q4_B32=1 / Q4Form(b32=True) opts in explicitly."""
    import os
    env = os.environ.get("QA_Q4_B32")
    if env is not None:
        return env not in ("0", "false", "")
    return False


def _store_scales_np(s: np.ndarray, f16_exact: bool,
                     packed4: bool = False,
                     scale: str | None = None) -> np.ndarray:
    """Host-side scale storage: f32 by default; where the values are raw
    f16 block payloads (f16_exact), store half-width — as float16 when the
    backend can ingest it, else as the uint16 bit pattern (scales_f32
    expands in-kernel). Both are bit-lossless round-trips of the f32
    values decoded from the f16 payloads.

    ``scale``: explicit storage request (Q4Form.scale); None = ambient
    env/marker defaults. Half-width requests still require f16_exact —
    k-quant product scales are not f16 values and would round."""
    s = np.ascontiguousarray(s, dtype=np.float32)
    if scale is not None:
        if scale == "f16" and f16_exact:
            return s.astype(np.float16)
        if scale == "u16" and f16_exact:
            return s.astype(np.float16).view(np.uint16)
        return s
    if f16_exact and _scale16_enabled():
        return s.astype(np.float16)
    if f16_exact and _scale_u16_enabled(packed4=packed4):
        return s.astype(np.float16).view(np.uint16)
    return s


def pack4_device_weight(vals_unsigned: np.ndarray, scales: np.ndarray,
                        mins: np.ndarray | None, to_device: bool = True,
                        f16_exact: bool = False,
                        form: "Q4Form | None" = None) -> dict:
    """Unsigned nibbles (N, K) 0..15 + scales/mins (N, K//32) [torch
    layout] -> packed device dict {"qs4": (K/2, N) uint8, "scales",
    "mins"}. Byte g*16+j pairs values (g*32+j | g*32+j+16 << 4) along the
    input dim — ggml's own in-group nibble pairing (block_q4_0).

    ``f16_exact``: the scales are raw f16 block payloads, storable as
    float16 losslessly (_scale16_enabled). Mins stay f32: q4_0's folded
    -8*d and q4_K's computed mins are not f16 values."""
    vT = np.ascontiguousarray(vals_unsigned.T).astype(np.uint8)   # (K, N)
    K, N = vT.shape
    g = vT.reshape(K // QK, QK, N)
    packed = (g[:, :16] | (g[:, 16:] << 4)).reshape(K // 2, N)
    b32 = (form.b32 if form is not None else _pack4_b32_enabled()) \
        and mins is None
    if b32:
        # word-packed stream-ceiling form: 4 byte-rows per int32 word,
        # unpacked in the packed i32 domain by the s8-dot kernels
        # (ops/quant_matmul_q4b.py; sym-only — no mins path there)
        from qwen2_audio_tpu.ops.quant_matmul_q4b import pack_b32
        out = {
            "qs4b": np.ascontiguousarray(pack_b32(packed)),
            "scales": _store_scales_np(scales.T, f16_exact, packed4=True,
                                       scale=form.scale if form else None),
        }
        if to_device:
            out = {k: jnp.asarray(v) for k, v in out.items()}
        return out
    if form.i8 if form is not None else _pack4_i8_enabled():
        # same bits, int8 dtype: the kernels mask-after-shift so the
        # sign-extended widening decodes identically (q4z 'i8cast'
        # stream A/B hook — QA_Q4_I8=1)
        packed = packed.view(np.int8)
    out = {
        "qs4": np.ascontiguousarray(packed),
        "scales": _store_scales_np(scales.T, f16_exact, packed4=True,
                                   scale=form.scale if form else None),
    }
    if mins is not None:
        out["mins"] = np.ascontiguousarray(mins.T, dtype=np.float32)
    if to_device:
        out = {k: jnp.asarray(v) for k, v in out.items()}
    return out


def device_weight_from_arrays(q_values: np.ndarray, scales: np.ndarray,
                              narrow: bool, to_device: bool = True,
                              f16_exact: bool = False) -> dict:
    """q_values (N, K) ints, scales (N, K//group) — torch layout in, device out.

    ``to_device=False`` keeps numpy (callers that stack many layers first
    avoid 2x transient HBM and per-layer tunnel transfers).
    ``f16_exact``: scales are raw f16 block payloads (see
    _scale16_enabled) — float16 storage is lossless for them."""
    sc = _store_scales_np(scales.T, f16_exact)
    if not to_device:
        return {
            "qs": np.ascontiguousarray(q_values.T, dtype=np.int8),
            "scales": sc,
        }
    return {
        "qs": jnp.asarray(q_values.T, dtype=_qs_dtype(narrow)),
        "scales": jnp.asarray(sc),
    }


def _unpack_q4_0(raw: np.ndarray, n_rows: int, n_cols: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    b = raw.reshape(-1, 18)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)      # (nb,)
    lo = (b[:, 2:] & 0x0F).astype(np.int8) - 8
    hi = (b[:, 2:] >> 4).astype(np.int8) - 8
    vals = np.concatenate([lo, hi], axis=1)                      # (nb, 32)
    return (vals.reshape(n_rows, n_cols),
            d.reshape(n_rows, n_cols // QK))


def _unpack_q8_0(raw: np.ndarray, n_rows: int, n_cols: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    b = raw.reshape(-1, 34)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    vals = b[:, 2:].view(np.int8)
    return (vals.reshape(n_rows, n_cols),
            d.reshape(n_rows, n_cols // QK))


def _unpack_nibble_body(body: np.ndarray) -> np.ndarray:
    lo = (body & 0x0F).astype(np.int8)
    hi = (body >> 4).astype(np.int8)
    return np.concatenate([lo, hi], axis=1)           # j / j+16 layout


def _unpack_qh_bits(qh_bytes: np.ndarray) -> np.ndarray:
    qh = qh_bytes.copy().view(np.uint32).reshape(-1)
    shifts = np.arange(32, dtype=np.uint32)
    return (((qh[:, None] >> shifts[None, :]) & 1) << 4).astype(np.int8)


def _unpack_q4_1(raw, n_rows, n_cols):
    b = raw.reshape(-1, 20)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    vals = _unpack_nibble_body(b[:, 4:])              # 0..15
    return (vals.reshape(n_rows, n_cols), d.reshape(n_rows, n_cols // QK),
            m.reshape(n_rows, n_cols // QK))


def _unpack_q5_0(raw, n_rows, n_cols):
    b = raw.reshape(-1, 22)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    vals = (_unpack_nibble_body(b[:, 6:]) | _unpack_qh_bits(b[:, 2:6])) - 16
    return (vals.reshape(n_rows, n_cols).astype(np.int8),
            d.reshape(n_rows, n_cols // QK))


def _unpack_q5_1(raw, n_rows, n_cols):
    b = raw.reshape(-1, 24)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    vals = _unpack_nibble_body(b[:, 8:]) | _unpack_qh_bits(b[:, 4:8])  # 0..31
    return (vals.reshape(n_rows, n_cols), d.reshape(n_rows, n_cols // QK),
            m.reshape(n_rows, n_cols // QK))


def _unpack_q4_K(raw, n_rows, n_cols):
    """q4_K super-blocks -> the generic {vals 0..15, per-32-group scale,
    per-32-group (negative) min} form: within one 256 super-block the j-th
    32-subblock dequantizes as w = (d*sc_j)*q - (dmin*m_j), which is
    exactly the q4_1-style scale+min layout at group granularity 32."""
    from qwen2_audio_tpu.quant.codecs import _unpack_k4_scales
    b = raw.reshape(-1, 144)
    nb = b.shape[0]
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    dmin = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    sc, m = _unpack_k4_scales(b[:, 4:16])
    qs = b[:, 16:].reshape(nb, 4, 32)
    lo = (qs & 0xF).astype(np.int8)
    hi = (qs >> 4).astype(np.int8)
    vals = np.stack([lo, hi], axis=2).reshape(nb, 256)
    scales = d * sc.astype(np.float32)            # (nb, 8)
    mins = -(dmin * m.astype(np.float32))
    return (vals.reshape(n_rows, n_cols),
            scales.reshape(n_rows, n_cols // QK),
            mins.reshape(n_rows, n_cols // QK))


def _unpack_q5_K(raw, n_rows, n_cols):
    """q5_K super-blocks -> {vals 0..31, per-32-group scale, per-32-group
    (negative) min}: same q4_1-style form as q4_K with the 5th bit from
    qh (layout dequantize_row_q5_K, ggml-quants.c:2763)."""
    from qwen2_audio_tpu.quant.codecs import _unpack_k4_scales
    b = raw.reshape(-1, 176)
    nb = b.shape[0]
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    dmin = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    sc, m = _unpack_k4_scales(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:].reshape(nb, 4, 32)
    lo = (qs & 0xF).astype(np.int32)
    hi4 = (qs >> 4).astype(np.int32)
    shifts = (2 * np.arange(4))[None, :, None]
    bit_lo = ((qh[:, None, :] >> shifts) & 1).astype(np.int32)
    bit_hi = ((qh[:, None, :] >> (shifts + 1)) & 1).astype(np.int32)
    vals = np.stack([lo + (bit_lo << 4), hi4 + (bit_hi << 4)],
                    axis=2).reshape(nb, 256).astype(np.int8)
    scales = d * sc.astype(np.float32)            # (nb, 8)
    mins = -(dmin * m.astype(np.float32))
    return (vals.reshape(n_rows, n_cols),
            scales.reshape(n_rows, n_cols // QK),
            mins.reshape(n_rows, n_cols // QK))


def _unpack_q2_K(raw, n_rows, n_cols):
    """q2_K super-blocks -> {vals 0..3, per-16-group scale, per-16-group
    (negative) min}: w = (d*sc_g)*q - (dmin*m_g) per 16-element sub-block
    (layout dequantize_row_q2_K, ggml-quants.c:1979)."""
    b = raw.reshape(-1, 84)
    nb = b.shape[0]
    sc_bytes = b[:, 0:16]
    qs = b[:, 16:80].reshape(nb, 2, 2, 16)
    d = b[:, 80:82].copy().view(np.float16).astype(np.float32)
    dmin = b[:, 82:84].copy().view(np.float16).astype(np.float32)
    shifts = (2 * np.arange(4))[None, None, :, None, None]
    q2 = ((qs[:, :, None, :, :] >> shifts) & 3).astype(np.int8)
    vals = q2.reshape(nb, 256)
    scales = d * (sc_bytes & 0xF).astype(np.float32)     # (nb, 16)
    mins = -(dmin * (sc_bytes >> 4).astype(np.float32))
    return (vals.reshape(n_rows, n_cols),
            scales.reshape(n_rows, n_cols // 16),
            mins.reshape(n_rows, n_cols // 16))


def _unpack_q3_K(raw, n_rows, n_cols):
    """q3_K super-blocks -> {vals -4..3, per-16-group SIGNED scale}:
    w = (d*sc_g)*q, sc 6-bit signed (layout dequantize_row_q3_K,
    ggml-quants.c:2327)."""
    b = raw.reshape(-1, 110)
    nb = b.shape[0]
    hmask = b[:, 0:32].reshape(nb, 2, 16)
    qs = b[:, 32:96].reshape(nb, 2, 2, 16)
    sc_bytes = b[:, 96:108].astype(np.int32)
    d = b[:, 108:110].copy().view(np.float16).astype(np.float32)

    low = np.empty((nb, 16), np.int32)
    low[:, :8] = sc_bytes[:, :8] & 0xF
    low[:, 8:] = sc_bytes[:, :8] >> 4
    ks = np.arange(16)
    hi2 = (sc_bytes[:, 8 + (ks % 4)] >> (2 * (ks // 4))[None, :]) & 3
    sc = (low | (hi2 << 4)) - 32                          # (nb, 16) signed

    vals = np.empty((nb, 16, 16), np.int8)
    for g in range(16):
        c, j, h = g // 8, (g % 8) // 2, g % 2
        q2 = ((qs[:, c, h] >> (2 * j)) & 3).astype(np.int32)
        hb = ((hmask[:, h] >> (4 * c + j)) & 1).astype(np.int32)
        vals[:, g] = (q2 - np.where(hb == 1, 0, 4)).astype(np.int8)
    scales = d * sc.astype(np.float32)
    return (vals.reshape(n_rows, n_cols),
            scales.reshape(n_rows, n_cols // 16))


def _unpack_q6_K(raw, n_rows, n_cols):
    """q6_K super-blocks -> {vals -32..31, per-16-group SIGNED scale}:
    w = (d*sc_g)*q, sc int8 (layout dequantize_row_q6_K,
    ggml-quants.c:3026)."""
    b = raw.reshape(-1, 210)
    nb = b.shape[0]
    ql = b[:, 0:128].reshape(nb, 2, 64)
    qh = b[:, 128:192].reshape(nb, 2, 32)
    sc = b[:, 192:208].copy().view(np.int8).astype(np.float32)  # (nb, 16)
    d = b[:, 208:210].copy().view(np.float16).astype(np.float32)

    lo = ql & 0xF
    hi = ql >> 4
    q1 = (lo[:, :, :32] | (((qh >> 0) & 3) << 4)).astype(np.int32) - 32
    q2 = (lo[:, :, 32:] | (((qh >> 2) & 3) << 4)).astype(np.int32) - 32
    q3 = (hi[:, :, :32] | (((qh >> 4) & 3) << 4)).astype(np.int32) - 32
    q4 = (hi[:, :, 32:] | (((qh >> 6) & 3) << 4)).astype(np.int32) - 32
    vals = np.stack([q1, q2, q3, q4], axis=2).reshape(nb, 256)
    scales = d * sc
    return (vals.reshape(n_rows, n_cols).astype(np.int8),
            scales.reshape(n_rows, n_cols // 16))


def device_weight_from_ggml_tensor(t: GGMLTensor, to_device: bool = True,
                                   form: Q4Form | None = None) -> dict:
    """Quantized GGMLTensor (torch [out,in] shape) -> kernel dict, bit-exact.

    ``form``: explicit packed-q4 payload form; None resolves the ambient
    env/marker defaults ONCE here (resolve_q4_form) so the layout cannot
    drift mid-build if a marker arms or env changes between tensors.

    All five legacy formats share ``w = q*d (+ m)``: q4_0/q5_0 fold their
    offset into the integer values; q4_1/q5_1 carry a per-group min in a
    "mins" leaf that ops/quant_matmul.py adds as a rank-G correction term
    (≙ the m*sum term of ggml_vec_dot_q4_1_q8_1, ggml-quants.c). q4_K and
    q5_K reduce to the same form at 32-group granularity (super-block
    scale x 6-bit sub-scale). q2_K/q3_K/q6_K reduce to it at
    per-16-group granularity (the kernels derive group size from the
    scales' shape), so every format runs device-resident."""
    n_rows, n_cols = t.shape
    raw = np.asarray(t.raw)
    if form is None and t.ttype in (GGMLType.Q4_0, GGMLType.Q4_1,
                                    GGMLType.Q4_K):
        form = resolve_q4_form()
    if t.ttype == GGMLType.Q4_0:
        vals, d = _unpack_q4_0(raw, n_rows, n_cols)
        if form.packed:
            if form.sym:
                # symmetric form: NO mins leaf, kernels apply the -8
                # in-kernel ((q-8)*d — ggml's dequantize_row_q4_0)
                return pack4_device_weight(vals + 8, d, None,
                                           to_device=to_device,
                                           f16_exact=True, form=form)
            # w = (n-8)*d = n*d + (-8*d): the offset folds into the min
            # term, so the packed path shares one kernel with q4_1/q4_K
            return pack4_device_weight(vals + 8, d, -8.0 * d,
                                       to_device=to_device, f16_exact=True,
                                       form=form)
        return device_weight_from_arrays(vals, d, narrow=True,
                                         to_device=to_device,
                                         f16_exact=True)
    if t.ttype == GGMLType.Q8_0:
        vals, d = _unpack_q8_0(raw, n_rows, n_cols)
        return device_weight_from_arrays(vals, d, narrow=False,
                                         to_device=to_device,
                                         f16_exact=True)
    if t.ttype == GGMLType.Q5_0:
        vals, d = _unpack_q5_0(raw, n_rows, n_cols)
        return device_weight_from_arrays(vals, d, narrow=False,
                                         to_device=to_device,
                                         f16_exact=True)
    if t.ttype in (GGMLType.Q4_1, GGMLType.Q5_1, GGMLType.Q4_K,
                   GGMLType.Q5_K):
        unpack = {GGMLType.Q4_1: _unpack_q4_1, GGMLType.Q5_1: _unpack_q5_1,
                  GGMLType.Q4_K: _unpack_q4_K,
                  GGMLType.Q5_K: _unpack_q5_K}[t.ttype]
        vals, d, m = unpack(raw, n_rows, n_cols)
        f16ok = t.ttype in (GGMLType.Q4_1, GGMLType.Q5_1)  # raw f16 d;
        # the K formats' scales are super*sub products, not f16 payloads
        if t.ttype in (GGMLType.Q4_1, GGMLType.Q4_K) and form.packed:
            # both store unsigned nibbles 0..15 with w = n*d + m (the
            # unpackers already return m in +m form)
            return pack4_device_weight(vals, d, m, to_device=to_device,
                                       f16_exact=f16ok, form=form)
        out = device_weight_from_arrays(vals, d, narrow=False,
                                        to_device=to_device,
                                        f16_exact=f16ok)
        mins = np.ascontiguousarray(m.T, dtype=np.float32)
        out["mins"] = jnp.asarray(mins) if to_device else mins
        return out
    if t.ttype in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q6_K):
        # per-16-group sub-block formats: same {qs, scales[, mins]} form
        # with scale rows K//16 instead of K//32 — the kernels derive the
        # group size from the shapes (≙ all-format device residency of
        # ggml-cuda's vecdotq.cuh/mmq.cuh k-quant dots)
        if t.ttype == GGMLType.Q2_K:
            vals, d, m = _unpack_q2_K(raw, n_rows, n_cols)
        elif t.ttype == GGMLType.Q3_K:
            vals, d = _unpack_q3_K(raw, n_rows, n_cols)
            m = None
        else:
            vals, d = _unpack_q6_K(raw, n_rows, n_cols)
            m = None
        out = device_weight_from_arrays(vals, d, narrow=False,
                                        to_device=to_device)
        if m is not None:
            mins = np.ascontiguousarray(m.T, dtype=np.float32)
            out["mins"] = jnp.asarray(mins) if to_device else mins
        return out
    raise ValueError(f"unsupported device quant type {t.ttype}")


def quantize_array_for_device(w: np.ndarray, ttype: GGMLType,
                              to_device: bool = True,
                              form: Q4Form | None = None) -> dict:
    """Dense [in, out] float weight -> device quant dict (groups along in),
    using the ggml quantizers so values round-trip exactly through files.
    ``form`` pins the packed-q4 payload form explicitly (see Q4Form)."""
    from qwen2_audio_tpu.quant import codecs
    w = np.asarray(w, dtype=np.float32)
    K, N = w.shape
    raw = codecs.quantize(np.ascontiguousarray(w.T), ttype)  # rows = out
    t = GGMLTensor("_", (N, K), ttype, raw)
    return device_weight_from_ggml_tensor(t, to_device=to_device, form=form)


def fast_w8_from_array(w: np.ndarray, to_device: bool = True) -> dict:
    """Dense [in, out] float weight -> per-CHANNEL int8 ({"qs8","scale_n"})
    for the w8a8 MXU fast path. Not bit-compatible with ggml blocks (coarser
    scale granularity: per output channel instead of per 32-group); use the
    {"qs","scales"} form for logits parity, this one for peak decode
    throughput."""
    w = np.asarray(w, dtype=np.float32)
    s = np.abs(w).max(axis=0) / 127.0                      # (N,)
    inv = np.where(s > 0, 1.0 / s, 0.0).astype(np.float32)
    q = np.rint(w * inv[None, :]).astype(np.int8)
    if not to_device:
        return {"qs8": q, "scale_n": s.astype(np.float32)}
    return {"qs8": jnp.asarray(q), "scale_n": jnp.asarray(s, jnp.float32)}


def fast_w8_from_ggml_blocks(qw: dict) -> dict:
    """Re-quantize a ggml-block device weight to the per-channel fast form
    (dequantize -> per-channel int8)."""
    from qwen2_audio_tpu.ops.quant_matmul import dequantize_weight
    return fast_w8_from_array(np.asarray(dequantize_weight(qw)))


_DECODER_QUANT_KEYS = ("q", "k", "v", "o", "gate", "up", "down")
_ENCODER_QUANT_KEYS = ("q", "k", "v", "o", "fc1", "fc2")


def quantize_decoder_params(params: dict, ttype: GGMLType,
                            quantize_lm_head: bool = True,
                            mode: str = "ggml",
                            to_device: bool = True,
                            form: Q4Form | None = None) -> dict:
    """Replace the stacked decoder linears (L, K, N) with quantized dicts;
    biases/norms/embed stay dense.

    mode="ggml": {"qs": (L,K,N), "scales": (L,K//32,N)} — bit-exact with the
    ggml block format (logits parity).
    mode="fast": {"qs8": (L,K,N), "scale_n": (L,N)} — per-channel w8a8 for
    the int8 MXU path (peak decode throughput, ~2x coarser quantization).
    ``to_device=False`` keeps the quantized leaves as numpy — the form
    io/param_cache.py persists so a later process skips re-quantization.
    ``form``: explicit packed-q4 payload form; None resolves the ambient
    defaults ONCE up front so every layer gets the same form even if env
    or markers change mid-build.
    """
    if form is None and mode != "fast":
        form = resolve_q4_form()
    out = {k: v for k, v in params.items()}
    layers = dict(params["layers"])

    def quant_one(w2d, to_device=to_device):
        if mode == "fast":
            return fast_w8_from_array(w2d, to_device=to_device)
        return quantize_array_for_device(w2d, ttype, to_device=to_device,
                                         form=form)

    for key in _DECODER_QUANT_KEYS:
        entry = dict(layers[key])
        w = np.asarray(entry.pop("w"))           # (L, K, N)
        # quantize + stack on HOST, then one transfer per stacked leaf:
        # stacking device arrays doubles transient HBM (OOMed 7B on v5e)
        # and pays one tunnel round-trip per layer
        per_layer = [quant_one(w[i], to_device=False)
                     for i in range(w.shape[0])]
        for leaf in per_layer[0]:
            host = np.stack([d[leaf] for d in per_layer])
            if not to_device:
                entry[leaf] = host
            else:
                dt = (_qs_dtype(True) if leaf == "qs" and mode != "fast"
                      and per_layer[0][leaf].dtype == np.int8 else None)
                entry[leaf] = jnp.asarray(host) if dt is None \
                    else jnp.asarray(host, dtype=jnp.int8)
        layers[key] = entry
    out["layers"] = layers
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quant_one(np.asarray(params["lm_head"]["w"]))
    return out


def quantize_encoder_params(params: dict, ttype: GGMLType,
                            mode: str = "ggml",
                            form: Q4Form | None = None) -> dict:
    """Quantize the encoder's per-layer attention/MLP linears (conv stem,
    norms, pos embed stay dense — same skip set as the quantize tool).

    mode="ggml": bit-exact ggml block dicts (the reference's quantized
    encoder inference contract). mode="fast": per-channel w8a8 — the
    encoder is MXU-compute-bound at T=1500, so the native int8 MXU path
    (2x bf16 peak on v5e) trades ~2x coarser weight rounding for
    throughput, same trade as the decoder's w8a8 serving mode."""
    if form is None and mode != "fast":
        form = resolve_q4_form()
    out = {k: v for k, v in params.items()}
    new_layers = []
    for lyr in params["layers"]:
        nl = dict(lyr)
        for key in _ENCODER_QUANT_KEYS:
            entry = dict(lyr[key])
            w = np.asarray(entry.pop("w"))
            entry.update(fast_w8_from_array(w) if mode == "fast"
                         else quantize_array_for_device(w, ttype,
                                                        form=form))
            nl[key] = entry
        new_layers.append(nl)
    out["layers"] = new_layers
    return out
