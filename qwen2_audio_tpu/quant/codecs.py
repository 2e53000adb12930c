"""ggml-compatible block quantization codecs (numpy, vectorized).

Bit-exact re-implementations of the reference's scalar quantizers so that
checkpoints quantized here load into ggml (and vice versa) with identical
payload bytes:

- block layouts:  ggml/src/ggml-common.h:144-191 (q4_0/q8_0), :150-182 (q4_1/q5_x)
- quantizers:     ggml/src/ggml-quants.c quantize_row_{q4_0,q4_1,q5_0,q5_1,q8_0}_ref
- dequantizers:   ggml/src/ggml-quants.c dequantize_row_{...}

All formats share a 32-element group ("block") structure. Within a 4/5-bit
block the packing pairs element j with element j+16: low nibble = j,
high nibble = j+16; the 5th bits live in a little-endian uint32 ``qh``.

The dequantizers here are the *test oracles*; the hot path dequantizes inside
Pallas matmul kernels (qwen2_audio_tpu/ops/quant_matmul.py) from the same
packed arrays.
"""

from __future__ import annotations

import numpy as np

from qwen2_audio_tpu.config import GGMLType

QK = 32  # group size shared by all supported formats (QK4_0 == QK8_0 == 32)

# bytes per 32-element block, matching sizeof(block_*) with packed f16 scales
BLOCK_BYTES = {
    GGMLType.Q4_0: 2 + 16,          # f16 d + 16 nibble bytes
    GGMLType.Q4_1: 2 + 2 + 16,      # f16 d + f16 m + 16 nibble bytes
    GGMLType.Q5_0: 2 + 4 + 16,      # f16 d + u32 qh + 16 nibble bytes
    GGMLType.Q5_1: 2 + 2 + 4 + 16,  # f16 d + f16 m + u32 qh + 16 nibble bytes
    GGMLType.Q8_0: 2 + 32,          # f16 d + 32 int8
}


def _blocks(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if x.size % QK != 0:
        raise ValueError(f"size {x.size} not a multiple of group size {QK}")
    return x.reshape(-1, QK)


def _signed_absmax(xb: np.ndarray) -> np.ndarray:
    """Value with the largest |x| per block, first occurrence on ties —
    matches the C scan `if (amax < fabsf(v))`. An all-zero block keeps the
    C loop's +0.0 initializer even when the inputs are -0.0 (the strict <
    never fires), so force +0.0 there; otherwise d = max/-8 would flip the
    f16 scale's sign bit and break quantize∘dequantize idempotence."""
    a = np.abs(xb)
    idx = np.argmax(a, axis=1)
    rows = np.arange(xb.shape[0])
    maxv = xb[rows, idx]
    return np.where(a[rows, idx] == 0.0, np.float32(0.0), maxv)


def _trunc_u8(v: np.ndarray, cap: int) -> np.ndarray:
    """MIN(cap, (int8_t)(v)) for non-negative v: C truncates toward zero."""
    return np.minimum(cap, v.astype(np.int8)).astype(np.uint8)


# --------------------------------------------------------------------------- #
# quantize: float32 -> packed bytes
# --------------------------------------------------------------------------- #

def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    maxv = _signed_absmax(xb)
    d = maxv / -8.0
    inv = np.where(d != 0.0, np.float32(1.0) / d, 0.0).astype(np.float32)
    q = _trunc_u8(xb * inv[:, None] + np.float32(8.5), 15)
    packed = q[:, :16] | (q[:, 16:] << 4)
    out = np.empty((xb.shape[0], 18), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = packed
    return out.reshape(-1)


def quantize_q4_1(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / np.float32(15.0)
    inv = np.where(d != 0.0, np.float32(1.0) / d, 0.0).astype(np.float32)
    q = _trunc_u8((xb - mn[:, None]) * inv[:, None] + np.float32(0.5), 15)
    packed = q[:, :16] | (q[:, 16:] << 4)
    out = np.empty((xb.shape[0], 20), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 4:] = packed
    return out.reshape(-1)


def _pack_qh(q: np.ndarray) -> np.ndarray:
    """Collect bit 4 of all 32 values into a little-endian uint32 per block."""
    bits = ((q >> 4) & 1).astype(np.uint32)  # (nb, 32)
    shifts = np.arange(32, dtype=np.uint32)
    qh = (bits << shifts[None, :]).sum(axis=1, dtype=np.uint32)
    return qh


def quantize_q5_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    maxv = _signed_absmax(xb)
    d = maxv / -16.0
    inv = np.where(d != 0.0, np.float32(1.0) / d, 0.0).astype(np.float32)
    q = _trunc_u8(xb * inv[:, None] + np.float32(16.5), 31)
    packed = (q[:, :16] & 0x0F) | ((q[:, 16:] & 0x0F) << 4)
    qh = _pack_qh(q)
    out = np.empty((xb.shape[0], 22), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:6] = qh.view(np.uint8).reshape(-1, 4)
    out[:, 6:] = packed
    return out.reshape(-1)


def quantize_q5_1(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / np.float32(31.0)
    inv = np.where(d != 0.0, np.float32(1.0) / d, 0.0).astype(np.float32)
    # note: the reference applies no MIN cap here ((uint8_t)(x0 + 0.5f))
    q = ((xb - mn[:, None]) * inv[:, None] + np.float32(0.5)).astype(np.uint8)
    packed = (q[:, :16] & 0x0F) | ((q[:, 16:] & 0x0F) << 4)
    qh = _pack_qh(q)
    out = np.empty((xb.shape[0], 24), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = qh.view(np.uint8).reshape(-1, 4)
    out[:, 8:] = packed
    return out.reshape(-1)


def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    amax = np.abs(xb).max(axis=1)
    d = amax / np.float32(127.0)
    inv = np.where(d != 0.0, np.float32(1.0) / d, 0.0).astype(np.float32)
    # roundf = round half away from zero (not banker's rounding)
    scaled = xb * inv[:, None]
    q = np.sign(scaled) * np.floor(np.abs(scaled) + np.float32(0.5))
    q = q.astype(np.int8)
    out = np.empty((xb.shape[0], 34), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


# --------------------------------------------------------------------------- #
# dequantize: packed bytes -> float32
# --------------------------------------------------------------------------- #

def _unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """(nb, 16) packed bytes -> (nb, 32) nibble values, j / j+16 layout."""
    lo = (packed & 0x0F).astype(np.int32)
    hi = (packed >> 4).astype(np.int32)
    return np.concatenate([lo, hi], axis=1)


def _unpack_qh(qh_bytes: np.ndarray) -> np.ndarray:
    """(nb, 4) bytes -> (nb, 32) fifth-bit values (0 or 16)."""
    qh = qh_bytes.copy().view(np.uint32).reshape(-1)  # little-endian
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((qh[:, None] >> shifts[None, :]) & 1).astype(np.int32)
    return bits << 4


def dequantize_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 18)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    q = _unpack_nibbles(b[:, 2:]) - 8
    return (q * d).astype(np.float32).reshape(-1)[:n]


def dequantize_q4_1(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 20)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    q = _unpack_nibbles(b[:, 4:])
    return (q * d + m).astype(np.float32).reshape(-1)[:n]


def dequantize_q5_0(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 22)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    q = _unpack_nibbles(b[:, 6:]) | _unpack_qh(b[:, 2:6])
    return ((q - 16) * d).astype(np.float32).reshape(-1)[:n]


def dequantize_q5_1(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 24)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    q = _unpack_nibbles(b[:, 8:]) | _unpack_qh(b[:, 4:8])
    return (q * d + m).astype(np.float32).reshape(-1)[:n]


def dequantize_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    b = raw.reshape(-1, 34)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    q = b[:, 2:].view(np.int8).astype(np.int32)
    return (q * d).astype(np.float32).reshape(-1)[:n]


_QUANTIZERS = {
    GGMLType.Q4_0: quantize_q4_0,
    GGMLType.Q4_1: quantize_q4_1,
    GGMLType.Q5_0: quantize_q5_0,
    GGMLType.Q5_1: quantize_q5_1,
    GGMLType.Q8_0: quantize_q8_0,
}

_DEQUANTIZERS = {
    GGMLType.Q4_0: dequantize_q4_0,
    GGMLType.Q4_1: dequantize_q4_1,
    GGMLType.Q5_0: dequantize_q5_0,
    GGMLType.Q5_1: dequantize_q5_1,
    GGMLType.Q8_0: dequantize_q8_0,
}


def quantize(x: np.ndarray, ttype: GGMLType) -> np.ndarray:
    """float32 array -> packed uint8 bytes in the given ggml block format."""
    return _QUANTIZERS[GGMLType(ttype)](x)


def dequantize(raw: np.ndarray, ttype: GGMLType, n: int | None = None) -> np.ndarray:
    """packed uint8 bytes -> flat float32 array of n elements."""
    ttype = GGMLType(ttype)
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    if n is None:
        n = raw.size // BLOCK_BYTES[ttype] * QK
    return _DEQUANTIZERS[ttype](raw, n)


def type_size_bytes(ttype: GGMLType, n_elements: int) -> int:
    """Total storage bytes for n_elements in the given format."""
    ttype = GGMLType(ttype)
    if ttype == GGMLType.F32:
        return 4 * n_elements
    if ttype in (GGMLType.F16, GGMLType.BF16):
        return 2 * n_elements
    if ttype in BLOCK_BYTES:
        if n_elements % QK:
            raise ValueError(f"{n_elements} not a multiple of {QK}")
        return n_elements // QK * BLOCK_BYTES[ttype]
    raise ValueError(f"unsupported ggml type {ttype}")
