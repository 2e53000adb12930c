"""Linear-layer dispatch: dense jnp matmul, the ggml-block Pallas kernel, or
the w8a8 int8-MXU fast path — selected by the parameter dict's keys:

    {"w"[, "b"]}                  dense
    {"qs", "scales"[, "b"]}       ggml q4_0/q8_0 blocks, bit-exact with files
    {"qs8", "scale_n"[, "b"]}     per-channel int8 weights + on-the-fly
                                  per-row int8 activations: the MXU runs a
                                  native int8 x int8 -> int32 matmul (2x bf16
                                  throughput, no in-kernel dequant) — the
                                  TPU analog of ggml's activation-quantizing
                                  mmq path (quantize_row_q8_1 + mmq.cuh)

This is the TPU analog of ggml's per-tensor-type matmul routing
(ggml_cuda_mul_mat, ggml/src/ggml-cuda.cu:1882-1946)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qwen2_audio_tpu.ops.quant_matmul import quant_linear


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


def linear(x: jax.Array, p: dict) -> jax.Array:
    if "qs8" in p:
        y = _w8a8(x, p)
    elif "qs" in p:
        y = quant_linear(x, p)
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
