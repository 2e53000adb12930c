"""Linear-layer dispatch: dense jnp matmul or the quantized Pallas kernel,
selected by the parameter dict's keys ({"w"[,"b"]} vs {"qs","scales"[,"b"]}).

This is the TPU analog of ggml's per-tensor-type matmul routing
(ggml_cuda_mul_mat, ggml/src/ggml-cuda.cu:1882-1946)."""

from __future__ import annotations

import jax

from qwen2_audio_tpu.ops.quant_matmul import quant_linear


def linear(x: jax.Array, p: dict) -> jax.Array:
    if "qs" in p:
        y = quant_linear(x, p)
    else:
        y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
