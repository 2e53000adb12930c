"""Per-node inspection + cross-configuration comparison.

The reference's divergence-bisection tools are the scheduler eval-callback
(ggml_debug, src/qwen2-whisper.cpp:2215-2229) and
ggml_backend_compare_graph_backend (ggml/include/ggml-backend.h:291-294) —
run a graph, intercept every node, or run it on two backends and diff
per-node. The XLA analog: an un-jitted instrumented forward that returns
every named intermediate, plus a differ that reports the first node where
two runs diverge (e.g. f32 vs bf16, dense vs quantized, CPU vs TPU).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import WhisperHParams
from qwen2_audio_tpu.models.encoder import (_attention, _conv1d_mm, _gelu,
                                            _layer_norm)


def encoder_intermediates(
    params: dict,
    mel: jax.Array,
    hp: WhisperHParams,
    *,
    gelu_approximate: bool = False,
    compute_dtype: Any = jnp.float32,
    callback: Callable[[str, jax.Array], None] | None = None,
) -> dict[str, np.ndarray]:
    """Instrumented encoder forward: returns {node_name: activation}.

    Mirrors encoder_forward's math exactly (same helpers), eagerly, so every
    node can be inspected — the eval-callback equivalent. ``callback`` is
    invoked per node if given (return values are still collected).
    """
    from qwen2_audio_tpu.ops.linear import linear
    out: dict[str, np.ndarray] = {}

    def emit(name: str, val: jax.Array):
        out[name] = np.asarray(val)
        if callback is not None:
            callback(name, val)

    eps = hp.eps
    # im2col stem in (B, T, C) layout — same lowering as encoder_forward's
    # default stem="matmul" so per-node taps stay bit-identical to it
    x = jnp.swapaxes(mel.astype(compute_dtype), 1, 2)
    x = _gelu(_conv1d_mm(x, params["conv1"]["w"], params["conv1"]["b"], 1),
              gelu_approximate)
    emit("conv1", x)
    x = _gelu(_conv1d_mm(x, params["conv2"]["w"], params["conv2"]["b"], 2),
              gelu_approximate)
    emit("conv2", x)

    T = x.shape[1]
    x = x + params["pos"][:T].astype(compute_dtype)[None]
    emit("pos_add", x)

    for i, layer in enumerate(params["layers"]):
        h = _layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"], eps)
        emit(f"layer{i}.ln1", h)
        a = _attention(layer, h, hp.n_audio_head, use_flash=False)
        emit(f"layer{i}.attn", a)
        x = x + a
        h = _layer_norm(x, layer["ln2"]["w"], layer["ln2"]["b"], eps)
        h = _gelu(linear(h, layer["fc1"]), gelu_approximate)
        emit(f"layer{i}.fc1", h)
        x = x + linear(h, layer["fc2"])
        emit(f"layer{i}.out", x)

    # same matmul-pool lowering as encoder_forward (bit-parity of probes)
    _B, _T, _D = x.shape
    _pool = jnp.where(jnp.arange(_T)[:, None] // 2
                      == jnp.arange(_T // 2)[None, :],
                      jnp.asarray(0.5, x.dtype), jnp.asarray(0.0, x.dtype))
    x = jnp.einsum("btd,tu->bud", x, _pool,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    emit("avg_pool", x)
    x = _layer_norm(x, params["ln_post"]["w"], params["ln_post"]["b"], eps)
    emit("ln_post", x)
    return out


def compare_runs(
    a: dict[str, np.ndarray],
    b: dict[str, np.ndarray],
    rtol: float = 1e-3,
    atol: float = 1e-4,
) -> list[dict]:
    """Per-node diff of two intermediate captures; returns a report sorted
    in graph order with the max deviation per node (the
    compare_graph_backend analog)."""
    report = []
    for name in a:
        if name not in b:
            continue
        x, y = a[name].astype(np.float64), b[name].astype(np.float64)
        max_abs = float(np.max(np.abs(x - y))) if x.size else 0.0
        denom = np.maximum(np.abs(x), 1e-9)
        max_rel = float(np.max(np.abs(x - y) / denom)) if x.size else 0.0
        report.append({
            "node": name,
            "max_abs": max_abs,
            "max_rel": max_rel,
            "ok": bool(max_abs <= atol + rtol * float(np.max(np.abs(x)))),
        })
    return report


def first_divergence(report: list[dict]) -> str | None:
    for r in report:
        if not r["ok"]:
            return r["node"]
    return None
