"""Qwen2-Audio encoder tower (the whisper-style encoder the reference runs).

Functional JAX re-design of the reference graph builders
(whisper_build_graph_conv src/qwen2-whisper.cpp:1892-1952 and
whisper_build_graph_encoder :1954-2203):

    mel(B, n_mels, 3000)
      -> conv1d(k3,s1,p1)+gelu -> conv1d(k3,s2,p1)+gelu   (:1912-1927)
      -> transpose + positional embedding                  (:2001-2005)
      -> N x pre-LN block { LN -> QKV (K un-biased :632) -> SDPA -> out-proj
                            -> residual -> LN -> fc1 -> gelu -> fc2 -> residual }
                                                           (:2014-2155)
      -> stride-2 average pool over time (1500 -> 750)     (:2160-2171)
      -> final layer-norm                                  (:2173-2181)
      -> (B, 750, n_state)

Differences from the reference by design (TPU-first):
- one jitted XLA program instead of two scheduler phases (:2250-2317);
- batch dimension is first-class (the reference is single-stream);
- attention runs as a fused flash-attention Pallas kernel on TPU when
  enabled, einsum otherwise (both bit-compatible within tolerance);
- weights are pre-transposed to [in, out] at load so the hot path has no
  transposes (ggml stores torch [out, in] and does y = W @ x per row).

Parameter pytree layout (all jnp arrays):

    {
      "conv1": {"w": (n_state, n_mels, 3), "b": (n_state,)},
      "conv2": {"w": (n_state, n_state, 3), "b": (n_state,)},
      "pos":   (n_audio_ctx, n_state),
      "layers": [ {
          "ln1": {"w","b"}, "q": {"w": (d,d), "b"}, "k": {"w"},
          "v": {"w","b"}, "o": {"w","b"},
          "ln2": {"w","b"}, "fc1": {"w": (d,4d), "b"}, "fc2": {"w": (4d,d), "b"},
      } x n_layer ],
      "ln_post": {"w","b"},
    }

Linear weights are [in, out]; ``x @ w + b``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.config import WhisperHParams

Params = dict[str, Any]


def _layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    """ggml_norm + scale/shift (reference :2018-2026); stats in f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def _gelu(x: jax.Array, approximate: bool) -> jax.Array:
    # ggml uses the tanh approximation through an f16 LUT (ggml/src/ggml.c
    # ggml_vec_gelu_f32); HF/torch Qwen2AudioEncoder uses exact erf gelu.
    return jax.nn.gelu(x, approximate=approximate)


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """(B, C_in, T) -> (B, C_out, T//stride); 'ph' padding = k//2 both sides
    (ggml_conv_1d_ph, ggml/src/ggml.c:6655-6663)."""
    k = w.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype) + b[None, :, None].astype(x.dtype)


def _unfold_time(x: jax.Array, k: int, stride: int) -> jax.Array:
    """(B, T, C) -> (B, T//stride, k*C): zero-pad k//2 both sides of time,
    stack the k taps tap-major (feature = tap*C + c) — the im2col lowering
    ggml_conv_1d itself uses (ggml/src/ggml.c:6635), expressed as static
    slices so XLA sees plain matmul operands instead of a convolution."""
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    T = x.shape[1]
    # slice each tap with the stride directly: building the stride-1
    # unfold and then slicing [::stride] would materialize 2x the rows
    return jnp.concatenate([xp[:, i:i + T:stride] for i in range(k)],
                           axis=-1)


def _conv1d_mm(x: jax.Array, w: jax.Array, b: jax.Array,
               stride: int) -> jax.Array:
    """(B, T, C_in) -> (B, T//stride, C_out): the conv stem as an im2col
    matmul. Same math as _conv1d (f32 accumulate, bias in compute dtype)
    but keeps the whole stem in the (B, T, C) layout the transformer uses —
    measured ~5.7x faster e2e than lax.conv on TPU, whose NCW custom-call
    layout poisons every downstream attention/matmul layout choice."""
    k = w.shape[-1]
    m = w.transpose(2, 1, 0).reshape(k * w.shape[1], w.shape[0])
    u = _unfold_time(x, k, stride)
    out = jnp.matmul(u, m.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype) + b[None, None, :].astype(x.dtype)


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array, n_head: int) -> jax.Array:
    """Plain softmax attention over (B, T, D) activations, non-causal.

    Matches the reference attention block (:2029-2116): Q pre-scaled by
    d_head^-0.5, K unscaled, plain softmax.
    """
    B, T, D = q.shape
    d_head = D // n_head
    q = q.reshape(B, T, n_head, d_head) * jnp.asarray(d_head, q.dtype) ** -0.5
    k = k.reshape(B, T, n_head, d_head)
    v = v.reshape(B, T, n_head, d_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, T, D)


def _attention(params: Params, x: jax.Array, n_head: int,
               use_flash: bool) -> jax.Array:
    from qwen2_audio_tpu.ops.linear import linear
    if "qkv" in params:
        # fused projection (fuse_encoder_qkv): one (d, 3d) matmul keeps
        # the MXU fed — measured 116 vs 88 TFLOPS over 3 separate d->d
        qkv = linear(x, params["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(x, params["q"])
        k = linear(x, params["k"])                # K has no bias (:632, :2037)
        v = linear(x, params["v"])
    if use_flash:
        from qwen2_audio_tpu.ops.flash_attention import flash_attention_encoder
        out = flash_attention_encoder(q, k, v, n_head)
    else:
        out = _sdpa(q, k, v, n_head)
    return linear(out, params["o"])


@functools.partial(
    jax.jit, static_argnames=("hp", "gelu_approximate", "use_flash",
                              "compute_dtype", "stem"))
def encoder_forward(
    params: Params,
    mel: jax.Array,
    hp: WhisperHParams,
    *,
    pos_offset: int = 0,
    gelu_approximate: bool = False,
    use_flash: bool = False,
    compute_dtype: Any = jnp.float32,
    stem: str = "matmul",
) -> jax.Array:
    """mel (B, n_mels, 2*n_ctx) -> encoder output (B, n_ctx//2, n_state).

    ``pos_offset`` mirrors the reference's e_pe iter-view (:1999-2005), used
    when evaluating a shrunken audio_ctx window. ``stem`` selects the conv
    stem lowering: "matmul" (im2col, default — keeps the program in (B,T,C)
    layout end to end) or "conv" (lax.conv, kept for A/B and debugging).
    """
    eps = hp.eps
    x = mel.astype(compute_dtype)

    if stem == "matmul":
        x = jnp.swapaxes(x, 1, 2)                  # (B, T, n_mels)
        x = _gelu(_conv1d_mm(x, params["conv1"]["w"], params["conv1"]["b"],
                             1), gelu_approximate)
        x = _gelu(_conv1d_mm(x, params["conv2"]["w"], params["conv2"]["b"],
                             2), gelu_approximate)
    else:
        x = _gelu(_conv1d(x, params["conv1"]["w"], params["conv1"]["b"], 1),
                  gelu_approximate)
        x = _gelu(_conv1d(x, params["conv2"]["w"], params["conv2"]["b"], 2),
                  gelu_approximate)
        x = jnp.swapaxes(x, 1, 2)                  # (B, T, n_state)
    T = x.shape[1]
    pos = jax.lax.dynamic_slice_in_dim(params["pos"], pos_offset * T, T, axis=0)
    x = x + pos.astype(compute_dtype)[None]

    from qwen2_audio_tpu.ops.linear import linear
    for layer in params["layers"]:
        h = _layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"], eps)
        x = x + _attention(layer, h, hp.n_audio_head, use_flash)
        h = _layer_norm(x, layer["ln2"]["w"], layer["ln2"]["b"], eps)
        h = _gelu(linear(h, layer["fc1"]), gelu_approximate)
        x = x + linear(h, layer["fc2"])

    # Qwen2-Audio stride-2 average pooler over time (:2160-2171), lowered
    # as an MXU matmul against a constant (T, T//2) half-sum operand: the
    # reshape-mean form makes XLA's layout assignment split the time dim
    # and the cost propagates back through the whole layer stack
    # (measured +1.6 ms/clip on chip; strided slices +0.4 ms; this form
    # +0.1 ms). Bit-exact vs mean in f32: x0*0.5 + x1*0.5 and
    # (x0 + x1)*0.5 each round exactly once to the same value.
    B, T, D = x.shape
    pool = jnp.where(jnp.arange(T)[:, None] // 2
                     == jnp.arange(T // 2)[None, :],
                     jnp.asarray(0.5, x.dtype), jnp.asarray(0.0, x.dtype))
    x = jnp.einsum("btd,tu->bud", x, pool,
                   preferred_element_type=jnp.float32).astype(x.dtype)

    return _layer_norm(x, params["ln_post"]["w"], params["ln_post"]["b"], eps)


def fuse_encoder_qkv(params: Params) -> Params:
    """Concatenate each layer's q/k/v projections into one fused "qkv"
    leaf dict (runtime transform — the CANONICAL schema everywhere else
    stays separate q/k/v, matching the reference's per-tensor layout and
    the checkpoint writers). Works for every weight form: dense "w",
    block "qs"/"qs4"/"scales"/"mins", per-channel "qs8"/"scale_n" — all
    concatenate along the output axis. K's missing bias (reference :632)
    becomes zeros in the fused bias."""
    import jax.numpy as _jnp

    def fuse_layer(lyr: dict) -> dict:
        q, k, v = lyr["q"], lyr["k"], lyr["v"]
        keys = set(q) | set(k) | set(v)
        fused = {}
        for leaf in keys - {"b"}:
            fused[leaf] = _jnp.concatenate(
                [_jnp.asarray(q[leaf]), _jnp.asarray(k[leaf]),
                 _jnp.asarray(v[leaf])], axis=-1)
        if "b" in q or "b" in v:
            n = _jnp.asarray(q.get("b", v["b"])).shape[-1]
            zeros = _jnp.zeros((n,), _jnp.asarray(q.get("b", v["b"])).dtype)
            fused["b"] = _jnp.concatenate(
                [_jnp.asarray(q["b"]) if "b" in q else zeros,
                 _jnp.asarray(k["b"]) if "b" in k else zeros,
                 _jnp.asarray(v["b"]) if "b" in v else zeros], axis=-1)
        out = {kk: vv for kk, vv in lyr.items() if kk not in ("q", "k", "v")}
        out["qkv"] = fused
        return out

    out = dict(params)
    out["layers"] = [fuse_layer(lyr) for lyr in params["layers"]]
    return out


def fingerprint(enc_out: np.ndarray, n: int = 20) -> str:
    """First-n-floats fingerprint matching whisper_print_emb_enc
    (src/qwen2-whisper.cpp:4191-4203): channels 0..n-1 of output frame 0."""
    vals = np.asarray(enc_out).reshape(-1, enc_out.shape[-1])[0, :n]
    return "".join(f" {v:.3f}" for v in vals)


# --------------------------------------------------------------------------- #
# parameter construction
# --------------------------------------------------------------------------- #

def random_encoder_params(rng: np.random.Generator, hp: WhisperHParams,
                          dtype=jnp.float32, scale: float = 0.02) -> Params:
    d, m = hp.n_audio_state, hp.n_mels

    def t(*shape):
        # generate in f32: f64 doubles host RAM and generation time, which
        # dominates big-model bench setup
        a = rng.standard_normal(shape, dtype=np.float32)
        a *= np.float32(scale)
        return jnp.asarray(a, dtype=dtype)

    def layer():
        return {
            "ln1": {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)},
            "q": {"w": t(d, d), "b": t(d)},
            "k": {"w": t(d, d)},
            "v": {"w": t(d, d), "b": t(d)},
            "o": {"w": t(d, d), "b": t(d)},
            "ln2": {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)},
            "fc1": {"w": t(d, 4 * d), "b": t(4 * d)},
            "fc2": {"w": t(4 * d, d), "b": t(d)},
        }

    return {
        "conv1": {"w": t(d, m, 3), "b": t(d)},
        "conv2": {"w": t(d, d, 3), "b": t(d)},
        "pos": t(hp.n_audio_ctx, d),
        "layers": [layer() for _ in range(hp.n_audio_layer)],
        "ln_post": {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)},
    }


def encoder_params_from_ggml(model_file, dtype=jnp.float32,
                             keep_quantized: bool = False) -> Params:
    """Build the param pytree from a parsed GGMLModelFile, pre-transposing
    linear weights from torch [out, in] to [in, out].

    Tensor names follow the HF-style map at src/qwen2-whisper.cpp:1603-1662.

    ``keep_quantized``: quantized layer weights stay in their block form as
    {"qs","scales"[,"mins"]} device dicts (bit-exact with the file payload)
    and run through the Pallas quant matmuls instead of being expanded to
    dense — all 10 ggml formats, incl. the per-16-group k-quants
    q2_K/q3_K/q6_K (group size derived from the scales' shape).
    """
    from qwen2_audio_tpu.config import GGMLType as _GT
    hp = model_file.hparams
    ts = model_file.tensors

    def get(name, transpose=False):
        arr = ts[name].to_f32()
        if transpose:
            arr = arr.T
        return jnp.asarray(np.ascontiguousarray(arr), dtype=dtype)

    def lin(prefix, bias=True):
        t = ts[prefix + ".weight"]
        if keep_quantized and t.ttype in (_GT.Q4_0, _GT.Q8_0, _GT.Q4_1,
                                          _GT.Q5_0, _GT.Q5_1, _GT.Q4_K,
                                          _GT.Q5_K, _GT.Q2_K, _GT.Q3_K,
                                          _GT.Q6_K):
            from qwen2_audio_tpu.quant.qparams import device_weight_from_ggml_tensor
            out = device_weight_from_ggml_tensor(t)
        else:
            out = {"w": get(prefix + ".weight", transpose=True)}
        if bias:
            out["b"] = get(prefix + ".bias")
        return out

    def ln(prefix):
        return {"w": get(prefix + ".weight"), "b": get(prefix + ".bias")}

    layers = []
    for i in range(hp.n_audio_layer):
        p = f"layers.{i}"
        layers.append({
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj", bias=False),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        })

    # conv biases are stored [n, 1] by the converter (convert-pt-to-ggml.py:299-301)
    return {
        "conv1": {"w": get("conv1.weight"),
                  "b": get("conv1.bias").reshape(-1)},
        "conv2": {"w": get("conv2.weight"),
                  "b": get("conv2.bias").reshape(-1)},
        "pos": get("embed_positions.weight"),
        "layers": layers,
        "ln_post": ln("layer_norm"),
    }
