"""Device mesh + sharding rules.

Replaces the reference's entire distribution stack with jax.sharding/GSPMD:
- multi-backend graph scheduler (ggml/src/ggml-backend.cpp:1572, 2065) ->
  XLA partitioner over a named Mesh;
- CUDA split-buffer row sharding of weights across GPUs
  (ggml-cuda.cu:1358 op_mul_mat multi-device loop — the only true tensor
  parallelism in the reference) -> tensor-parallel PartitionSpecs over the
  'tp' axis with XLA-inserted all-reduces riding ICI;
- RPC remote offload (ggml/src/ggml-rpc.cpp) -> multi-host DCN via
  jax.distributed (same Mesh API, out of scope for a single slice).

Axes:
    dp — data parallel (batch)
    tp — tensor parallel (attention heads / ffn hidden)

Sharding rules (Megatron-style, one all-reduce per block):
    column-parallel (out-dim sharded): q, k, v, gate, up, fc1, lm_head
    row-parallel (in-dim sharded):     o, down, fc2
    replicated: norms, embeddings, convs, positional tables
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_by_rules(params: Any, rules: list[tuple[str, P]]) -> Any:
    """Leaf-wise PartitionSpec assignment by path regex; first match wins,
    default fully replicated. Specs are padded with None to the leaf rank
    from the LEFT for stacked-layer leaves (leading L axis unsharded)."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def assign(path, leaf):
        s = _path_str(path)
        for pat, spec in compiled:
            if pat.search(s):
                ndim = np.ndim(leaf)
                if len(spec) < ndim:
                    spec = P(*([None] * (ndim - len(spec)) + list(spec)))
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(assign, params)


def decoder_param_spec(params: dict) -> Any:
    """Specs for models/qwen2_decoder.py stacked-layer params (dense or
    quantized): leading (L,...) axis replicated, Megatron col/row split."""
    return _spec_by_rules(params, [
        (r"layers/(q|k|v|gate|up)/(w|qs|qs8|qs4)$", P(None, "tp")),
        (r"layers/(q|k|v|gate|up)/(scales|scale_n|mins)$", P(None, "tp")),
        (r"layers/(q|k|v)/b$", P("tp")),
        (r"layers/(o|down)/(w|qs|qs8|qs4)$", P("tp", None)),
        (r"layers/(o|down)/(scales|mins)$", P("tp", None)),
        (r"layers/(o|down)/scale_n$", P(None)),  # per-out-channel: replicated
        # lm_head leaves are UNSTACKED (no leading L): scale_n is rank-1
        # (V,) and column-splits directly; the 2-D leaves split on axis 1
        (r"lm_head/scale_n$", P("tp")),
        (r"lm_head/(w|qs|qs8|qs4|scales|mins)$", P(None, "tp")),
    ])


def encoder_param_spec(params: dict) -> Any:
    """Specs for models/encoder.py list-of-layers params."""
    return _spec_by_rules(params, [
        (r"layers/\d+/(q|k|v|qkv|fc1)/(w|qs|qs4|scales|mins)$",
         P(None, "tp")),
        (r"layers/\d+/(q|k|v|qkv|fc1)/b$", P("tp")),
        (r"layers/\d+/(o|fc2)/(w|qs|qs4|scales|mins)$", P("tp", None)),
    ])


def kv_cache_spec() -> Any:
    """KV cache (L, B, S, Hkv, d): batch over dp, kv heads over tp."""
    from qwen2_audio_tpu.models.qwen2_decoder import KVCache
    return KVCache(k=P(None, "dp", None, "tp", None),
                   v=P(None, "dp", None, "tp", None),
                   pos=P())


def quant_kv_cache_spec() -> Any:
    """Quantized cache: values (L,B,S,Hkv,d) and scales (L,B,S,Hkv) share
    the dp/tp layout."""
    from qwen2_audio_tpu.models.qwen2_decoder import QuantKVCache
    val = P(None, "dp", None, "tp", None)
    sc = P(None, "dp", None, "tp")
    return QuantKVCache(k_q=val, k_s=sc, v_q=val, v_s=sc, pos=P())


def named(mesh: Mesh, spec_tree: Any) -> Any:
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Any, spec_tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf onto its NamedSharding (PartitionSpec is a
    pytree leaf, so a plain two-tree map works)."""
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, spec_tree)
