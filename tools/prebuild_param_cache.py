#!/usr/bin/env python
"""Pre-build bench param caches HOST-SIDE (no TPU touch), fast.

Fresh hosts wipe ~/.cache/qwen2_audio_tpu/param_cache; rebuilding the 7B
bench cache used to cost 60-80 min (sequential ``rng.standard_normal`` at
~5 M elem/s on these 1-CPU hosts, then a full ggml quantization pass).
Synthetic bench weights do not need EITHER: the decode benchmark's cost
is a function of shapes/dtypes/layout only, so this tool synthesizes the
quantized device layout DIRECTLY — random packed nibbles straight from a
fast bit generator plus random nonzero group scales — and never
materializes float weights at all. 7B builds in ~2-4 min, dominated by
the .npz disk write.

Layout synthesized (the q4_0 symmetric packed form, f32 scales, no mins —
exactly what quantize_decoder_params emits under the production TPU
defaults): {"qs4": (K/2, N) u8, "scales": (K//32, N) f32} per linear,
stacked over layers; dense bf16 embed/biases; f32 norm ones. The int8
nibble-stream variant is a dtype VIEW of the same bytes (derived file,
never re-synthesized). A structural self-check against the exact
quantize pipeline runs on the tiny preset every time (shapes, dtypes,
tree keys), so layout drift in qparams.py fails this tool loudly instead
of silently mis-shaping the 7B cache.

No ambient env is read on the default path — the layout is pinned by
construction (the setdefault-vs-filename hazard is gone). ``--exact``
keeps the old quantizer-roundtrip build for caches that must contain
real q4_0-coded values; it HARD-assigns the env pins.

Run with:  env -u PALLAS_AXON_POOL_IPS python -u tools/prebuild_param_cache.py 7b
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

QK = 32


def _gen(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.SFC64(seed))


def _rand_u8(g: np.random.Generator, *shape: int) -> np.ndarray:
    n = int(np.prod(shape))
    return np.frombuffer(g.bytes(n), np.uint8).reshape(shape)


def _rand_f32(g: np.random.Generator, shape, scale: float) -> np.ndarray:
    """Uniform(-scale, scale) from raw bits: (u32>>9)|1.0f is uniform in
    [1, 2); subtract 1.5 and rescale. One bit-op pass per element — orders
    of magnitude faster than standard_normal on this host, and synthetic
    bench weights only need bounded nonzero values, not Gaussians."""
    n = int(np.prod(shape))
    u = np.frombuffer(g.bytes(4 * n), np.uint32)
    f = ((u >> np.uint32(9)) | np.uint32(0x3F800000)).view(np.float32)
    return ((f - np.float32(1.5)) * np.float32(2.0 * scale)).reshape(shape)


def _rand_bf16(g: np.random.Generator, shape, scale: float) -> np.ndarray:
    import ml_dtypes
    return _rand_f32(g, shape, scale).astype(ml_dtypes.bfloat16)


def _rand_scales(g: np.random.Generator, shape) -> np.ndarray:
    """Group scales: uniform magnitude in [0.001, 0.005], never zero —
    the magnitude band a 0.02-std weight's q4_0 d=absmax/-8 lands in."""
    return np.float32(0.003) + _rand_f32(g, shape, 0.002)


def _qdict(g: np.random.Generator, *shape_kn: int) -> dict:
    """(..., K, N) linear -> symmetric packed-q4 dict (u8 nibbles, f32
    scales). Leading dims (the layer stack) pass through."""
    *lead, K, N = shape_kn
    return {
        "qs4": _rand_u8(g, *lead, K // 2, N),
        "scales": _rand_scales(g, (*lead, K // QK, N)),
    }


def synth_decoder_qtree(cfg, seed: int = 0) -> dict:
    """Direct synthesis of quantize_decoder_params(random_decoder_params(
    cfg, bf16, host=True), Q4_0, to_device=False) under the production
    packed/sym/f32-scale layout — same tree, shapes and dtypes, no float
    weights, no quantizer pass."""
    g = _gen(seed)
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    Nq = cfg.num_attention_heads * cfg.head_dim
    Nkv = cfg.num_key_value_heads * cfg.head_dim
    layers = {
        "ln1": {"w": np.ones((L, D), np.float32)},
        "q": {"b": _rand_bf16(g, (L, Nq), 0.02), **_qdict(g, L, D, Nq)},
        "k": {"b": _rand_bf16(g, (L, Nkv), 0.02), **_qdict(g, L, D, Nkv)},
        "v": {"b": _rand_bf16(g, (L, Nkv), 0.02), **_qdict(g, L, D, Nkv)},
        "o": _qdict(g, L, Nq, D),
        "ln2": {"w": np.ones((L, D), np.float32)},
        "gate": _qdict(g, L, D, I),
        "up": _qdict(g, L, D, I),
        "down": _qdict(g, L, I, D),
    }
    p = {"embed": _rand_bf16(g, (cfg.vocab_size, D), 0.02),
         "layers": layers, "ln_f": {"w": np.ones((D,), np.float32)}}
    if not cfg.tie_word_embeddings:
        p["lm_head"] = _qdict(g, D, cfg.vocab_size)
    return p


def _q8dict(g: np.random.Generator, *shape_kn: int) -> dict:
    """(..., K, N) linear -> q8_0 device dict under the TPU production
    form (i8 values, u16-stored f16 scale payloads — the marker-gated
    qmm_scu16 default that won the round-3 e2e A/B)."""
    *lead, K, N = shape_kn
    return {
        "qs": _rand_u8(g, *lead, K, N).view(np.int8),
        "scales": _rand_scales(g, (*lead, K // QK, N)
                               ).astype(np.float16).view(np.uint16),
    }


def synth_decoder_qtree_q8(cfg, seed: int = 0) -> dict:
    """q8_0 sibling of synth_decoder_qtree: same tree, {"qs","scales"}
    leaves in the u16-scale production layout."""
    g = _gen(seed)
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    Nq = cfg.num_attention_heads * cfg.head_dim
    Nkv = cfg.num_key_value_heads * cfg.head_dim
    layers = {
        "ln1": {"w": np.ones((L, D), np.float32)},
        "q": {"b": _rand_bf16(g, (L, Nq), 0.02), **_q8dict(g, L, D, Nq)},
        "k": {"b": _rand_bf16(g, (L, Nkv), 0.02), **_q8dict(g, L, D, Nkv)},
        "v": {"b": _rand_bf16(g, (L, Nkv), 0.02), **_q8dict(g, L, D, Nkv)},
        "o": _q8dict(g, L, Nq, D),
        "ln2": {"w": np.ones((L, D), np.float32)},
        "gate": _q8dict(g, L, D, I),
        "up": _q8dict(g, L, D, I),
        "down": _q8dict(g, L, I, D),
    }
    p = {"embed": _rand_bf16(g, (cfg.vocab_size, D), 0.02),
         "layers": layers, "ln_f": {"w": np.ones((D,), np.float32)}}
    if not cfg.tie_word_embeddings:
        p["lm_head"] = _q8dict(g, D, cfg.vocab_size)
    return p


def exact_build(cfg, quant: str = "q4_0"):
    """The original quantizer-roundtrip build (real ggml-coded values).
    Env pins are HARD-assigned: a stray exported QA_* must not silently
    change the payload form under the fixed cache filename."""
    pins = (("QA_PACK4", "1"), ("QA_Q4_SYM", "1"), ("QA_Q4_I8", "0"),
            ("QA_SCALE16", "0"), ("QA_SCALE_U16", "0")) \
        if quant == "q4_0" else \
           (("QA_SCALE16", "0"), ("QA_SCALE_U16", "1"))
    for k, v in pins:
        os.environ[k] = v
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
    rng = np.random.default_rng(0)
    p = random_decoder_params(rng, cfg, dtype=jnp.bfloat16, host=True)
    ttype = GGMLType.Q4_0 if quant == "q4_0" else GGMLType.Q8_0
    return quantize_decoder_params(p, ttype, to_device=False)


def _signature(tree, prefix=""):
    from qwen2_audio_tpu.io.param_cache import _flatten
    return {k: (v.shape, str(v.dtype)) for k, v in _flatten(tree).items()}


def selfcheck_tiny(quant: str = "q4_0") -> None:
    """Synth layout must match the exact pipeline's layout on tiny —
    loudly catches qparams.py layout drift before it mis-shapes 7B."""
    cfg = _cfg("tiny")
    synth = synth_decoder_qtree if quant == "q4_0" else \
        synth_decoder_qtree_q8
    want = _signature(exact_build(cfg, quant))
    got = _signature(synth(cfg))
    if want != got:
        only_w = {k: v for k, v in want.items() if got.get(k) != v}
        only_g = {k: v for k, v in got.items() if want.get(k) != v}
        raise SystemExit(f"LAYOUT DRIFT\n exact: {only_w}\n synth: {only_g}")
    print(f"tiny structural self-check vs exact pipeline ({quant}): OK",
          flush=True)


def _cfg(size: str):
    from tools.bench_decode import SIZES
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    h, inter, L, H, KV, dh, V = SIZES[size]
    return Qwen2DecoderConfig(
        vocab_size=V, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        head_dim=dh, tie_word_embeddings=False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("size", nargs="?", default="7b")
    ap.add_argument("--quant", default="q4_0", choices=("q4_0", "q8_0"),
                    help="payload format to synthesize (q4_0: packed sym "
                         "nibbles + derived i8 view; q8_0: i8 values + "
                         "u16 f16-bit scales, the TPU production form)")
    ap.add_argument("--exact", action="store_true",
                    help="old quantizer-roundtrip build (slow; real "
                         "ggml-coded values instead of random payloads)")
    ap.add_argument("--no-selfcheck", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # never open the tunnel

    from qwen2_audio_tpu.io.param_cache import cached_build, save_pytree
    from qwen2_audio_tpu.utils.cache import param_cache_dir

    if not args.no_selfcheck and not args.exact:
        selfcheck_tiny(args.quant)

    cfg = _cfg(args.size)
    cache = param_cache_dir()

    if args.quant == "q8_0":
        # bench_decode suffix on a TPU host with the qmm_scu16 marker
        q8_path = os.path.join(cache, f"bench-{args.size}-q8_0-scu16.npz")
        t0 = time.time()
        build8 = (lambda: exact_build(cfg, "q8_0")) if args.exact \
            else (lambda: synth_decoder_qtree_q8(cfg))
        cached_build(q8_path, build8)
        print(f"q8_0 cache ready in {time.time()-t0:.1f}s: {q8_path}",
              flush=True)
        z = np.load(q8_path, mmap_mode="r", allow_pickle=False)
        print(f"  {os.path.basename(q8_path)}: {len(z.files)} leaves, "
              f"{os.path.getsize(q8_path)/1e9:.2f} GB", flush=True)
        return 0

    sym_path = os.path.join(cache, f"bench-{args.size}-q4_0-sym.npz")
    i8_path = os.path.join(cache, f"bench-{args.size}-q4_0-q4i8-sym.npz")

    t0 = time.time()
    build = (lambda: exact_build(cfg)) if args.exact \
        else (lambda: synth_decoder_qtree(cfg))
    tree = cached_build(sym_path, build)
    print(f"sym cache ready in {time.time()-t0:.1f}s: {sym_path}",
          flush=True)

    if not os.path.exists(i8_path):
        def view_i8(node):
            if isinstance(node, dict):
                out = {k: view_i8(v) for k, v in node.items()}
                if "qs4" in out and out["qs4"].dtype == np.uint8:
                    out["qs4"] = np.asarray(out["qs4"]).view(np.int8)
                return out
            if isinstance(node, list):
                return [view_i8(v) for v in node]
            return node

        t0 = time.time()
        save_pytree(i8_path, view_i8(tree))
        print(f"i8 cache derived in {time.time()-t0:.1f}s: {i8_path}",
              flush=True)
    for p in (sym_path, i8_path):
        z = np.load(p, mmap_mode="r", allow_pickle=False)
        print(f"  {os.path.basename(p)}: {len(z.files)} leaves, "
              f"{os.path.getsize(p)/1e9:.2f} GB", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
