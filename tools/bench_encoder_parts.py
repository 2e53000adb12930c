#!/usr/bin/env python
"""Encoder time decomposition + matmul-shape experiments for the RTF push.

Measures on the real chip (dispatch-chain methodology, CLAUDE.md):
  1. full encoder forward (the bench.py number)
  2. the same forward minus the conv stem (layers-only floor)
  3. the bare per-layer matmul set at M=1500 vs M=1536 (8-sublane pad)
  4. elementwise tax: LN + gelu + residual at (1500, 1280)

Run in the BACKGROUND on TPU; never kill.

    python -u tools/bench_encoder_parts.py [--chain 100]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def time_chain(step, params, x0, chain, rtt_s=0.030):
    """Weights are threaded as jit ARGUMENTS, never closed over: a
    closed-over device array becomes a program constant that serializes
    into the remote-compile request (CLAUDE.md — the 1.28 GB encoder
    param tree wedged this very tool for half an hour before 413ing)."""
    import jax.numpy as jnp
    _ = np.asarray(jnp.sum(step(params, x0)))       # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = x0
        for _i in range(chain):
            c = step(params, c)
        _ = np.asarray(jnp.sum(c if not isinstance(c, tuple) else c[0]))
        best = min(best, max(time.perf_counter() - t0 - rtt_s, 1e-9) / chain)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=100)
    ap.add_argument("--preset", default="qwen2-audio",
                    help="WHISPER_PRESETS key (use 'tiny' for CPU smoke)")
    ap.add_argument("--unroll", type=int, default=8,
                    help="in-jit repetitions for the sub-ms mm/ew sections")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        from qwen2_audio_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    from qwen2_audio_tpu.utils.watchdog import watchdog
    watchdog(3600.0, "bench_encoder_parts")

    from qwen2_audio_tpu.config import WHISPER_PRESETS
    from qwen2_audio_tpu.models.encoder import (encoder_forward,
                                                fuse_encoder_qkv,
                                                random_encoder_params)
    hp = WHISPER_PRESETS[args.preset]
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    params = fuse_encoder_qkv(random_encoder_params(rng, hp, dtype=dtype))
    use_flash = True
    print(f"backend={jax.default_backend()} layers={hp.n_audio_layer} "
          f"d={hp.n_audio_state} chain={args.chain}", flush=True)

    mel = jnp.asarray(rng.standard_normal(
        (1, hp.n_mels, 2 * hp.n_audio_ctx)) * 0.1, dtype)

    @jax.jit
    def full(p, c):
        out = encoder_forward(p, c, hp, use_flash=use_flash,
                              compute_dtype=dtype)
        return c + (jnp.sum(out) * 0).astype(c.dtype)

    sec = time_chain(full, params, mel, args.chain)
    print(f"full forward          {sec*1e3:8.2f} ms  "
          f"(RTF {30.0/sec:7.1f}x)", flush=True)

    # layers-only: skip conv+pos by feeding (B, 1500, d) directly
    from qwen2_audio_tpu.models import encoder as enc_mod
    x_t = jnp.asarray(rng.standard_normal(
        (1, hp.n_audio_ctx, hp.n_audio_state)) * 0.1, dtype)

    def layers_only_fn(params, x):
        from qwen2_audio_tpu.ops.linear import linear
        eps = hp.eps
        for layer in params["layers"]:
            h = enc_mod._layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"],
                                    eps)
            x = x + enc_mod._attention(layer, h, hp.n_audio_head, use_flash)
            h = enc_mod._layer_norm(x, layer["ln2"]["w"], layer["ln2"]["b"],
                                    eps)
            h = enc_mod._gelu(linear(h, layer["fc1"]), False)
            x = x + linear(h, layer["fc2"])
        return x

    @jax.jit
    def layers_only(p, c):
        out = layers_only_fn(p, c)
        return c + (jnp.sum(out) * 0).astype(c.dtype)

    sec_l = time_chain(layers_only, params, x_t, args.chain)
    print(f"layers only           {sec_l*1e3:8.2f} ms  "
          f"({sec_l*1e3/hp.n_audio_layer:6.3f} ms/layer; conv+pos+pool "
          f"overhead {1e3*(sec-sec_l):5.2f} ms)", flush=True)

    # stem decomposition: the full-vs-layers gap is conv1 + conv2 + pos add
    # + stride-2 pool + ln_post; measure each piece unrolled-in-jit so the
    # sub-ms sections don't drown in dispatch variance (CLAUDE.md)
    stem_params = {k: params[k] for k in ("conv1", "conv2", "pos",
                                          "ln_post")}

    def _unrolled(fn):
        @jax.jit
        def run(p, c):
            for _ in range(args.unroll):
                y = fn(p, c)
                c = c + (jnp.sum(y) * 0).astype(c.dtype)
            return c
        return run

    def stem_fn(p, c):
        x = jnp.swapaxes(c, 1, 2)
        x = enc_mod._gelu(enc_mod._conv1d_mm(
            x, p["conv1"]["w"], p["conv1"]["b"], 1), True)
        x = enc_mod._gelu(enc_mod._conv1d_mm(
            x, p["conv2"]["w"], p["conv2"]["b"], 2), True)
        return x + p["pos"].astype(x.dtype)[None]

    s = time_chain(_unrolled(stem_fn), stem_params, mel, args.chain) \
        / args.unroll
    print(f"stem (conv+pos)       {s*1e6:8.1f} us", flush=True)

    x3000 = jnp.asarray(rng.standard_normal(
        (1, 2 * hp.n_audio_ctx, hp.n_audio_state)) * 0.1, dtype)
    pieces = [
        ("conv1 (T=3000)", lambda p, c: enc_mod._gelu(enc_mod._conv1d_mm(
            jnp.swapaxes(c, 1, 2), p["conv1"]["w"], p["conv1"]["b"], 1),
            True), mel),
        ("conv2 (3000->1500)", lambda p, c: enc_mod._gelu(
            enc_mod._conv1d_mm(c, p["conv2"]["w"], p["conv2"]["b"], 2),
            True), x3000),
        ("pool+ln_post", lambda p, c: enc_mod._layer_norm(
            jnp.einsum("btd,tu->bud", c,
                       jnp.where(jnp.arange(c.shape[1])[:, None] // 2
                                 == jnp.arange(c.shape[1] // 2)[None, :],
                                 jnp.asarray(0.5, c.dtype),
                                 jnp.asarray(0.0, c.dtype)),
                       preferred_element_type=jnp.float32).astype(c.dtype),
            p["ln_post"]["w"], p["ln_post"]["b"], hp.eps), x_t),
    ]
    for name, fn, x0 in pieces:
        s = time_chain(_unrolled(fn), stem_params, x0, args.chain) \
            / args.unroll
        print(f"  {name:18s} {s*1e6:8.1f} us", flush=True)

    # bare attention op (the flash kernel exactly as the layer calls it)
    from qwen2_audio_tpu.ops.flash_attention import flash_attention_encoder

    @jax.jit
    def attn(x):
        c = x
        for _ in range(args.unroll):
            y = flash_attention_encoder(c, c, c, hp.n_audio_head)
            c = c + (jnp.sum(y) * 0).astype(c.dtype)
        return c

    s_a = time_chain(lambda _p, c: attn(c), None, x_t, args.chain) \
        / args.unroll
    print(f"flash attention       {s_a*1e6:8.1f} us/layer  "
          f"(x{hp.n_audio_layer} = {s_a*1e3*hp.n_audio_layer:6.2f} ms; "
          f"useful {4*hp.n_audio_ctx**2*hp.n_audio_state/s_a/1e12:5.1f} TF/s)",
          flush=True)

    # bare matmuls at M=1500 vs 1536
    d = hp.n_audio_state
    shapes = [("qkv", d, 3 * d), ("o", d, d), ("fc1", d, 4 * d),
              ("fc2", 4 * d, d)]
    for M in (hp.n_audio_ctx, 1536):
        total = 0.0
        for name, K, N in shapes:
            w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, dtype)
            x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, dtype)

            @jax.jit
            def mm(w, c):
                # UNROLL dots inside one jit: a single ~100 us dot per
                # dispatch drowns in tunnel RTT variance (CLAUDE.md);
                # the +0*sum carry defeats CSE between iterations
                for _ in range(args.unroll):
                    y = jnp.dot(c, w, preferred_element_type=jnp.float32
                                ).astype(c.dtype)
                    c = c + (jnp.sum(y) * 0).astype(c.dtype)
                return c

            s = time_chain(mm, w, x0, args.chain) / args.unroll
            fl = 2 * M * K * N
            total += s
            print(f"  mm M={M:4d} {name:4s} ({K:5d}x{N:5d}) "
                  f"{s*1e6:8.1f} us  {fl/s/1e12:6.1f} TF/s", flush=True)
        print(f"  -> per-layer matmul total M={M}: {total*1e3:6.3f} ms "
              f"(x{hp.n_audio_layer} = {total*1e3*hp.n_audio_layer:6.2f} ms)",
              flush=True)

    # elementwise tax at (1500, d)
    w_ln = jnp.ones((d,), dtype)
    b_ln = jnp.zeros((d,), dtype)

    @jax.jit
    def ew(wb, c):
        for _ in range(args.unroll):
            h = enc_mod._layer_norm(c, wb[0], wb[1], hp.eps)
            h = enc_mod._gelu(h, False)
            c = c + h * jnp.float32(1e-6).astype(c.dtype)  # keep magnitude
        return c

    s = time_chain(ew, (w_ln, b_ln), x_t, args.chain) / args.unroll
    print(f"LN+gelu+residual      {s*1e6:8.1f} us", flush=True)

    # gelu variants at the fc1-output shape (T, 4d) — the big elementwise
    # surface; decides whether a cheaper activation is worth a mode
    x_mlp = jnp.asarray(rng.standard_normal(
        (hp.n_audio_ctx, 4 * hp.n_audio_state)) * 0.1, jnp.bfloat16)
    variants = [
        ("gelu_erf", lambda t: jax.nn.gelu(t, approximate=False)),
        ("gelu_tanh", lambda t: jax.nn.gelu(t, approximate=True)),
        ("silu1702", lambda t: (t * jax.nn.sigmoid(1.702 * t))),
    ]
    for name, fn in variants:
        @jax.jit
        def act(_w, c, fn=fn):
            for _ in range(args.unroll):
                c = c + fn(c) * jnp.float32(1e-6).astype(c.dtype)
            return c

        s = time_chain(act, None, x_mlp, args.chain) / args.unroll
        print(f"  act {name:9s} (T, 4d) {s*1e6:8.1f} us  "
              f"(x2LN-shapes/layer ~ {s*1e3*hp.n_audio_layer:5.2f} ms "
              f"over {hp.n_audio_layer} layers)", flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
