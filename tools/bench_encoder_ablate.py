#!/usr/bin/env python
"""Encoder per-component ablation bench (round-3, VERDICT #9).

Times e2e encoder variants with pieces knocked out to decompose the
~0.93 ms/layer cost (qwen2-audio tower, d=1280, T=1500) into attention /
projection-matmul / norm+elementwise shares, plus stem-only and batched
runs. The ablated forward is a tool-local clone of
models/encoder.py::encoder_forward (kept honest by a parity assert on the
no-ablation config); ablations are not a product surface.

Timing: each forward is ~30 ms — far above tunnel dispatch jitter — so a
host-side dependent chain (x_{i+1} derived from y_i) with one final
readback is sufficient (CLAUDE.md methodology).

    python -u tools/bench_encoder_ablate.py [--chain 16] [--batch 1]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--preset", default="qwen2-audio")
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = preset)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        from qwen2_audio_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass

    from qwen2_audio_tpu.config import WHISPER_PRESETS
    from qwen2_audio_tpu.models.encoder import (
        _attention, _conv1d, _gelu, _layer_norm, encoder_forward,
        fuse_encoder_qkv, random_encoder_params)
    from qwen2_audio_tpu.ops.linear import linear
    from qwen2_audio_tpu.utils.watchdog import watchdog

    hp = WHISPER_PRESETS[args.preset]
    if args.layers:
        import dataclasses
        hp = dataclasses.replace(hp, n_audio_layer=args.layers)
    rng = np.random.default_rng(0)
    B = args.batch

    params = fuse_encoder_qkv(random_encoder_params(rng, hp,
                                                    dtype=jnp.bfloat16))
    mel0 = jnp.asarray(rng.standard_normal((B, hp.n_mels, 2 * hp.n_audio_ctx)),
                       jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("ablate",))
    def fwd(params, mel, ablate=()):
        """Clone of encoder_forward with knock-outs. ablate subsets:
        'attn' (skip attention+o entirely), 'mlp' (skip fc1/fc2),
        'ln' (identity layer norms), 'stem_matmul' (conv stem as im2col
        matmuls)."""
        eps = hp.eps
        x = mel
        if "stem_matmul" in ablate:
            # conv1 k3 s1 ph1 as one matmul over unfolded frames, then
            # conv2 k3 s2 ph1 likewise (stride via slicing)
            def unfold(v, k=3):
                # (B, C, T) -> (B, T, C*k) with zero pad k//2
                v = jnp.pad(v, ((0, 0), (0, 0), (1, 1)))
                cols = [v[:, :, i:i + v.shape[2] - 2] for i in range(3)]
                return jnp.concatenate(cols, axis=1).swapaxes(1, 2)
            w1 = params["conv1"]["w"]     # (C_out, C_in, 3)
            u = unfold(x)                 # (B, T, 3*C_in), tap-major
            # cols concat along the C axis -> feature j = tap*C_in + c,
            # so the matmul weight is w1[out, c, tap] reordered tap-major
            m1 = w1.transpose(2, 1, 0).reshape(-1, w1.shape[0])
            h = u @ m1 + params["conv1"]["b"]
            h = _gelu(h, False)
            h2 = h.swapaxes(1, 2)         # (B, C, T)
            w2 = params["conv2"]["w"]
            u2 = unfold(h2)[:, ::2]       # stride 2
            m2 = w2.transpose(2, 1, 0).reshape(-1, w2.shape[0])
            x = (_gelu(u2 @ m2 + params["conv2"]["b"], False)
                 ).swapaxes(1, 2)
        else:
            x = _gelu(_conv1d(x, params["conv1"]["w"], params["conv1"]["b"],
                              1), False)
            x = _gelu(_conv1d(x, params["conv2"]["w"], params["conv2"]["b"],
                              2), False)
        x = jnp.swapaxes(x, 1, 2)
        T = x.shape[1]
        x = x + params["pos"][:T].astype(x.dtype)[None]

        def ln(v, p):
            if "ln" in ablate:
                return v
            return _layer_norm(v, p["w"], p["b"], eps)

        for layer in params["layers"]:
            if "attn" not in ablate:
                h = ln(x, layer["ln1"])
                x = x + _attention(layer, h, hp.n_audio_head,
                                   "einsum_attn" not in ablate)
            if "mlp" not in ablate:
                h = ln(x, layer["ln2"])
                h = _gelu(linear(h, layer["fc1"]), False)
                x = x + linear(h, layer["fc2"])
        _T = x.shape[1]
        _pool = jnp.where(jnp.arange(_T)[:, None] // 2
                          == jnp.arange(_T // 2)[None, :],
                          jnp.asarray(0.5, x.dtype),
                          jnp.asarray(0.0, x.dtype))
        x = jnp.einsum("btd,tu->bud", x, _pool,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return _layer_norm(x, params["ln_post"]["w"], params["ln_post"]["b"],
                           eps)

    # parity guard: the clone must match the production forward
    ref = np.asarray(encoder_forward(params, mel0, hp, use_flash=True,
                                     compute_dtype=jnp.bfloat16),
                     np.float32)
    got = np.asarray(fwd(params, mel0), np.float32)
    err = np.abs(ref - got).max()
    assert err < 1e-2, f"clone drifted from encoder_forward: {err}"
    got_mm = np.asarray(fwd(params, mel0, ablate=("stem_matmul",)),
                        np.float32)
    # relative check, NON-fatal: different-but-valid bf16 accumulation
    # order in the im2col stem amplifies through a 32-layer tower; the
    # variant's timing is still meaningful unless it diverges wildly
    scale_ref = np.abs(ref).max() + 1e-6
    err_mm = np.abs(ref - got_mm).max() / scale_ref
    stem_mm_ok = err_mm < 0.1
    if not stem_mm_ok:
        print(f"WARNING: stem-as-matmul rel diff {err_mm:.2e} — variant "
              "skipped", flush=True)
    print(f"parity ok (max diff {err:.2e}, stem-mm rel {err_mm:.2e})",
          flush=True)

    def timeit(tag, ablate):
        cancel = watchdog(1800.0, f"enc:{tag}")
        try:
            y = fwd(params, mel0, ablate=ablate)
            jax.block_until_ready(y)          # warm/compile
            t0 = time.perf_counter()
            m = mel0
            for _ in range(args.chain):
                y = fwd(params, m, ablate=ablate)
                # data-dependent chain: next input depends on y
                m = mel0 + jnp.broadcast_to(
                    y[:, :1, :1] * 1e-6, mel0.shape).astype(mel0.dtype)
            _ = np.asarray(y[0, 0, 0])
            sec = max(time.perf_counter() - t0 - 0.030, 1e-9) / args.chain
        except Exception as e:
            print(f"  {tag:28s} FAILED: {type(e).__name__}: {e}", flush=True)
            return None
        finally:
            cancel()
        rtf = 30.0 * B / sec
        print(f"  {tag:28s} {sec*1e3:8.2f} ms/call  RTF {rtf:7.1f}x",
              flush=True)
        return sec

    t_full = timeit("full", ())
    timeit("einsum-attn", ("einsum_attn",))
    t_noattn = timeit("no-attn", ("attn",))
    t_nomlp = timeit("no-mlp", ("mlp",))
    t_noln = timeit("no-ln", ("ln",))
    t_stemmm = timeit("stem-as-matmul", ("stem_matmul",)) if stem_mm_ok \
        else None
    t_stem = timeit("stem-only", ("attn", "mlp", "ln"))

    if t_full and t_noattn and t_nomlp and t_noln and t_stem:
        L = hp.n_audio_layer
        print(f"\ndecomposition over {L} layers (ms/layer):", flush=True)
        print(f"  attention+o : {(t_full - t_noattn) / L * 1e3:6.3f}")
        print(f"  mlp         : {(t_full - t_nomlp) / L * 1e3:6.3f}")
        print(f"  layer norms : {(t_full - t_noln) / L * 1e3:6.3f}")
        print(f"  stem+pool   : {t_stem * 1e3:6.2f} ms fixed")
        if t_stemmm:
            print(f"  stem-as-matmul delta: {(t_stemmm - t_full) * 1e3:+6.2f}"
                  " ms", flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
