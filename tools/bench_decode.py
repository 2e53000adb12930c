#!/usr/bin/env python
"""Decode throughput benchmark: Qwen2 tokens/sec/chip with the on-device
generation loop (BASELINE: q8_0 decode beating ggml-CUDA on A100).

    python tools/bench_decode.py [--size 7b|1.5b|0.5b|tiny] [--quant q8_0|q4_0|none]
                                 [--batch B] [--new N] [--prefill T]

Methodology: one generate_on_device call emits N tokens under a single
lax.while_loop; wall time is measured around the final readback, minus the
~30 ms tunnel RTT, after a warm-up call (compile excluded).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SIZES = {
    # (hidden, inter, layers, heads, kv_heads, head_dim, vocab)
    "7b": (3584, 18944, 28, 28, 4, 128, 152064),
    "1.5b": (1536, 8960, 28, 12, 2, 128, 151936),
    "0.5b": (896, 4864, 24, 14, 2, 64, 151936),
    "tiny": (256, 512, 4, 4, 2, 64, 1024),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1.5b", choices=SIZES)
    ap.add_argument("--quant", default="q8_0",
                    choices=["q8_0", "q4_0", "w8a8", "none"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = preset) — used to "
                         "decompose per-layer vs fixed per-step overhead "
                         "(run L and L/2, extrapolate)")
    ap.add_argument("--vocab", type=int, default=0,
                    help="override vocab size (0 = preset) — isolates the "
                         "lm_head + sampling share of the fixed per-step "
                         "cost (run V and V/16, extrapolate)")
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--prefill", type=int, default=64)
    ap.add_argument("--cache-dir", default=None,
                    help="device-layout param cache; '' disables; default "
                         "~/.cache/qwen2_audio_tpu/param_cache "
                         "(io/param_cache.py — skips re-quantization on "
                         "repeat runs, the 7B setup-time fix)")
    ap.add_argument("--kv", default="bf16", choices=["bf16", "q8"],
                    help="KV cache dtype (q8 = int8 cache consumed "
                         "directly by the decode attention)")
    ap.add_argument("--beam", type=int, default=0,
                    help="if > 0, run device-side beam search with this "
                         "beam width instead of greedy")
    ap.add_argument("--length-penalty", type=float, default=-1.0,
                    help="beam length penalty alpha (Google NMT form, "
                         "sampling.py::length_penalty_score; -1 = simple "
                         "length average ≙ whisper_full_params."
                         "length_penalty default)")
    ap.add_argument("--rep-penalty", type=float, default=1.0,
                    help="repetition penalty applied inside the device "
                         "beam step (≙ whisper's repeat-penalty params "
                         "surface, qwen2-whisper.h:359-437)")
    ap.add_argument("--suppress-to", type=int, default=0,
                    help="allow only the first N token ids (suppress-mask "
                         "the rest). With random weights this forces the "
                         "greedy sequence into a cycle, so --spec gets "
                         "real n-gram acceptance — measures the "
                         "accepted>1 regime at full model size")
    ap.add_argument("--spec", type=int, default=0,
                    help="if > 0, n-gram speculative decoding with this "
                         "many drafts per forward (B=1 greedy; exact "
                         "output, tok/s scales with the accept rate — "
                         "random-weight accept rates are whatever the "
                         "random argmax cycle gives, so treat the tok/s "
                         "as a mechanism cost check, not a claim)")
    ap.add_argument("--max-ctx", type=int, default=0,
                    help="cache capacity (default prefill+new+8). Set "
                         "larger to model the serving regime: capacity "
                         "sized for the worst case, streams mostly short "
                         "— where flash-decode's valid-prefix skipping "
                         "pays")
    ap.add_argument("--slots", action="store_true",
                    help="continuous-batching slot-pool decode over "
                         "--batch slots (decode_chunk_slots; with --spec "
                         "the batched-speculative variant). Reports "
                         "aggregate tok/s across slots")
    ap.add_argument("--chunk", type=int, default=16,
                    help="tokens per chunk call in --slots mode")
    ap.add_argument("--panel", action="store_true",
                    help="contiguous-panel weight storage for the "
                         "ggml-block kernels (quant_matmul_panel; one "
                         "contiguous HBM DMA per weight block)")
    ap.add_argument("--gmm", default="", choices=["", "bf16", "int8",
                                                  "dequant"],
                    help="group-matmul mode override (ops/linear.py "
                         "set_group_matmul_mode): int8 = exact s8xs8 MXU "
                         "dots with q8_1-style activation quant (ggml-mmq "
                         "analog), bf16 = dequant-to-bf16 single pass "
                         "(production default). Empty = auto")
    ap.add_argument("--no-fuse", action="store_true",
                    help="keep separate q/k/v and gate/up projections "
                         "(default: fuse_decoder_params — 7 -> 4 matmuls "
                         "per layer)")
    args = ap.parse_args()
    t_process0 = time.time()

    import jax
    import jax.numpy as jnp
    try:
        from qwen2_audio_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    from qwen2_audio_tpu.utils.watchdog import (ensure_kernel_validation,
                                                watchdog)
    # the deadline must budget TPU unresponsiveness only — a cold 7B host
    # param build alone takes ~30 min, so arm now (covers backend init)
    # and RE-ARM after the host build; exiting mid-upload on a deadline
    # sized for the whole run is exactly the wedge CLAUDE.md warns about
    wd_s = float(os.environ.get("BENCH_WATCHDOG_S", "1800"))
    cancel_wd = watchdog(wd_s, "bench_decode:init")

    from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
    from qwen2_audio_tpu.runtime.decoding import DecoderBundle
    from qwen2_audio_tpu.runtime.generate import (
        beam_search_device, greedy_decode_device)

    if args.gmm:
        from qwen2_audio_tpu.ops.linear import set_group_matmul_mode
        set_group_matmul_mode(args.gmm)   # before the first trace

    h, inter, L, H, KV, dh, V = SIZES[args.size]
    if args.layers:
        L = args.layers
    if args.vocab:
        V = args.vocab
    cfg = Qwen2DecoderConfig(
        vocab_size=V, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        head_dim=dh, tie_word_embeddings=False)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        ensure_kernel_validation()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"decode bench: {args.size} {args.quant} B={args.batch} "
          f"new={args.new} backend={jax.default_backend()}", file=sys.stderr)
    cancel_wd()                     # host-build phase: CPU-bound, unguarded

    rng = np.random.default_rng(0)
    t0 = time.time()
    if args.quant != "none" and on_tpu:
        marker = "/tmp/qa_kernel_ok_qmm_q8" if args.quant == "q8_0" \
            else "/tmp/qa_kernel_ok_qmm_q4"
        if not os.path.exists(marker):
            print(f"WARNING: {marker} missing — quant kernels unvalidated "
                  "on this host, composing anyway", file=sys.stderr)

    def build_host():
        # generate on HOST: a dense 7B bf16 pytree on device would OOM the
        # chip before quantization even starts
        p = random_decoder_params(rng, cfg, dtype=dtype,
                                  host=args.quant != "none")
        if args.quant == "w8a8":
            p = quantize_decoder_params(p, GGMLType.Q8_0, mode="fast",
                                        to_device=False)
        elif args.quant != "none":
            ttype = (GGMLType.Q8_0 if args.quant == "q8_0"
                     else GGMLType.Q4_0)
            p = quantize_decoder_params(p, ttype, to_device=False)
        return p

    if args.cache_dir is None:
        from qwen2_audio_tpu.utils.cache import param_cache_dir
        args.cache_dir = param_cache_dir()
    if args.quant != "none" and args.cache_dir:
        from qwen2_audio_tpu.io.param_cache import cached_build
        from qwen2_audio_tpu.quant.qparams import (_pack4_enabled,
                                                   _scale16_enabled,
                                                   _scale_u16_enabled)
        suffix = f"-L{L}" if args.layers else ""
        if args.vocab:
            suffix += f"-V{V}"
        packed4 = args.quant == "q4_0" and _pack4_enabled()
        if _scale16_enabled():
            suffix += "-sc16"    # scale dtype is part of the cached layout
        elif _scale_u16_enabled(packed4=packed4):
            suffix += "-scu16"
        if packed4:
            from qwen2_audio_tpu.quant.qparams import (_pack4_b32_enabled,
                                                       _pack4_i8_enabled,
                                                       _q4_sym_enabled)
            if _pack4_i8_enabled():
                suffix += "-q4i8"   # int8-stored nibble stream (QA_Q4_I8)
            if _q4_sym_enabled():
                suffix += "-sym"    # no-mins symmetric q4_0 (QA_Q4_SYM)
                if _pack4_b32_enabled():
                    suffix += "-b32"   # word-packed s8-dot form (QA_Q4_B32)
        path = os.path.join(args.cache_dir,
                            f"bench-{args.size}-{args.quant}{suffix}.npz")
        params = cached_build(path, build_host)
        print(f"host params ready in {time.time()-t0:.1f}s "
              f"(cache: {path})", file=sys.stderr)
    else:
        params = build_host()
        print(f"host params built in {time.time()-t0:.1f}s", file=sys.stderr)

    if not args.no_fuse:
        from qwen2_audio_tpu.models.qwen2_decoder import fuse_decoder_params
        params = fuse_decoder_params(params)   # host-side; pre-upload
    if args.panel:
        from qwen2_audio_tpu.models.qwen2_decoder import panelize_decoder_params
        params = panelize_decoder_params(params)  # host-side layout repack

    watchdog(wd_s, "bench_decode")  # re-arm for upload/compile/decode

    if args.quant != "none":
        # leaf-by-leaf upload: quantized leaves keep their exact dtypes
        # (scales/mins/scale_n MUST stay f32 for parity), dense float
        # leaves go to the compute dtype
        t0 = time.time()

        def upload(node):
            if isinstance(node, dict):
                if any(k in node for k in ("qs", "qs8", "qs_p", "qs4",
                                           "qs4_p")):
                    return {k: (jnp.asarray(v, dtype=dtype) if k == "b"
                                else jnp.asarray(v))
                            for k, v in node.items()}
                return {k: upload(v) for k, v in node.items()}
            if isinstance(node, list):
                return [upload(v) for v in node]
            if isinstance(node, np.ndarray):
                return (jnp.asarray(node, dtype=dtype)
                        if node.dtype.kind == "f" else jnp.asarray(node))
            return node

        params = upload(params)
        jax.block_until_ready(params)
        print(f"uploaded in {time.time()-t0:.1f}s", file=sys.stderr)

    bundle = DecoderBundle(
        cfg=cfg, params=params, proj_w=jnp.eye(h, dtype=dtype),
        proj_b=jnp.zeros(h, dtype=dtype), eos_token_id=-1,  # never emitted
        bos_tokens=[], post_audio_tokens=[],
        max_ctx=args.max_ctx or (args.prefill + args.new + 8),
        cache_dtype="q8" if args.kv == "q8" else dtype)

    sup_mask = None
    if args.suppress_to > 0:
        m = np.zeros((V,), np.float32)
        m[args.suppress_to:] = -np.inf
        sup_mask = jnp.asarray(m)

    def decode_once():
        if args.slots:
            # continuous-batching slot pool: --batch slots decode --new
            # tokens each in --chunk-sized rounds; --spec runs the
            # batched-speculative variant (decode_chunk_slots_spec)
            from qwen2_audio_tpu.models.qwen2_decoder import create_cache
            from qwen2_audio_tpu.runtime.generate import (
                decode_chunk_slots, decode_chunk_slots_spec, prefill_slot)
            B = args.batch
            S = bundle.max_ctx
            cache = create_cache(cfg, B, S, dtype=bundle.cache_dtype)
            slot_pos = jnp.zeros((B,), jnp.int32)
            slot_logits = jnp.zeros((B, V), jnp.float32)
            slot_active = jnp.zeros((B,), bool)
            for s in range(B):
                cache, slot_pos, slot_logits, slot_active = prefill_slot(
                    params, cfg, cache, slot_pos, slot_logits, slot_active,
                    jnp.int32(s), prefill[s:s + 1])
            hist = jnp.zeros((B, args.new + args.spec + 8), jnp.int32)
            hlen = jnp.zeros((B,), jnp.int32)
            total, iters = 0, 0
            rounds = max(args.new // args.chunk, 1)
            for _ in range(rounds):
                if args.spec > 0:
                    (cache, slot_pos, slot_logits, slot_active, hist, hlen,
                     toks, _lps, n_new, it) = decode_chunk_slots_spec(
                        params, cfg, cache, slot_pos, slot_logits,
                        slot_active, hist, hlen, sup_mask,
                        chunk=args.chunk, eos_token_id=-1,
                        spec_k=args.spec)
                    total += int(np.asarray(n_new).sum())
                    iters += int(it)
                else:
                    (cache, slot_pos, slot_logits, slot_active, toks,
                     _lps) = decode_chunk_slots(
                        params, cfg, cache, slot_pos, slot_logits,
                        slot_active, sup_mask, chunk=args.chunk,
                        eos_token_id=-1)
                    total += args.chunk * B
                    iters += args.chunk
            np.asarray(toks)    # sync

            class R:            # exact aggregate count (spec rounds can
                tokens = [[0] * total]   # emit non-multiples of B)
            R.iters = iters
            return R
        if args.beam > 0:
            return beam_search_device(bundle, prefill, beam_size=args.beam,
                                      max_new_tokens=args.new,
                                      length_penalty=args.length_penalty,
                                      repetition_penalty=args.rep_penalty)
        if args.spec > 0:
            from qwen2_audio_tpu.runtime.generate import generate_speculative
            toks, lps, n, _, _, iters = generate_speculative(
                bundle.params, bundle.cfg, prefill, sup_mask,
                max_new_tokens=args.new, eos_token_id=-1,
                cache_max_ctx=(args.max_ctx
                               or args.prefill + args.new + args.spec + 8),
                cache_dtype=bundle.cache_dtype, spec_k=args.spec)
            import numpy as _np
            n = int(n)

            class R:            # minimal GenerationResult shim
                tokens = [_np.asarray(toks)[0, :n].tolist()]
            R.iters = int(iters)
            return R
        return greedy_decode_device(bundle, prefill, max_new_tokens=args.new,
                                    cache_ctx=args.max_ctx or None,
                                    suppress_mask=sup_mask)

    prefill = jnp.asarray(
        rng.standard_normal((args.batch, args.prefill, h)) * 0.1, dtype)

    if args.quant in ("q8_0", "q4_0"):
        from qwen2_audio_tpu.ops.linear import group_matmul_mode
        print(f"group matmul mode: {group_matmul_mode()}", file=sys.stderr)
    t0 = time.time()
    r = decode_once()
    compile_s = time.time() - t0
    print(f"compile+warm {compile_s:.1f}s "
          f"({sum(len(t) for t in r.tokens)} tokens total)",
          file=sys.stderr)
    print(f"time-to-first-token from process start: "
          f"{time.time()-t_process0:.1f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = decode_once()
        best = min(best, max(time.time() - t0 - 0.030, 1e-9))
    if args.beam > 0:
        # beam emits one hypothesis; per-step work is beam_size streams
        n_tok = len(r.tokens[0])
    else:
        n_tok = sum(len(t) for t in r.tokens)
    tps = n_tok / best
    tag = f" beam={args.beam}" if args.beam else ""
    if args.spec:
        tag = (f" spec={args.spec} ({n_tok} tok / {r.iters} forwards = "
               f"{n_tok / max(r.iters, 1):.2f} accepted/step)")
    print(f"decode{tag} kv={args.kv}: {n_tok} tokens in {best*1e3:.1f} ms "
          f"-> {tps:.1f} tok/s ({tps/args.batch:.1f} tok/s/stream)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
