"""CLI mirroring the reference's examples/main (examples/main/main.cpp):
flag set :32-180, @response-file expansion :359-383, per-file WAV load +
100x encode benchmark loop :462-589 printing the 20-float encoder
fingerprint each iteration (whisper_print_emb_enc).

Usage:  python -m cli.main -m models/ggml-model.bin -f samples/jfk.wav
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "qwen2-audio-tpu", description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    a = p.add_argument
    a("-t", "--threads", type=int, default=4,
      help="number of threads (mel/host-side work; XLA owns device compute)")
    a("-p", "--processors", type=int, default=1,
      help="number of parallel chunks (batched encode)")
    a("-ot", "--offset-t", type=int, default=0, help="time offset in ms")
    a("-on", "--offset-n", type=int, default=0, help="segment index offset")
    a("-d", "--duration", type=int, default=0, help="duration to process in ms")
    a("-mc", "--max-context", type=int, default=-1)
    a("-ml", "--max-len", type=int, default=0)
    a("-sow", "--split-on-word", action="store_true")
    a("-bo", "--best-of", type=int, default=5)
    a("-bs", "--beam-size", type=int, default=5)
    a("-ac", "--audio-ctx", type=int, default=0,
      help="audio context size (0 = full 1500)")
    a("-wt", "--word-thold", type=float, default=0.01)
    a("-et", "--entropy-thold", type=float, default=2.40)
    a("-lpt", "--logprob-thold", type=float, default=-1.0)
    a("-tr", "--translate", action="store_true")
    a("-di", "--diarize", action="store_true")
    a("-tdrz", "--tinydiarize", action="store_true")
    a("-nf", "--no-fallback", action="store_true")
    a("-otxt", "--output-txt", action="store_true")
    a("-ovtt", "--output-vtt", action="store_true")
    a("-osrt", "--output-srt", action="store_true")
    a("-olrc", "--output-lrc", action="store_true")
    a("-owts", "--output-words", action="store_true")
    a("-ocsv", "--output-csv", action="store_true")
    a("-oj", "--output-json", action="store_true")
    a("-of", "--output-file", default=None)
    a("-fp", "--font-path", default="/System/Library/Fonts/Supplemental/"
      "Courier New Bold.ttf",
      help="monospace font for the -owts karaoke script")
    a("-np", "--no-prints", action="store_true")
    a("-ps", "--print-special", action="store_true")
    a("-pc", "--print-colors", action="store_true")
    a("-pp", "--print-progress", action="store_true")
    a("-nt", "--no-timestamps", action="store_true")
    a("-l", "--language", default="en")
    a("-dl", "--detect-language", action="store_true")
    a("--prompt", default=None)
    a("-m", "--model", default="models/ggml-model.bin")
    a("-f", "--file", action="append", default=[], help="input WAV file(s)")
    a("--decoder", default=None, metavar="HF_DIR",
      help="attach the Qwen2 text decoder from a HF Qwen2-Audio checkpoint "
           "dir (enables audio->text; without it the CLI runs the encoder "
           "benchmark loop like the reference)")
    a("-oved", "--ov-e-device", default="CPU")
    a("-dtw", "--dtw", default="",
      help="alignment-heads preset for token timestamps")
    a("-ls", "--log-score", action="store_true")
    a("-ng", "--no-gpu", action="store_true")
    a("-fa", "--flash-attn", action="store_true",
      help="use the Pallas flash-attention kernel")
    a("--suppress-regex", default=None)
    a("--grammar", default=None)
    a("--grammar-rule", default=None)
    a("--grammar-penalty", type=float, default=100.0)
    a("--bench-iters", type=int, default=100,
      help="encode iterations (reference hardcodes 100, main.cpp:574)")
    a("--max-new-tokens", type=int, default=128)
    a("--spec-k", type=int, default=-1,
      help="n-gram speculative decoding: drafts verified per forward "
           "(greedy only; exact output — TPU extension). -1 auto "
           "(on for TPU), 0 off")
    a("--temperature", type=float, default=0.0)
    a("--debug-mode", action="store_true")
    a("--rpc", default=None, metavar="HOST:PORT",
      help="offload to a remote qwen2_audio_tpu.runtime.rpc server "
           "(≙ ggml's RPC backend, ggml-rpc.cpp)")
    return p


def expand_response_files(argv: list[str]) -> list[str]:
    """@file expansion (reference main.cpp:359-383)."""
    out = []
    for arg in argv:
        if arg.startswith("@"):
            with open(arg[1:]) as f:
                out.extend(f.read().split())
        else:
            out.append(arg)
    return out


def main(argv: list[str] | None = None) -> int:
    argv = expand_response_files(sys.argv[1:] if argv is None else argv)
    args = build_parser().parse_args(argv)

    if not args.file:
        print("error: no input files specified", file=sys.stderr)
        return 1

    from qwen2_audio_tpu.audio import read_audio
    from qwen2_audio_tpu.runtime import ContextParams, WhisperContext, full_default_params
    from qwen2_audio_tpu.utils.logging import log_set
    from qwen2_audio_tpu.runtime.context import print_system_info

    if args.no_prints:
        log_set(lambda level, text, ud: None)

    import jax as _jax
    if _jax.default_backend() in ("tpu", "axon"):
        # wedged-tunnel guard + background kernel validation on fresh hosts
        from qwen2_audio_tpu.utils.watchdog import (ensure_kernel_validation,
                                                    watchdog)
        watchdog(float(os.environ.get("QA_WATCHDOG_S", "3600")), "cli")
        ensure_kernel_validation()

    cparams = ContextParams(use_gpu=not args.no_gpu, flash_attn=args.flash_attn)
    if args.rpc:
        from qwen2_audio_tpu.runtime.rpc import RemoteWhisperContext
        ctx = RemoteWhisperContext.connect(args.rpc)
        ctx.load_model_file(args.model, cparams)
        if not args.no_prints:
            print(f"rpc: offloading to {args.rpc} "
                  f"(backend {ctx.server_backend})", file=sys.stderr)
    else:
        ctx = WhisperContext.init_from_file_with_params(args.model, cparams)

    if args.decoder:
        from qwen2_audio_tpu.io.hf import load_qwen2_audio
        ctx.decoder = load_qwen2_audio(args.decoder)["bundle"]

    if not args.no_prints:
        print(f"system_info: {print_system_info()}", file=sys.stderr)

    for fname in args.file:
        samples, _rate = read_audio(fname)
        if not args.no_prints:
            print(f"processing '{fname}' ({len(samples)} samples, "
                  f"{len(samples) / 16000.0:.1f} sec)", file=sys.stderr)

        fp = full_default_params()
        fp.offset_ms = args.offset_t
        fp.duration_ms = args.duration
        fp.translate = args.translate
        fp.language = args.language
        fp.detect_language = args.detect_language
        fp.audio_ctx = args.audio_ctx
        fp.beam_size = args.beam_size
        fp.best_of = args.best_of
        fp.entropy_thold = args.entropy_thold
        fp.logprob_thold = args.logprob_thold
        fp.temperature = args.temperature
        fp.max_new_tokens = args.max_new_tokens
        fp.speculative_k = args.spec_k
        fp.print_special = args.print_special
        fp.no_timestamps = args.no_timestamps
        fp.suppress_regex = args.suppress_regex
        fp.initial_prompt = args.prompt
        fp.debug_mode = args.debug_mode
        # ≙ reference main.cpp:520-522: -owts implies token timestamps and
        # a 60-char default wrap
        fp.token_timestamps = args.output_words or args.max_len > 0
        fp.max_len = (60 if args.output_words and args.max_len == 0
                      else args.max_len)
        fp.split_on_word = args.split_on_word

        # benchmark + parity loop (reference main.cpp:573-583)
        t0 = time.perf_counter()
        for _ in range(args.bench_iters):
            if args.processors > 1:
                rc = ctx.full_parallel(fp, samples, args.processors)
            else:
                rc = ctx.full(fp, samples)
            if rc != 0:
                print(f"failed to process audio (rc={rc})", file=sys.stderr)
                return 10
            ctx.print_emb_enc()
        elapsed = time.perf_counter() - t0
        print(f"Elapsed time is {elapsed:.6f} seconds.")

        if ctx.decoder is not None:
            for i in range(ctx.full_n_segments()):
                if args.print_colors:
                    from cli.output_formats import colorize_segment
                    print(colorize_segment(ctx.state.segments[i]))
                else:
                    print(ctx.full_get_segment_text(i))

        if args.output_words and ctx.state.segments:
            from cli.output_formats import write_wts
            base = (args.output_file or fname)
            base = (base[:-4] if base.endswith((".wav", ".mp3"))
                    else base)
            write_wts(f"{base}.wts", ctx.state.segments, fname,
                      int(len(samples) / 16000.0 * 100),
                      font_path=args.font_path)
            if not args.no_prints:
                print(f"saved karaoke script to {base}.wts",
                      file=sys.stderr)

        if ctx.state.segments and any((args.output_txt, args.output_vtt,
                                       args.output_srt, args.output_lrc,
                                       args.output_csv, args.output_json)):
            from cli.output_formats import write_outputs
            for path in write_outputs(fname, ctx.state.segments, args):
                if not args.no_prints:
                    print(f"output written to {path}", file=sys.stderr)

    if not args.no_prints:
        ctx.print_timings()
    return 0


if __name__ == "__main__":
    sys.exit(main())
