"""Benchmark CLI (≙ whisper.cpp's bench example over the fork's
whisper_bench_memcpy / whisper_bench_ggml_mul_mat entry points,
include/qwen2-whisper.h:517-520).

Usage:  python -m cli.bench_cli [-t threads] [-w what]
        what: 0 = all, 1 = encoder, 2 = memcpy, 3 = mul_mat
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("bench")
    ap.add_argument("-m", "--model", default=None,
                    help="ggml model for the encoder bench (default: "
                         "random tiny weights)")
    ap.add_argument("-t", "--threads", type=int, default=4)
    ap.add_argument("-w", "--what", type=int, default=0)
    args = ap.parse_args(argv)

    from qwen2_audio_tpu import capi

    if args.what in (0, 2):
        print(capi.whisper_bench_memcpy_str(args.threads), end="")

    if args.what in (0, 3):
        print("mul_mat (chain-timed, readback-synced):")
        print(capi.whisper_bench_ggml_mul_mat_str(args.threads), end="")

    if args.what in (0, 1):
        import numpy as np
        from qwen2_audio_tpu.runtime import WhisperContext, full_default_params
        if args.model:
            ctx = WhisperContext.init_from_file_with_params(args.model)
        else:
            import io
            from qwen2_audio_tpu.audio import mel_filterbank
            from qwen2_audio_tpu.config import WHISPER_PRESETS
            from qwen2_audio_tpu.io.export import write_encoder_checkpoint
            from qwen2_audio_tpu.models.encoder import random_encoder_params
            hp = WHISPER_PRESETS["tiny"]
            buf = io.BytesIO()
            write_encoder_checkpoint(
                buf, random_encoder_params(np.random.default_rng(0), hp),
                hp, mel_filterbank(hp.n_mels), [b"x"] * 64)
            ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        samples = np.zeros(16000 * 30, np.float32)
        p = full_default_params()
        ctx.full(p, samples)     # warm (compile)
        t0 = time.perf_counter()
        ctx.full(p, samples)
        dt = time.perf_counter() - t0
        print(f"encoder ({ctx.model_type_readable()}): "
              f"{dt * 1e3:.1f} ms / 30 s clip")
        ctx.print_timings()
    return 0


if __name__ == "__main__":
    sys.exit(main())
