"""Round benchmark: Qwen2-Audio encoder real-time factor on a 30 s clip.

North star (BASELINE.md): >100x real-time on one TPU v5e chip — the full
encoder forward (32 layers, d=1280, 1500 frames -> 750) in under 300 ms.

Prints ONE JSON line:
    {"metric": "encoder_rtf_30s", "value": <x realtime>,
     "unit": "x_realtime", "vs_baseline": <value / 100>}

Timing methodology (critical on this setup): the TPU is reached via an
async tunnel where block_until_ready() returns early, so we time a CHAIN of
data-dependent encoder iterations inside one jit and synchronize with a
device->host readback, subtracting the fixed ~30 ms round-trip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CLIP_SECONDS = 30.0
CHAIN = 20
RTT_S = 0.030
# must outlast a worst-case FRESH remote compile of the encoder chain
# (5-18 min per new program shape on this setup) — 900 s once zeroed the
# metric on a healthy tunnel that was merely cold-compiling — PLUS the
# bounded fresh-host wait for the validator's fa_encoder marker (600 s)
WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", "2700"))


def _report_failure():
    """Emit the driver JSON line with a zero metric — a wedged tunnel
    readback must fail loudly, not hang the driver."""
    print(json.dumps({"metric": "encoder_rtf_30s", "value": 0,
                      "unit": "x_realtime", "vs_baseline": 0,
                      "error": "tpu readback timeout"}))
    sys.stdout.flush()


def main() -> int:
    from qwen2_audio_tpu.utils.watchdog import (ensure_kernel_validation,
                                                watchdog)
    watchdog(WATCHDOG_S, "bench", on_timeout=_report_failure)
    import jax
    # persistent compilation cache (survives host resets; seeds from the
    # in-repo prewarm_cache/ so even a fresh clone skips the big compile)
    from qwen2_audio_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.audio.mel import log_mel_spectrogram, mel_input_window
    from qwen2_audio_tpu.config import WHISPER_PRESETS
    from qwen2_audio_tpu.models.encoder import encoder_forward, random_encoder_params

    hp = WHISPER_PRESETS[os.environ.get("BENCH_PRESET", "qwen2-audio")]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        # fresh host (no /tmp markers): launch the kernel validator in the
        # background so the fused-mel/flash fast paths arm for later runs
        ensure_kernel_validation()
        # The flash encoder is worth ~2x on the headline; on a fresh host
        # give the just-launched validator a bounded window to arm it
        # (r2's driver run burned 259 s on a cold mel compile instead —
        # same lesson: the first driver run after a host reset is the one
        # that gets recorded). Proceeds on the safe path either way.
        wait_s = float(os.environ.get("BENCH_WAIT_MARKERS_S", "600"))
        deadline = time.time() + wait_s
        while (not os.path.exists("/tmp/qa_kernel_ok_fa_encoder")
               and time.time() < deadline):
            time.sleep(5)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"bench: backend={jax.default_backend()} dtype={dtype.__name__} "
          f"model={hp.model_type} layers={hp.n_audio_layer} "
          f"d={hp.n_audio_state}", file=sys.stderr)

    rng = np.random.default_rng(0)
    from qwen2_audio_tpu.models.encoder import fuse_encoder_qkv
    t0 = time.perf_counter()
    params = fuse_encoder_qkv(random_encoder_params(rng, hp, dtype=dtype))
    jax.block_until_ready(params)
    upload_s = time.perf_counter() - t0
    # isolate the weight transfer (the ~1.3 GB large-v3 upload rides the
    # tunnel and previously landed inside "compile+warm", hiding the
    # persistent compile cache's effect: r4b/r4d recorded 174/395 s there
    # while pipe_step — the SAME encoder + mel — cold-compiled in 20.5 s)
    print(f"bench: params build+upload {upload_s:.1f} s", file=sys.stderr)

    # 30 s synthetic speech-band audio -> real mel frontend
    t = np.arange(int(16000 * CLIP_SECONDS)) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 1320 * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)

    t0 = time.perf_counter()
    if on_tpu:
        # Input prep, not part of the timed metric: the numpy host mel is
        # exact (C-loop oracle-tested) and compiles NOTHING. Any device mel
        # (XLA gather or the validated fused Pallas kernel) pays a
        # multi-minute remote compile on a cold cache — BENCH_r02 measured
        # 259 s for the XLA form, a cold r3 run 307 s for the fused kernel
        # — which is pure driver-run waste. The device mels stay covered by
        # the validator (marker `mel`) and the mel benches.
        from qwen2_audio_tpu.audio.mel import log_mel_spectrogram_np
        mel = log_mel_spectrogram_np(audio, mel_filterbank(hp.n_mels))
    else:
        mel = log_mel_spectrogram(audio, mel_filterbank(hp.n_mels))
    win = mel_input_window(mel, 0, hp.n_audio_ctx)
    mel_s = time.perf_counter() - t0
    x = jnp.asarray(win[None], dtype)

    # Flash attention inside the full encoder jit is only enabled after
    # tools/validate_tpu_kernels.py proved the composed compile on this
    # host (compiled-loop/composed Pallas compiles have hung the tunnel;
    # a hang here would zero the bench). The einsum path is hardware-
    # validated and still far beyond the 100x RTF target.
    use_flash = bool(on_tpu) and os.path.exists("/tmp/qa_kernel_ok_fa_encoder")

    # One jitted step with a cheap data-dependent carry; the CHAIN is built
    # by Python-level dispatches (NOT lax.fori_loop — wrapping Pallas calls
    # in a compiled loop has hung the remote-compile path on this setup).
    # Async dispatch enqueues all steps; the final readback waits for the
    # whole dependent chain, so wall time / CHAIN is true per-step latency.
    @jax.jit
    def step(params, carry):
        # gelu_approximate=True is the production flavor for ggml-loaded
        # contexts (the reference's own ggml_vec_gelu_f32 IS the tanh
        # approximation, via an f16 LUT); measured 21.08 vs 22.21 ms/clip
        out = encoder_forward(params, carry, hp, use_flash=use_flash,
                              gelu_approximate=True,
                              compute_dtype=dtype)
        return carry + (jnp.sum(out) * 0).astype(carry.dtype)

    t0 = time.perf_counter()
    _ = np.asarray(step(params, x))             # compile + warm run
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = x
        for _i in range(CHAIN):
            carry = step(params, carry)
        _ = np.asarray(jnp.sum(carry))
        total = time.perf_counter() - t0
        best = min(best, max(total - RTT_S, 1e-9) / CHAIN)

    rtf = CLIP_SECONDS / best
    print(f"bench: mel {mel_s*1e3:.1f} ms (first, incl. compile) | "
          f"encoder chain compile+warm {compile_s:.1f} s | "
          f"encode {best*1e3:.2f} ms/clip | RTF {rtf:.1f}x", file=sys.stderr)

    # Whole-pipeline figure (VERDICT r3): wav -> embedding with the mel
    # stage ON DEVICE (fused Pallas mel + clamp/normalize + encoder in ONE
    # jit, single readback) — ≙ the reference's mel+encode phase total
    # (whisper_print_timings, src/qwen2-whisper.cpp:3516-3538). Gated on
    # the composed-pipeline validator marker (composition compiles have
    # wedged the remote-compile tunnel before).
    pipeline_ms = None
    if (not on_tpu) or os.path.exists("/tmp/qa_kernel_ok_pipeline"):
        from qwen2_audio_tpu.ops.mel_kernel import (frame_rows, mel_tables,
                                                    mel_window_device)
        rows_np, _nl, _norg, n_content = frame_rows(audio)
        bc, bs, filt, n_mel = mel_tables(mel_filterbank(hp.n_mels))
        rows = jnp.asarray(rows_np)

        @jax.jit
        def pipe_step(params, rows):
            win = mel_window_device(rows, bc, bs, filt,
                                    n_frames=2 * hp.n_audio_ctx,
                                    n_content=n_content, n_mels=n_mel)
            out = encoder_forward(params, win[None].astype(dtype), hp,
                                  use_flash=use_flash,
                                  gelu_approximate=True,
                                  compute_dtype=dtype)
            return rows + (jnp.sum(out) * 0).astype(rows.dtype)

        t0 = time.perf_counter()
        _ = np.asarray(pipe_step(params, rows))
        pipe_compile_s = time.perf_counter() - t0
        bestp = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            carry = rows
            for _i in range(CHAIN):
                carry = pipe_step(params, carry)
            _ = np.asarray(jnp.sum(carry[:1, :1]))
            total = time.perf_counter() - t0
            bestp = min(bestp, max(total - RTT_S, 1e-9) / CHAIN)
        pipeline_ms = bestp * 1e3
        print(f"bench: pipeline wav->emb {pipeline_ms:.2f} ms/clip "
              f"(device mel + encode, one jit; compile+warm "
              f"{pipe_compile_s:.1f} s; RTF {CLIP_SECONDS*1e3/pipeline_ms:.1f}x)",
              file=sys.stderr)

    out = {
        "metric": "encoder_rtf_30s",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }
    if pipeline_ms is not None:
        out["pipeline_ms_clip"] = round(pipeline_ms, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
