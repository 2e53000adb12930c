#!/usr/bin/env python
"""Example: end-to-end transcription (wav -> mel -> encoder -> Qwen2 decode).

    python examples/transcribe.py model.bin audio.wav [hf_decoder_dir]

Without a decoder dir this prints the 20-float encoder fingerprint (the
reference CLI's behavior); with one it prints timestamped segments.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    model, wav = sys.argv[1], sys.argv[2]
    decoder_dir = sys.argv[3] if len(sys.argv) > 3 else None

    from qwen2_audio_tpu.audio import read_audio
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params
    from qwen2_audio_tpu.runtime.serving import transcribe_long_form

    ctx = WhisperContext.init_from_file_with_params(model)
    samples, _ = read_audio(wav)

    if decoder_dir:
        from qwen2_audio_tpu.io.hf import load_qwen2_audio
        ctx.decoder = load_qwen2_audio(decoder_dir)["bundle"]
        for seg in transcribe_long_form(ctx, samples):
            print(f"[{seg.t0_cs / 100:7.2f}s -> {seg.t1_cs / 100:7.2f}s] "
                  f"{seg.text}")
    else:
        params = full_default_params()
        rc = ctx.full(params, samples)
        if rc != 0:
            print(f"whisper_full failed rc={rc}", file=sys.stderr)
            return 1
        ctx.print_emb_enc()
    ctx.print_timings()
    return 0


if __name__ == "__main__":
    sys.exit(main())
