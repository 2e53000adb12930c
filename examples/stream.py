#!/usr/bin/env python
"""Example: pseudo-streaming transcription with energy VAD segmentation.

Feeds a long WAV through a sliding buffer the way whisper.cpp's stream
example drives a microphone: accumulate audio, run the simple energy VAD
(audio/vad.py ≙ examples/common.cpp vad_simple) to detect end-of-speech,
then transcribe the finished utterance and emit it incrementally through
StreamingTextDecoder (utils/utf8.py), which handles codepoints split across
token boundaries.

    python examples/stream.py model.bin long.wav [hf_decoder_dir]

Live capture: pass '-' (stdin) or a FIFO path instead of a WAV to read raw
s16le 16 kHz mono PCM as a blocking stream — the capture-loop shape of the
reference's SDL microphone source (examples/common-sdl.cpp:1-229
audio_async ring buffer feeding examples/stream.cpp), honest to this
environment's no-audio-device constraint:

    arecord -f S16_LE -r 16000 -c 1 | python examples/stream.py model.bin -
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

CHUNK_MS = 500
MAX_UTTERANCE_S = 28.0


def main() -> int:
    model, wav = sys.argv[1], sys.argv[2]
    decoder_dir = sys.argv[3] if len(sys.argv) > 3 else None

    from qwen2_audio_tpu.audio import is_pipe_source, pcm_chunks, read_audio
    from qwen2_audio_tpu.audio.vad import vad_simple
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params
    from qwen2_audio_tpu.utils.utf8 import StreamingTextDecoder

    ctx = WhisperContext.init_from_file_with_params(model)
    if decoder_dir:
        from qwen2_audio_tpu.io.hf import load_qwen2_audio
        ctx.decoder = load_qwen2_audio(decoder_dir)["bundle"]

    rate = 16000
    if is_pipe_source(wav):
        # live source: blocking chunk reader over the pipe, the role of
        # audio_async::get() in the reference's SDL capture loop
        chunks = pcm_chunks(wav, rate=rate, chunk_ms=CHUNK_MS)
    else:
        samples, rate = read_audio(wav)
        step = rate * CHUNK_MS // 1000
        chunks = (samples[off:off + step]
                  for off in range(0, len(samples), step))
    buf = np.zeros(0, np.float32)
    t_emitted = 0.0

    def flush(buf: np.ndarray, t0: float) -> None:
        if len(buf) < rate:  # < 1 s — the runtime guard would skip it anyway
            return
        p = full_default_params()
        p.temperature_inc = 0.0
        if ctx.full(p, buf) != 0:
            return
        if ctx.decoder is not None and ctx.state.segments:
            # stream RAW token bytes through the incremental UTF-8 decoder
            # (codepoints can split across byte-level BPE tokens; decoded
            # strings would already contain replacement chars)
            sd = StreamingTextDecoder()
            if ctx.decoder.token_bytes is not None:
                chunks = [ctx.decoder.token_bytes(t)
                          for t in ctx.state.result_tokens]
                text = "".join(sd.push(c) for c in chunks) + sd.flush()
            else:
                text = ctx.full_get_segment_text(0)
        else:
            text = f"<encoded {ctx.state.embd_enc.shape}>"
        print(f"[{t0:7.2f}s] {text}", flush=True)

    for piece in chunks:
        buf = np.concatenate([buf, piece])
        speech_ended = vad_simple(buf, rate, last_ms=400, vad_thold=0.6,
                                  freq_thold=100.0)
        if speech_ended or len(buf) >= rate * MAX_UTTERANCE_S:
            flush(buf, t_emitted)
            t_emitted += len(buf) / rate
            buf = np.zeros(0, np.float32)

    flush(buf, t_emitted)
    ctx.print_timings()
    return 0


if __name__ == "__main__":
    sys.exit(main())
