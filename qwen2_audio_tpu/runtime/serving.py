"""Long-form serving: chunked 30 s windows, batched encode + batched
streaming decode (BASELINE config #5).

The reference handles long audio by stepping `mel_offset` one 30 s window at
a time through whisper_full (src/qwen2-whisper.cpp:2276-2283) and its
whisper_full_parallel n-chunk variant was declared but never implemented
(include/qwen2-whisper.h:464-469). Here the batch dimension is first-class:
windows are encoded together in fixed-size buckets (one XLA executable per
bucket size) and decoded as one batch.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.audio.mel import LogMelSpectrogram, mel_input_window
from qwen2_audio_tpu.models.encoder import encoder_forward
from qwen2_audio_tpu.runtime.context import FullParams, WhisperContext
from qwen2_audio_tpu.runtime.decoding import _prefill_embeds
from qwen2_audio_tpu.utils.timings import time_us


@dataclasses.dataclass
class Segment:
    t0_cs: int            # start, centiseconds (10 ms units, reference style)
    t1_cs: int
    text: str
    tokens: list[int]
    avg_logprob: float


def _chunk_offsets(n_len_org: int, n_ctx: int) -> list[int]:
    """Window starts: one 2*n_ctx-frame window per 30 s of content."""
    step = 2 * n_ctx
    if n_len_org <= 0:
        return []
    return list(range(0, n_len_org, step))


def encode_windows(ctx: WhisperContext, mel: LogMelSpectrogram,
                   offsets: list[int], batch_size: int = 8) -> np.ndarray:
    """Encode mel windows in buckets of `batch_size` (padded to the bucket
    so XLA compiles exactly one executable per bucket size).
    Returns (n_windows, n_ctx//2, n_state)."""
    hp = ctx.hparams
    outs = []
    for i in range(0, len(offsets), batch_size):
        group = offsets[i:i + batch_size]
        wins = np.stack([mel_input_window(mel, off, hp.n_audio_ctx)
                         for off in group])
        pad = batch_size - len(group)
        if pad:
            wins = np.concatenate(
                [wins, np.zeros((pad, *wins.shape[1:]), wins.dtype)])
        t0 = time_us()
        enc = encoder_forward(
            ctx.encoder_params, jnp.asarray(wins), hp,
            gelu_approximate=ctx.params.gelu_approximate,
            use_flash=ctx.params.flash_attn,
            compute_dtype=ctx.params.compute_dtype)
        enc = np.asarray(jax.device_get(enc))[: len(group)]
        if ctx.state is not None:
            ctx.state.timings.t_encode_us += time_us() - t0
            ctx.state.timings.n_encode += len(group)
        outs.append(enc)
    return np.concatenate(outs) if outs else np.zeros(
        (0, hp.n_audio_ctx // 2, hp.n_audio_state), np.float32)


def transcribe_long_form(
    ctx: WhisperContext,
    samples: np.ndarray,
    params: FullParams | None = None,
    batch_size: int = 8,
) -> Iterator[Segment]:
    """Generator of segments over the full audio. Requires ctx.decoder.

    Encode is batched across windows; decode runs all windows of a bucket as
    ONE batched greedy stream (beam for long-form stays per-window via
    FullParams.strategy='beam', at reduced throughput).
    """
    if ctx.decoder is None:
        raise RuntimeError("transcribe_long_form requires an attached decoder")
    params = params or FullParams()
    hp = ctx.hparams
    state = ctx.state or ctx.init_state()

    if ctx.pcm_to_mel_with_state(state, samples) != 0:
        raise RuntimeError("mel computation failed")
    mel = state.mel

    offsets = _chunk_offsets(mel.n_len_org, hp.n_audio_ctx)
    if not offsets:
        return

    bundle = ctx.decoder
    window_cs = 2 * hp.n_audio_ctx  # frames == centiseconds (10 ms hop)

    for i in range(0, len(offsets), batch_size):
        group = offsets[i:i + batch_size]
        enc = encode_windows(ctx, mel, group, batch_size=min(batch_size,
                                                             len(group)))
        # build one prefill per window (same token skeleton -> same length)
        prefills = []
        for b in range(len(group)):
            audio = bundle.project_audio(enc[b])
            prefills.append(_prefill_embeds(bundle, audio,
                                            params.prompt_tokens or [])[0])
        prefill = jnp.stack(prefills)

        if params.strategy == "beam":
            from qwen2_audio_tpu.runtime.decoding import beam_search
            results = [beam_search(bundle, prefill[b:b + 1],
                                   beam_size=params.beam_size,
                                   max_new_tokens=params.max_new_tokens,
                                   length_penalty=params.length_penalty,
                                   repetition_penalty=params.repetition_penalty,
                                   timings=state.timings)
                       for b in range(len(group))]
            tokens = [r.tokens[0] for r in results]
            avglp = [r.avg_logprob[0] for r in results]
        else:
            from qwen2_audio_tpu.runtime.generate import greedy_decode_device
            t0 = time_us()
            r = greedy_decode_device(
                bundle, prefill, max_new_tokens=params.max_new_tokens,
                temperature=params.temperature,
                repetition_penalty=params.repetition_penalty)
            state.timings.t_decode_us += time_us() - t0
            state.timings.n_decode += sum(len(t) for t in r.tokens)
            tokens, avglp = r.tokens, r.avg_logprob

        if params.strategy == "beam":
            lps = [r.logprobs[0] for r in results]
        else:
            lps = r.logprobs
        for b, off in enumerate(group):
            seg = Segment(
                t0_cs=off,
                t1_cs=min(off + window_cs, mel.n_len_org),
                text=bundle.text(tokens[b]),
                tokens=tokens[b],
                avg_logprob=avglp[b],
            )
            from qwen2_audio_tpu.runtime.decoding import _token_surfaces
            state.segments.append({
                "t0": seg.t0_cs, "t1": seg.t1_cs, "text": seg.text,
                "tokens": seg.tokens,
                "token_texts": _token_surfaces(bundle, seg.tokens),
                "probs": [float(np.exp(min(l, 0.0))) for l in lps[b]],
                "speaker_turn_next": False,
            })
            if params.new_segment_callback is not None:
                params.new_segment_callback(ctx, state, 1)
            if params.progress_callback is not None:
                done = min(100, 100 * (i + b + 1) // len(offsets))
                params.progress_callback(ctx, state, done)
            yield seg
