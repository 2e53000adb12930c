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


# Adaptive-speculation pool introspection (read by tests and bench tools):
# chunk counts per mode from the most recent _serve_pool run.
LAST_POOL_STATS: dict[str, int] = {}
_PROBE_MIN = 8         # first re-probe of the losing mode after N chunks
_PROBE_MAX = 128       # backoff cap: a 2x-slower loser probed every 128
#                        chunks costs <1% steady-state throughput


@jax.jit
def _append_hist(hist: jax.Array, hlen: jax.Array, toks: jax.Array,
                 n_new: jax.Array):
    """Append each slot's first n_new[s] emitted tokens to its draft
    history (hist (B,H), hlen (B,), toks (B,C)) — keeps the n-gram
    drafter's context fresh across PLAIN chunks in the adaptive pool.
    Out-of-range scatter indices are dropped (mode='drop')."""
    B, H = hist.shape
    C = toks.shape[1]
    col = jnp.arange(C)[None, :]
    idx = jnp.where(col < n_new[:, None], hlen[:, None] + col, H)
    hist = hist.at[jnp.arange(B)[:, None], idx].set(toks, mode="drop")
    return hist, jnp.minimum(hlen + n_new, H)


def _base_prompt_tokens(bundle, params: FullParams) -> list[int]:
    """prompt_tokens with FullParams.initial_prompt tokenized and
    prepended — the same semantics decoding.run applies for whisper_full
    (≙ header :412-417, capped at n_max_text_ctx/2); without this the
    serving paths silently dropped initial_prompt."""
    prompt = list(params.prompt_tokens or [])
    if params.initial_prompt:
        if bundle.tokenize is not None:
            extra = list(bundle.tokenize(params.initial_prompt))
            prompt = extra[: params.n_max_text_ctx // 2] + prompt
        else:
            from qwen2_audio_tpu.runtime.decoding import _warn_once
            _warn_once("serving_initial_prompt",
                       "initial_prompt ignored: decoder bundle has no "
                       "tokenizer")
    return prompt


def _segment_dict(bundle, seg: Segment, lps) -> dict:
    """The state.segments entry schema shared by every serving path
    (one definition — the whisper_full accessors read these fields)."""
    from qwen2_audio_tpu.runtime.decoding import _token_surfaces
    return {
        "t0": seg.t0_cs, "t1": seg.t1_cs, "text": seg.text,
        "tokens": seg.tokens,
        "token_texts": _token_surfaces(bundle, seg.tokens),
        "probs": [float(np.exp(min(l, 0.0))) for l in lps],
        "speaker_turn_next": False,
    }


def _chunk_offsets(n_len_org: int, n_ctx: int) -> list[int]:
    """Window starts: one 2*n_ctx-frame window per 30 s of content."""
    step = 2 * n_ctx
    if n_len_org <= 0:
        return []
    return list(range(0, n_len_org, step))


def encode_windows(ctx: WhisperContext, mel: LogMelSpectrogram,
                   offsets: list[int], batch_size: int = 1) -> np.ndarray:
    """Encode mel windows in buckets of `batch_size` (padded to the bucket
    so XLA compiles exactly one executable per bucket size).
    Returns (n_windows, n_ctx//2, n_state).

    Default bucket is 1: batched encode LOSES on this chip — B=8
    measured 24.3 ms/clip amortized vs B=1's 18.85 (docs/BENCH_NOTES.md
    "B=8 batched encode"; the B=8 program schedules worse, it is not a
    dispatch-amortization win). batch_size stays as the A/B option for
    serving regimes where encode/decode overlap could flip the answer."""
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
    # fresh transcript per call, like decoding.run's per-call assignment
    # (whisper_full clears result_all each call); windows APPEND below
    state.segments = []

    offsets = _chunk_offsets(mel.n_len_org, hp.n_audio_ctx)
    if not offsets:
        return

    bundle = ctx.decoder
    base_prompt = _base_prompt_tokens(bundle, params)
    window_cs = 2 * hp.n_audio_ctx  # frames == centiseconds (10 ms hop)

    # no_context=False (≙ whisper_full_params.no_context, header :377-379):
    # each window's transcript is carried as text context into the next —
    # a sequential dependency, so windows decode one at a time (the
    # reference pays the same serialization; batched long-form requires
    # the default no_context=True)
    # whisper_full_params suppression (suppress_regex / non-speech list)
    # applies to the serving decodes too, same as the whisper_full path
    from qwen2_audio_tpu.runtime.decoding import (build_blank_mask,
                                                  build_suppress_mask)
    sup_np = build_suppress_mask(bundle, params)
    sup_mask = None if sup_np is None else jnp.asarray(sup_np)
    blank_np = build_blank_mask(bundle, params)   # step-0 suppress_blank

    carry_context = not params.no_context
    if carry_context and batch_size > 1:
        batch_size = 1
    carried: list[int] = []

    for i in range(0, len(offsets), batch_size):
        group = offsets[i:i + batch_size]
        # encode bucket stays at the measured-best default (B=1, see
        # encode_windows); `batch_size` here batches the DECODE stream
        enc = encode_windows(ctx, mel, group)
        # build one prefill per window (same token skeleton -> same length)
        prefills = []
        for b in range(len(group)):
            audio = bundle.project_audio(enc[b])
            prompt = list(carried) + base_prompt
            prefills.append(_prefill_embeds(bundle, audio, prompt)[0])
        prefill = jnp.stack(prefills)

        if params.strategy == "beam":
            from qwen2_audio_tpu.runtime.decoding import beam_search
            results = [beam_search(bundle, prefill[b:b + 1],
                                   beam_size=params.beam_size,
                                   max_new_tokens=params.max_new_tokens,
                                   length_penalty=params.length_penalty,
                                   repetition_penalty=params.repetition_penalty,
                                   timings=state.timings,
                                   suppress_mask=sup_np,
                                   suppress_first=blank_np)
                       for b in range(len(group))]
            tokens = [r.tokens[0] for r in results]
            avglp = [r.avg_logprob[0] for r in results]
        else:
            from qwen2_audio_tpu.runtime.generate import greedy_decode_device
            t0 = time_us()
            r = greedy_decode_device(
                bundle, prefill, max_new_tokens=params.max_new_tokens,
                temperature=params.temperature,
                repetition_penalty=params.repetition_penalty,
                suppress_mask=sup_mask,
                suppress_first=None if blank_np is None
                else jnp.asarray(blank_np))
            state.timings.t_decode_us += time_us() - t0
            state.timings.n_decode += sum(len(t) for t in r.tokens)
            tokens, avglp = r.tokens, r.avg_logprob

        if params.strategy == "beam":
            lps = [r.logprobs[0] for r in results]
        else:
            lps = r.logprobs
        if carry_context:
            # carry this window's transcript (sans EOS) into the next
            # prompt, capped like initial_prompt at n_max_text_ctx/2
            new = [t for t in tokens[-1] if t != bundle.eos_token_id]
            # keep=0 must mean "carry nothing" (whisper.cpp -mc 0), not
            # lst[-0:] == everything
            keep = params.n_max_text_ctx // 2
            carried = (carried + new)[-keep:] if keep > 0 else []
        for b, off in enumerate(group):
            seg = Segment(
                t0_cs=off,
                t1_cs=min(off + window_cs, mel.n_len_org),
                text=bundle.text(tokens[b]),
                tokens=tokens[b],
                avg_logprob=avglp[b],
            )
            state.segments.append(_segment_dict(bundle, seg, lps[b]))
            if params.new_segment_callback is not None:
                params.new_segment_callback(ctx, state, 1)
            if params.progress_callback is not None or params.print_progress:
                done = min(100, 100 * (i + b + 1) // len(offsets))
                if params.progress_callback is not None:
                    params.progress_callback(ctx, state, done)
                if params.print_progress:
                    # ≙ whisper_full's built-in progress print (the
                    # reference's progress_callback default behavior)
                    from qwen2_audio_tpu.utils.logging import log_info
                    log_info("progress = %3d%%\n", done)
            yield seg


class _Job:
    """One decode stream for the shared slot pool: an encoded window (or
    any audio-conditioned prefix) plus the metadata its Segment needs."""

    __slots__ = ("tag", "enc", "t0_cs", "t1_cs")

    def __init__(self, tag, enc, t0_cs, t1_cs):
        self.tag, self.enc = tag, enc
        self.t0_cs, self.t1_cs = t0_cs, t1_cs


def _serve_pool(ctx, params, jobs, n_slots, chunk_tokens, mesh):
    """Continuous-batching core: a fixed pool of decode slots over ONE
    shared KV cache; finished slots refill from the job queue with no
    lockstep barrier. Yields (job, Segment) in COMPLETION order.

    Used by transcribe_continuous (jobs = one audio's 30 s windows) and
    transcribe_many (jobs = windows of MANY requests — continuous
    batching across requests, the vLLM-style serving shape). With
    FullParams.speculative_k, slots self-draft and verify in one
    (B, K+1) forward (decode_chunk_slots_spec); with ``mesh`` the decode
    runs tensor-parallel through parallel/tp.py.
    """
    import functools
    from qwen2_audio_tpu.runtime.generate import (decode_chunk_slots,
                                                  decode_chunk_slots_spec,
                                                  prefill_slot)
    from qwen2_audio_tpu.models.qwen2_decoder import create_cache
    from qwen2_audio_tpu.runtime.decoding import (build_blank_mask,
                                                  build_suppress_mask)

    state = ctx.state or ctx.init_state()
    bundle = ctx.decoder

    # the slot pool is greedy-only by design (speculative verification and
    # the frozen-slot chunk semantics are exact-greedy contracts): warn
    # loudly on sampling knobs it cannot honor instead of silently
    # diverging from transcribe_long_form (same FullParams struct)
    from qwen2_audio_tpu.runtime.decoding import _warn_once
    if params.strategy == "beam":
        _warn_once("pool_beam", "slot-pool serving is greedy-only: "
                   "strategy='beam' ignored (use transcribe_long_form / "
                   "whisper_full for beam search)")
    if params.temperature:
        _warn_once("pool_temperature", "slot-pool serving is greedy-only: "
                   "temperature ignored")
    if params.repetition_penalty not in (None, 0.0, 1.0):
        _warn_once("pool_rep_penalty", "slot-pool serving is greedy-only: "
                   "repetition_penalty ignored")

    base_prompt = _base_prompt_tokens(bundle, params)
    sup_np = build_suppress_mask(bundle, params)
    sup_mask = None if sup_np is None else jnp.asarray(sup_np)
    # FullParams.suppress_blank: a step-0-only mask. Each slot's "step 0"
    # samples from the logits prefill_slot installed, so baking the mask
    # into that state row at refill time is exactly the whisper_full
    # behavior (the first chunk read adds sup_mask on top; the row is
    # overwritten with raw logits after the first emission).
    blank_np = build_blank_mask(bundle, params)
    blank = None if blank_np is None else jnp.asarray(blank_np)

    dec_params = bundle.params
    if mesh is not None:
        from qwen2_audio_tpu.parallel.tp import (shard_decoder_for_tp,
                                                 tp_decode_chunk_slots,
                                                 tp_decode_chunk_slots_spec,
                                                 tp_prefill_slot)
        dec_params = shard_decoder_for_tp(dec_params, mesh)
        _prefill = functools.partial(tp_prefill_slot, dec_params,
                                     bundle.cfg, mesh)
        _chunk = functools.partial(tp_decode_chunk_slots, dec_params,
                                   bundle.cfg, mesh)
        _chunk_spec = functools.partial(tp_decode_chunk_slots_spec,
                                        dec_params, bundle.cfg, mesh)
    else:
        _prefill = functools.partial(prefill_slot, dec_params, bundle.cfg)
        _chunk = functools.partial(decode_chunk_slots, dec_params,
                                   bundle.cfg)
        _chunk_spec = functools.partial(decode_chunk_slots_spec, dec_params,
                                        bundle.cfg)

    queue = iter(jobs)          # pulled lazily: transcribe_many encodes
    B = n_slots                  # each audio only when a slot wants it

    cache = create_cache(bundle.cfg, B, bundle.max_ctx,
                         dtype=bundle.cache_dtype)
    slot_pos = jnp.zeros((B,), jnp.int32)
    slot_logits = jnp.zeros((B, bundle.cfg.vocab_size), jnp.float32)
    slot_active = jnp.zeros((B,), bool)
    slot_job: list = [None] * B
    emitted: dict[int, tuple[list[int], list[float]]] = {}
    budget = params.max_new_tokens

    # batched speculation (decode_chunk_slots_spec): FullParams.speculative_k
    # >0 on, 0 off, <0 auto. Auto resolves ON for CPU — unlike decoding.py's
    # B=1 auto (CPU pays real compute for T=K+1 there); here the CPU
    # backend exists for the test suite, and auto-on keeps the spec pool
    # covered by every serving test. On TPU, auto gates on the validator's
    # spec_slots marker like the B=1 spec_loop gate.
    #
    # Auto additionally runs ADAPTIVELY: the (B, K+1)-wide verify forward
    # costs ~2.1x the plain B-wide chunk on chip, so at full pools the
    # speculative pool only pays when the n-gram accept rate clears that
    # ratio (measured at B=8, zero acceptance: 974 vs 2072 tok/s aggregate
    # — a 2.1x LOSS; at B=1 it is a strict win). Both chunk kernels
    # implement identical greedy semantics (tests assert token-for-token
    # equality), so the pool times each mode's chunks and keeps running
    # the faster one, re-probing the loser every _PROBE_EVERY chunks.
    # ≙ the role of ggml's runtime backend/kernel selection, applied at
    # the scheduler altitude.
    spec_k = getattr(params, "speculative_k", 0)
    spec_auto = spec_k < 0
    if spec_k < 0:
        import jax as _jax
        from qwen2_audio_tpu.utils.watchdog import kernel_marker
        on_tpu = _jax.default_backend() in ("tpu", "axon")
        spec_k = 7 if (not on_tpu or kernel_marker("spec_slots")) else 0
    adaptive = spec_auto and spec_k > 0
    if spec_k > 0:
        # a slot can emit up to chunk_tokens-1 past the host budget before
        # the host marks it finished; size the draft history for the full
        # device-side stream so late-tail drafting never goes stale
        hbuf = budget + chunk_tokens + spec_k + 8
        slot_hist = jnp.zeros((B, hbuf), jnp.int32)
        slot_hlen = jnp.zeros((B,), jnp.int32)
    else:
        slot_hist = slot_hlen = None

    def refill(free_slots):
        nonlocal cache, slot_pos, slot_logits, slot_active
        nonlocal slot_hist, slot_hlen
        for s in free_slots:
            job = next(queue, None)
            if job is None:
                break
            audio = bundle.project_audio(job.enc)
            pre = _prefill_embeds(bundle, audio, base_prompt)[0][None]
            cache, slot_pos, slot_logits, slot_active = _prefill(
                cache, slot_pos, slot_logits,
                slot_active, jnp.int32(s), jnp.asarray(pre))
            if blank is not None:    # step-0 blank/EOT suppression
                slot_logits = slot_logits.at[s].add(blank)
            if spec_k > 0:      # fresh draft history for the new stream
                slot_hist = slot_hist.at[s].set(0)
                slot_hlen = slot_hlen.at[s].set(0)
            slot_job[s] = job
            emitted[s] = ([], [])

    refill(range(B))
    t0 = time_us()
    t_refill_us = 0     # lazy-job encode time inside the decode window
    #                     (transcribe_many) — excluded from t_decode_us,
    #                     encode_windows already booked it as encode time
    n_decoded = 0
    import time as _time
    rates = {True: [], False: []}      # mode -> recent tok/s samples
    warmed = {True: False, False: False}   # first chunk per mode carries
    #                                        XLA compile time: discard it
    LAST_POOL_STATS.clear()
    LAST_POOL_STATS.update({"spec_chunks": 0, "plain_chunks": 0})
    stats = LAST_POOL_STATS
    chunk_i = 0

    probe = {"interval": _PROBE_MIN, "next": _PROBE_MIN, "winner": None}

    def _pick_spec() -> bool:
        if not adaptive:
            return spec_k > 0
        if not rates[True]:
            return True                # sample spec first
        if not rates[False]:
            return False               # then one plain sample
        spec_wins = (np.mean(rates[True][-3:])
                     >= np.mean(rates[False][-3:]))
        if probe["winner"] is None:
            probe["winner"] = spec_wins
        elif probe["winner"] != spec_wins:
            # regime change (acceptance rose/fell): re-probe eagerly again
            probe.update(interval=_PROBE_MIN,
                         next=chunk_i + _PROBE_MIN, winner=spec_wins)
        if chunk_i >= probe["next"]:
            # probe the loser; each confirmation backs the cadence off
            probe["interval"] = min(probe["interval"] * 2, _PROBE_MAX)
            probe["next"] = chunk_i + probe["interval"]
            return not spec_wins
        return spec_wins

    while any(j is not None for j in slot_job):
        if params.abort_callback is not None and params.abort_callback():
            break               # ≙ whisper_full's abort_callback contract
        use_spec = spec_k > 0 and _pick_spec()
        t_chunk = _time.perf_counter()
        if use_spec:
            (cache, slot_pos, slot_logits, slot_active, slot_hist,
             slot_hlen, toks, lps, n_new, _iters) = _chunk_spec(
                cache, slot_pos, slot_logits,
                slot_active, slot_hist, slot_hlen, sup_mask,
                chunk=chunk_tokens,
                eos_token_id=bundle.eos_token_id, spec_k=spec_k)
            n_new = np.asarray(n_new)
        else:
            pos_before = np.asarray(slot_pos)
            cache, slot_pos, slot_logits, slot_active, toks, lps = \
                _chunk(
                    cache, slot_pos, slot_logits,
                    slot_active, sup_mask, chunk=chunk_tokens,
                    eos_token_id=bundle.eos_token_id)
            # exact per-slot emission: the plain pool advances pos once
            # per REAL token (frozen steps pad toks with eos but do not
            # advance) — without this, a capacity freeze would append a
            # phantom EOS the model never emitted
            n_new = np.asarray(slot_pos) - pos_before
            if spec_k > 0:
                # keep draft history current across plain chunks so a later
                # spec chunk drafts from fresh context (stale history only
                # lowers acceptance — drafts are verified — but fresh is
                # free: one small scatter)
                slot_hist, slot_hlen = _append_hist(
                    slot_hist, slot_hlen, toks, jnp.asarray(n_new))
        if spec_k > 0:
            # np.asarray(n_new) above already forced the readback, so this
            # wall time covers the device work, not just dispatch
            dt = max(_time.perf_counter() - t_chunk, 1e-6)
            if warmed[use_spec]:
                rates[use_spec].append(float(n_new.sum()) / dt)
                del rates[use_spec][:-8]
            else:
                # each mode's first chunk pays its XLA compile (minutes on
                # a fresh program shape) — feeding it into the adaptive
                # rates would pick the winner by compile latency and keep
                # the tainted sample in the mean across probe intervals
                warmed[use_spec] = True
            stats["spec_chunks" if use_spec else "plain_chunks"] += 1
            chunk_i += 1
        toks = np.asarray(toks)
        lps = np.asarray(lps)
        active = np.asarray(slot_active)
        finished = []
        for s in range(B):
            if slot_job[s] is None:
                continue
            row, lrow = emitted[s]
            for j in range(int(n_new[s])):
                if len(row) >= budget:
                    break
                row.append(int(toks[s, j]))
                lrow.append(float(lps[s, j]))
                n_decoded += 1
                if row[-1] == bundle.eos_token_id:
                    # real EOS (greedy semantics: keep it, stop); steps
                    # after it are frozen-slot padding
                    break
            if (not active[s]) or len(row) >= budget:
                finished.append(s)
        for s in finished:
            job = slot_job[s]
            slot_job[s] = None
            slot_active = slot_active.at[s].set(False)
            row, lrow = emitted.pop(s)
            seg = Segment(
                t0_cs=job.t0_cs, t1_cs=job.t1_cs,
                text=bundle.text(row), tokens=row,
                avg_logprob=float(np.mean(lrow)) if lrow else 0.0)
            state.segments.append(_segment_dict(bundle, seg, lrow))
            if params.new_segment_callback is not None:
                params.new_segment_callback(ctx, state, 1)
            yield job, seg
        if finished:
            tr = time_us()
            refill(finished)
            t_refill_us += time_us() - tr
    state.timings.t_decode_us += time_us() - t0 - t_refill_us
    state.timings.n_decode += n_decoded


def transcribe_continuous(
    ctx: WhisperContext,
    samples: np.ndarray,
    params: FullParams | None = None,
    max_streams: int = 8,
    chunk_tokens: int = 16,
    mesh=None,
) -> Iterator[Segment]:
    """Continuous batching over 30 s windows: a fixed pool of
    `max_streams` decode slots shares ONE KV cache; when a window
    finishes (EOS or token budget) its slot is refilled with the next
    window while the others keep decoding — no lockstep barrier at
    bucket edges (ROADMAP round-1 lever 4; the reference's declared
    whisper_full_parallel never existed to compare against).

    Device primitives: generate.prefill_slot (install one stream's K/V
    block + first logits at a slot index) and generate.decode_chunk_slots
    (advance every active slot `chunk_tokens` with per-slot positions).
    Segments are yielded in COMPLETION order, each tagged with its window
    time range.

    ``mesh``: a jax Mesh with a "tp" axis runs the decode tensor-parallel
    through the production quant kernels (parallel/tp.py shard_map;
    requires the canonical unfused decoder schema). Data-parallel serving
    needs no machinery: run one pool per replica.
    """
    if ctx.decoder is None:
        raise RuntimeError("transcribe_continuous requires an attached "
                           "decoder")
    params = params or FullParams()
    hp = ctx.hparams
    state = ctx.state or ctx.init_state()

    if ctx.pcm_to_mel_with_state(state, samples) != 0:
        raise RuntimeError("mel computation failed")
    mel = state.mel
    state.segments = []     # fresh transcript per call (≙ whisper_full)
    offsets = _chunk_offsets(mel.n_len_org, hp.n_audio_ctx)
    if not offsets:
        return
    window_cs = 2 * hp.n_audio_ctx
    bucket = min(max_streams, len(offsets))

    def jobs():
        # LAZY bucketed encode: held encoder output is bounded by one
        # bucket beyond the pool instead of the whole audio (a 2 h input
        # is ~0.9 GB of encoder output if materialized up front), and the
        # first token doesn't wait for every window to encode
        for i in range(0, len(offsets), bucket):
            group = offsets[i:i + bucket]
            # encode bucket = the measured-best default (B=1): one
            # executable trivially, and 22% faster per clip than B=8
            # (encode_windows docstring); `bucket` only sizes how many
            # encoder outputs are held ahead of the decode pool
            enc = encode_windows(ctx, mel, group)
            for w, off in enumerate(group):
                yield _Job(i + w, enc[w], off,
                           min(off + window_cs, mel.n_len_org))

    for _job, seg in _serve_pool(ctx, params, jobs(),
                                 min(max_streams, len(offsets)),
                                 chunk_tokens, mesh):
        yield seg


def transcribe_many(
    ctx: WhisperContext,
    audios: list,
    params: FullParams | None = None,
    max_streams: int = 8,
    chunk_tokens: int = 16,
    mesh=None,
) -> "Iterator[tuple[int, Segment]]":
    """Continuous batching ACROSS requests: the windows of MANY audio
    inputs share one slot pool — a short clip's slot refills with the
    next request's window while long clips keep decoding, so no request
    waits for a batch barrier (the production serving shape; nothing in
    the reference compares — its whisper_full_parallel was never even
    implemented for ONE audio, include/qwen2-whisper.h:464-469).

    Yields (audio_index, Segment) in COMPLETION order across requests.
    """
    if ctx.decoder is None:
        raise RuntimeError("transcribe_many requires an attached decoder")
    params = params or FullParams()
    hp = ctx.hparams
    state = ctx.state or ctx.init_state()
    state.segments = []     # fresh transcript per call (≙ whisper_full)
    window_cs = 2 * hp.n_audio_ctx

    def jobs():
        # LAZY per-audio: mel + encode run only when the pool pulls a
        # request's first window, so first-token latency and held encoder
        # outputs scale with the pool depth, not the queue length
        for a, samples in enumerate(audios):
            if ctx.pcm_to_mel_with_state(state, samples) != 0:
                raise RuntimeError(f"mel computation failed (audio {a})")
            mel = state.mel
            offsets = _chunk_offsets(mel.n_len_org, hp.n_audio_ctx)
            if not offsets:
                continue
            enc = encode_windows(ctx, mel, offsets)
            for w, off in enumerate(offsets):
                yield _Job(a, enc[w], off,
                           min(off + window_cs, mel.n_len_org))

    for job, seg in _serve_pool(ctx, params, jobs(), max_streams,
                                chunk_tokens, mesh):
        yield job.tag, seg
