"""Public runtime API mirroring the reference's C surface
(include/qwen2-whisper.h:141-527) on TPU-native internals.

Semantics carried over:
- context (weights) / state (per-run buffers) split with the *_no_state /
  init_state lifecycle (header :147-177)
- whisper_full = pcm -> mel -> offset/duration windowing -> <1 s guard ->
  encode (src/qwen2-whisper.cpp:2341-2383)
- encode works on a 2*n_ctx mel window starting at mel_offset, zero-padded
  past the mel end (:2261-2285)
- accessor set: n_len(=n_len_org), n_vocab, hparams fields, special tokens,
  get_logits, token_to_str (:3435-3514)
- per-phase timings + print/reset (:3516-3551)

TPU-native differences:
- no backend scheduler / compute-buffer pre-allocation: XLA owns placement
  and memory; 'state init' just resets host-side buffers
- encode is one jitted program (conv + transformer fused by XLA) instead of
  the reference's two scheduler phases
- a first-class batch dimension; whisper_full_parallel maps onto it
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from qwen2_audio_tpu.audio.mel import (
    LogMelSpectrogram,
    log_mel_spectrogram,
    mel_input_window,
)
from qwen2_audio_tpu.config import WhisperHParams
from qwen2_audio_tpu.io.ggml_format import GGMLModelFile, read_ggml_file
from qwen2_audio_tpu.models.encoder import encoder_forward, encoder_params_from_ggml
from qwen2_audio_tpu.tokenizer import WhisperVocab
from qwen2_audio_tpu.utils.logging import log_error, log_info, log_warn
from qwen2_audio_tpu.utils.timings import Timings, time_us


@dataclasses.dataclass
class ContextParams:
    """≙ whisper_context_params (header :114-139). GPU toggles map to TPU
    equivalents: use_gpu -> run on the default JAX backend; flash_attn ->
    the Pallas flash-attention kernel."""

    use_gpu: bool = True
    flash_attn: bool = False
    gpu_device: int = 0
    dtw_token_timestamps: bool = False
    dtw_n_top: int = -1
    compute_dtype: Any = jnp.float32
    gelu_approximate: bool | None = None  # None = auto by checkpoint
    # provenance: a WhisperContext always holds a ggml checkpoint, whose
    # reference runtime computes GELU as the tanh approximation through an
    # f16 LUT (ggml/src/ggml.c ggml_vec_gelu_f32) — so ggml contexts
    # default to the tanh flavor (reference-faithful AND ~7% faster on
    # VPU); HF-loaded encoders (io/hf.py -> encoder_forward directly)
    # keep exact erf, matching torch Qwen2AudioEncoder. Set True/False to
    # pin either flavor.
    fused_mel: bool | None = None    # None = auto (Pallas kernel on TPU)
    keep_quantized: bool | None = None  # None = auto: quant kernels on TPU


@dataclasses.dataclass
class FullParams:
    """≙ whisper_full_params (header :359-437), defaults from
    whisper_full_default_params (src/qwen2-whisper.cpp:4231-4294)."""

    n_threads: int = 4
    n_max_text_ctx: int = 16384
    offset_ms: int = 0
    duration_ms: int = 0

    translate: bool = False
    no_context: bool = True
    no_timestamps: bool = False
    single_segment: bool = False
    print_special: bool = False
    print_progress: bool = True
    print_realtime: bool = False
    print_timestamps: bool = True

    token_timestamps: bool = False
    thold_pt: float = 0.01
    thold_ptsum: float = 0.01
    max_len: int = 0
    split_on_word: bool = False
    max_tokens: int = 0

    debug_mode: bool = False
    audio_ctx: int = 0

    tdrz_enable: bool = False
    suppress_regex: str | None = None
    initial_prompt: str | None = None
    prompt_tokens: list[int] | None = None

    language: str | None = "en"
    detect_language: bool = False

    suppress_blank: bool = True
    suppress_non_speech_tokens: bool = False

    temperature: float = 0.0
    max_initial_ts: float = 1.0
    length_penalty: float = -1.0

    temperature_inc: float = 0.2
    entropy_thold: float = 2.4
    # zlib compression ratio of the decoded text above which the decode is
    # considered degenerate and the temperature fallback fires (OpenAI
    # whisper's compression_ratio_threshold semantics, default 2.4; the
    # primary repetition detector — _token_entropy is the secondary guard)
    compression_ratio_thold: float = 2.4
    logprob_thold: float = -1.0
    no_speech_thold: float = 0.6

    # decoding (Qwen2 decoder integration; scaffolding the reference never
    # merged — SURVEY.md §0.2)
    strategy: str = "greedy"     # "greedy" | "beam"
    beam_size: int = 5
    best_of: int = 5
    max_new_tokens: int = 128
    repetition_penalty: float = 1.0
    # n-gram speculative decoding (TPU extension; exact greedy output).
    # -1 = auto: 7 drafts/forward on TPU backends, off on CPU (measured:
    # even with ZERO acceptance the (K+1)-wide verification forward beats
    # T=1 stepping by ~1.7x at 1.5B — the M=1 matmul tax); 0 = off;
    # > 0: explicit draft count. Only applies to plain greedy decodes
    # (temperature 0, no penalties, B=1, no abort callback)
    speculative_k: int = -1

    new_segment_callback: Callable | None = None
    progress_callback: Callable | None = None
    encoder_begin_callback: Callable | None = None
    abort_callback: Callable | None = None


def context_default_params() -> ContextParams:
    return ContextParams()


def full_default_params(strategy: str = "greedy") -> FullParams:
    return FullParams(strategy=strategy)


class WhisperState:
    """≙ whisper_state (src/qwen2-whisper.cpp:795-881): per-run mel, encoder
    output, logits, timings."""

    def __init__(self) -> None:
        self.mel: LogMelSpectrogram | None = None
        self.embd_enc: np.ndarray | None = None
        self.logits: np.ndarray | None = None
        self.timings = Timings()
        self.exp_n_audio_ctx = 0
        self.lang_id = 0
        self.no_speech_prob = 0.0
        self.segments: list[dict] = []
        self.result_tokens: list[int] = []


class WhisperContext:
    """≙ whisper_context + the C init/accessor API."""

    def __init__(self, model_file: GGMLModelFile, cparams: ContextParams,
                 with_state: bool = True) -> None:
        t0 = time_us()
        if cparams.gelu_approximate is None:
            # ggml provenance -> the reference's tanh-LUT gelu flavor
            # (see the ContextParams field comment); copy so a shared
            # ContextParams object isn't mutated
            import dataclasses
            cparams = dataclasses.replace(cparams, gelu_approximate=True)
        self.params = cparams
        self.hparams = model_file.hparams
        self.filters = model_file.filters
        self.vocab = WhisperVocab.from_token_list(
            model_file.vocab, model_file.hparams.n_vocab)
        keep_q = cparams.keep_quantized
        if keep_q is None:
            keep_q = jax.default_backend() in ("tpu", "axon")
        self.encoder_params = encoder_params_from_ggml(
            model_file, dtype=cparams.compute_dtype, keep_quantized=keep_q)
        # fused QKV is a pure runtime layout (one (d,3d) matmul keeps the
        # MXU fed); the canonical separate-q/k/v schema stays on disk
        from qwen2_audio_tpu.models.encoder import fuse_encoder_qkv
        self.encoder_params = fuse_encoder_qkv(self.encoder_params)
        self.decoder = None          # attached by qwen2_audio model loader
        self.model_file = model_file
        self.state: WhisperState | None = None
        self.t_load_us = time_us() - t0
        if with_state:
            self.state = self.init_state()

    # ---- lifecycle (header :141-177) ----

    @classmethod
    def init_from_file_with_params(cls, path: str,
                                   cparams: ContextParams | None = None
                                   ) -> "WhisperContext":
        return cls(read_ggml_file(path), cparams or ContextParams())

    @classmethod
    def init_from_buffer_with_params(cls, buf: bytes,
                                     cparams: ContextParams | None = None
                                     ) -> "WhisperContext":
        return cls(read_ggml_file(buf), cparams or ContextParams())

    @classmethod
    def init_from_file_with_params_no_state(cls, path: str,
                                            cparams: ContextParams | None = None
                                            ) -> "WhisperContext":
        return cls(read_ggml_file(path), cparams or ContextParams(),
                   with_state=False)

    @classmethod
    def init_from_buffer_with_params_no_state(
            cls, buf: bytes, cparams: ContextParams | None = None
    ) -> "WhisperContext":
        return cls(read_ggml_file(buf), cparams or ContextParams(),
                   with_state=False)

    @classmethod
    def init_with_params(cls, loader, cparams: ContextParams | None = None,
                         with_state: bool = True) -> "WhisperContext":
        """whisper_model_loader vtable form (header :128-136): an object
        with read(n)->bytes / eof()->bool / close() callbacks. The
        reference streams tensor records through it; here the stream is
        drained once and parsed from memory (XLA wants whole arrays)."""
        chunks = []
        while not loader.eof():
            chunk = loader.read(1 << 20)
            if not chunk:
                break
            chunks.append(chunk)
        loader.close()
        return cls(read_ggml_file(b"".join(chunks)),
                   cparams or ContextParams(), with_state=with_state)

    def init_state(self) -> WhisperState:
        st = WhisperState()
        st.timings.t_start_us = time_us()
        st.timings.t_load_us = self.t_load_us
        if self.state is None:
            self.state = st
        return st

    def free(self) -> None:
        self.encoder_params = None
        self.state = None

    # ---- mel (header :208-240) ----

    def pcm_to_mel_with_state(self, state: WhisperState,
                              samples: np.ndarray,
                              n_threads: int = 4) -> int:
        """≙ whisper_pcm_to_mel_with_state (its n_threads drives the
        reference's std::thread mel fan-out, src/qwen2-whisper.cpp:2616).
        Host-side mel here is the threaded native C++ path when the
        optional lib is built (n_threads honored), else vectorized numpy
        (BLAS threading; n_threads has no handle)."""
        t0 = time_us()
        import os
        on_tpu = jax.default_backend() in ("tpu", "axon")
        fused = self.params.fused_mel
        if fused is None:
            fused = on_tpu and os.path.exists("/tmp/qa_kernel_ok_mel")
        if fused:
            from qwen2_audio_tpu.ops.mel_kernel import log_mel_spectrogram_fused
            state.mel = log_mel_spectrogram_fused(samples, self.filters)
        elif on_tpu and self.params.fused_mel is None:
            # fresh TPU host before the validator writes the mel marker:
            # the XLA-gather mel pays a multi-minute remote compile; the
            # host mel is exact (C-loop oracle-tested) and free
            state.mel = self._host_mel(samples, n_threads)
        else:
            state.mel = log_mel_spectrogram(samples, self.filters)
        state.timings.t_mel_us += time_us() - t0
        return 0

    def _host_mel(self, samples: np.ndarray, n_threads: int):
        from qwen2_audio_tpu import native
        if native.available():
            from qwen2_audio_tpu.audio.mel import LogMelSpectrogram
            data, n_len_org = native.log_mel(
                np.asarray(samples, np.float32),
                np.asarray(self.filters, np.float32),
                n_threads=max(1, n_threads))
            return LogMelSpectrogram(data=data, n_len_org=n_len_org)
        from qwen2_audio_tpu.audio.mel import log_mel_spectrogram_np
        return log_mel_spectrogram_np(samples, self.filters)

    def pcm_to_mel(self, samples: np.ndarray, n_threads: int = 4) -> int:
        return self.pcm_to_mel_with_state(self.state, samples, n_threads)

    def set_mel_with_state(self, state: WhisperState, data: np.ndarray) -> int:
        """≙ whisper_set_mel_with_state (:3287-3309): n_mel must match."""
        data = np.asarray(data, dtype=np.float32)
        if data.ndim != 2 or data.shape[0] != self.hparams.n_mels:
            log_error("set_mel: invalid number of mel bands: %d (expected %d)\n",
                      data.shape[0] if data.ndim == 2 else -1,
                      self.hparams.n_mels)
            return -1
        state.mel = LogMelSpectrogram(data=data, n_len_org=data.shape[1])
        return 0

    def set_mel(self, data: np.ndarray) -> int:
        return self.set_mel_with_state(self.state, data)

    # ---- encode (header :242-258) ----

    def encode_with_state(self, state: WhisperState, offset: int,
                          audio_ctx: int = 0,
                          abort_callback: Callable | None = None) -> int:
        """Run the encoder on the mel window starting at ``offset`` frames
        (≙ whisper_encode_with_state / whisper_encode_qwen2_internal)."""
        if state.mel is None:
            log_error("encode: no mel spectrogram (call pcm_to_mel first)\n")
            return -1
        n_ctx = audio_ctx or self.hparams.n_audio_ctx
        if n_ctx > self.hparams.n_audio_ctx:
            log_error("encode: audio_ctx %d > model n_audio_ctx %d\n",
                      n_ctx, self.hparams.n_audio_ctx)
            return -2
        t0 = time_us()
        win = mel_input_window(state.mel, offset, n_ctx)
        out = encoder_forward(
            self.encoder_params, jnp.asarray(win[None]), self.hparams,
            gelu_approximate=self.params.gelu_approximate,
            use_flash=self.params.flash_attn,
            compute_dtype=self.params.compute_dtype)
        state.embd_enc = np.asarray(jax.device_get(out))[0]
        state.timings.t_encode_us += time_us() - t0
        state.timings.n_encode += 1
        if abort_callback is not None and abort_callback():
            return -3
        return 0

    def encode(self, offset: int, audio_ctx: int = 0) -> int:
        return self.encode_with_state(self.state, offset, audio_ctx)

    # ---- full (header :448-471) ----

    def full_with_state(self, state: WhisperState, params: FullParams,
                        samples: np.ndarray | None) -> int:
        """≙ whisper_full_with_state -> whisper_encoder_output_with_state
        (src/qwen2-whisper.cpp:2341-2383): mel, seek window, <1 s guard,
        encode; plus decode when a Qwen2 decoder is attached."""
        if samples is not None and len(samples) > 0:
            if self.pcm_to_mel_with_state(state, samples,
                                          params.n_threads) != 0:
                log_error("full: failed to compute log mel spectrogram\n")
                return -2

        seek_start = params.offset_ms // 10
        n_len = state.mel.n_len_org if state.mel is not None else 0
        seek_end = (n_len if params.duration_ms == 0
                    else seek_start + params.duration_ms // 10)

        if seek_end < seek_start + 100:
            log_warn("full: input is too short - %d ms < 1000 ms. "
                     "consider padding the input audio with silence\n",
                     (seek_end - seek_start) * 10)
            return 0

        if (params.encoder_begin_callback is not None
                and not params.encoder_begin_callback(self, state)):
            return -4

        rc = self.encode_with_state(state, seek_start, params.audio_ctx,
                                    params.abort_callback)
        if rc != 0:
            log_error("full: failed to encode\n")
            return -1

        if self.decoder is not None:
            from qwen2_audio_tpu.runtime import decoding
            return decoding.run(self, state, params)
        return 0

    def full(self, params: FullParams, samples: np.ndarray | None) -> int:
        return self.full_with_state(self.state, params, samples)

    def full_parallel(self, params: FullParams, samples: np.ndarray,
                      n_processors: int) -> int:
        """≙ whisper_full_parallel (header :464-469; declared but never
        implemented in the fork; upstream whisper.cpp ran n states over n
        audio chunks in n threads). Here the batch dimension does the work:
        the audio's 30 s windows are encoded AND decoded in batches of
        ``n_processors`` through runtime/serving.py, yielding one decoded
        segment per window in state.segments — full per-chunk
        transcriptions, like upstream, not just encoder output."""
        if n_processors <= 1:
            return self.full(params, samples)
        if self.decoder is None:
            # encoder-only context (the reference's actual runtime surface):
            # batch the chunk windows through one encoder executable
            chunks = np.array_split(np.asarray(samples, np.float32),
                                    n_processors)
            outs = []
            for ch in chunks:   # mel windows are cheap; encode batches below
                st = WhisperState()
                if self.pcm_to_mel_with_state(st, ch) != 0:
                    return -2
                outs.append(mel_input_window(st.mel, 0,
                                             self.hparams.n_audio_ctx))
            t0 = time_us()
            batch = jnp.asarray(np.stack(outs))
            out = encoder_forward(
                self.encoder_params, batch, self.hparams,
                gelu_approximate=self.params.gelu_approximate,
                use_flash=self.params.flash_attn,
                compute_dtype=self.params.compute_dtype)
            enc = np.asarray(jax.device_get(out))
            self.state.embd_enc = enc.reshape(-1, enc.shape[-1])
            self.state.timings.t_encode_us += time_us() - t0
            self.state.timings.n_encode += n_processors
            return 0
        from qwen2_audio_tpu.runtime.serving import transcribe_long_form
        state = self.state
        try:
            for _ in transcribe_long_form(self, samples, params,
                                          batch_size=n_processors):
                pass   # segments/callbacks are emitted by the generator
        except RuntimeError as e:
            log_error("full_parallel: %s\n", str(e))
            return -2
        state.result_tokens = [t for s in state.segments
                               for t in s["tokens"]]
        return 0

    # ---- accessors (header :296-357) ----

    def n_len(self) -> int:
        return self.state.mel.n_len_org if self.state and self.state.mel else 0

    def n_vocab(self) -> int:
        return self.hparams.n_vocab

    def n_text_ctx(self) -> int:
        return self.hparams.n_text_ctx

    def n_audio_ctx(self) -> int:
        return self.hparams.n_audio_ctx

    def is_multilingual(self) -> bool:
        return self.vocab.is_multilingual

    def model_n_mels(self) -> int:
        return self.hparams.n_mels

    def model_ftype(self) -> int:
        return self.hparams.ftype

    def model_type_readable(self) -> str:
        return self.hparams.model_type

    def get_logits(self) -> np.ndarray | None:
        return self.state.logits if self.state else None

    def token_to_str(self, token_id: int) -> str:
        return self.vocab.token_to_str(token_id)

    def tokenize(self, text: str) -> list[int]:
        return self.vocab.tokenize(text)

    def token_count(self, text: str) -> int:
        return len(self.tokenize(text))

    # special tokens (header :325-341)
    def token_eot(self) -> int: return self.vocab.token_eot
    def token_sot(self) -> int: return self.vocab.token_sot
    def token_solm(self) -> int: return self.vocab.token_solm
    def token_prev(self) -> int: return self.vocab.token_prev
    def token_nosp(self) -> int: return self.vocab.token_nosp
    def token_not(self) -> int: return self.vocab.token_not
    def token_beg(self) -> int: return self.vocab.token_beg
    def token_lang(self, lang_id_: int) -> int: return self.vocab.token_lang(lang_id_)
    def token_translate(self) -> int: return self.vocab.token_translate
    def token_transcribe(self) -> int: return self.vocab.token_transcribe

    # ---- timings / debug (header :343-349, :522-527) ----

    def print_timings(self) -> None:
        if self.state:
            self.state.timings.print()

    def reset_timings(self) -> None:
        if self.state:
            self.state.timings.reset()

    def print_emb_enc(self) -> str:
        """≙ whisper_print_emb_enc (src/qwen2-whisper.cpp:4191-4203)."""
        from qwen2_audio_tpu.models.encoder import fingerprint
        fp = fingerprint(self.state.embd_enc)
        # flush: under the embedded-CPython C shim the process may exit
        # without finalizing the interpreter, losing buffered stdout
        print(fp, flush=True)
        return fp

    # ---- segment accessors (header :472-515); populated by decoding ----

    def full_n_segments(self) -> int:
        return len(self.state.segments)

    def full_lang_id(self) -> int:
        return self.state.lang_id

    def full_get_segment_text(self, i: int) -> str:
        return self.state.segments[i]["text"]

    def full_get_segment_t0(self, i: int) -> int:
        return self.state.segments[i]["t0"]

    def full_get_segment_t1(self, i: int) -> int:
        return self.state.segments[i]["t1"]

    def full_n_tokens(self, i: int) -> int:
        return len(self.state.segments[i]["tokens"])

    def full_get_token_id(self, i: int, j: int) -> int:
        return self.state.segments[i]["tokens"][j]

    def full_get_token_text(self, i: int, j: int) -> str:
        return self.token_to_str(self.state.segments[i]["tokens"][j])

    def full_get_token_p(self, i: int, j: int) -> float:
        return self.state.segments[i]["probs"][j]


def print_system_info() -> str:
    """≙ whisper_print_system_info (:3573-3596), reporting the TPU runtime."""
    import jax as _jax
    devs = _jax.devices()
    return (f"JAX {_jax.__version__} | backend {devs[0].platform} | "
            f"{len(devs)} device(s) | {devs[0].device_kind}")
