"""End-to-end runtime API tests: init_from_file -> full() -> accessors,
mirroring the reference CLI flow (examples/main/main.cpp:455-589)."""

import io

import numpy as np
import pytest

from qwen2_audio_tpu.audio import mel_filterbank
from qwen2_audio_tpu.config import WhisperHParams, GGMLFType, GGMLType
from qwen2_audio_tpu.io.export import write_encoder_checkpoint, quantize_checkpoint
from qwen2_audio_tpu.models.encoder import random_encoder_params
from qwen2_audio_tpu.runtime import (
    ContextParams,
    FullParams,
    WhisperContext,
    full_default_params,
)

HP = WhisperHParams(n_vocab=64, n_audio_ctx=1500, n_audio_state=64,
                    n_audio_head=4, n_audio_layer=2, n_mels=16)


@pytest.fixture(scope="module")
def model_buf():
    rng = np.random.default_rng(3)
    params = random_encoder_params(rng, HP)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, params, HP, mel_filterbank(HP.n_mels),
                             [b"tok%d" % i for i in range(60)])
    return buf.getvalue()


@pytest.fixture(scope="module")
def ctx(model_buf):
    return WhisperContext.init_from_buffer_with_params(model_buf)


def test_init_and_accessors(ctx):
    assert ctx.n_vocab() == 64
    assert ctx.n_audio_ctx() == 1500
    assert ctx.model_n_mels() == 16
    assert not ctx.is_multilingual()
    assert ctx.model_ftype() == 1
    assert ctx.token_eot() == 50256
    assert ctx.model_type_readable() == "unknown"


def test_full_runs_encoder(ctx, rng):
    samples = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    rc = ctx.full(full_default_params(), samples)
    assert rc == 0
    assert ctx.state.embd_enc is not None
    assert ctx.state.embd_enc.shape == (750, HP.n_audio_state)
    assert ctx.n_len() > 0
    assert ctx.state.timings.n_encode == 1
    assert ctx.state.timings.t_encode_us > 0
    assert ctx.state.timings.t_mel_us > 0


def test_full_too_short_is_guarded(ctx, rng):
    """< 1 s of mel frames returns 0 without encoding (reference :2359-2364)."""
    before = ctx.state.timings.n_encode
    rc = ctx.full(full_default_params(), np.zeros(800, np.float32))
    assert rc == 0
    assert ctx.state.timings.n_encode == before


def test_full_offset_duration(ctx, rng):
    samples = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    p = full_default_params()
    p.offset_ms = 1000
    rc = ctx.full(p, samples)
    assert rc == 0


def test_encoder_begin_callback_abort(ctx, rng):
    p = full_default_params()
    p.encoder_begin_callback = lambda c, s: False
    rc = ctx.full(p, (0.1 * rng.standard_normal(32000)).astype(np.float32))
    assert rc == -4


def test_set_mel_validation(ctx):
    assert ctx.set_mel(np.zeros((99, 100), np.float32)) == -1
    assert ctx.set_mel(np.zeros((16, 3000), np.float32)) == 0
    assert ctx.n_len() == 3000


def test_encode_without_mel_fails():
    pass  # covered by fresh-state test below


def test_fresh_state_encode_fails(model_buf):
    c = WhisperContext.init_from_buffer_with_params(model_buf)
    assert c.encode(0) == -1  # no mel yet


def test_full_parallel_batches(ctx, rng):
    samples = (0.1 * rng.standard_normal(16000 * 4)).astype(np.float32)
    rc = ctx.full_parallel(full_default_params(), samples, n_processors=2)
    assert rc == 0
    assert ctx.state.embd_enc.shape == (2 * 750, HP.n_audio_state)


def test_full_parallel_transcribes_chunks(model_buf, rng):
    """With a decoder attached, -p N produces one decoded segment per 30 s
    window (upstream whisper_full_parallel semantics), matching the
    sequential full() output per chunk."""
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle

    dcfg = Qwen2DecoderConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    c = WhisperContext.init_from_buffer_with_params(model_buf)
    c.decoder = random_bundle(np.random.default_rng(5), dcfg,
                              enc_state=HP.n_audio_state, max_ctx=1024)
    samples = (0.1 * rng.standard_normal(16000 * 65)).astype(np.float32)

    p = full_default_params()
    p.max_new_tokens = 6
    p.temperature_inc = 0.0
    rc = c.full_parallel(p, samples, n_processors=2)
    assert rc == 0
    assert len(c.state.segments) == 3          # 65 s -> 3 windows
    assert all(s["tokens"] for s in c.state.segments)
    assert c.state.result_tokens == [
        t for s in c.state.segments for t in s["tokens"]]

    # sequential oracle: full() on each 30 s window
    for i, seg in enumerate(c.state.segments):
        c2 = WhisperContext.init_from_buffer_with_params(model_buf)
        c2.decoder = c.decoder
        p2 = full_default_params()
        p2.max_new_tokens = 6
        p2.temperature_inc = 0.0
        p2.offset_ms = i * 30_000
        assert c2.full(p2, samples) == 0
        assert c2.state.result_tokens == seg["tokens"]


def test_print_emb_enc(ctx, rng, capsys):
    ctx.full(full_default_params(), (0.1 * rng.standard_normal(32000)).astype(np.float32))
    fp = ctx.print_emb_enc()
    assert len(fp.split()) == 20


def test_quantize_checkpoint_roundtrip(model_buf):
    src = io.BytesIO(model_buf)
    dst = io.BytesIO()
    result = quantize_checkpoint(src, dst, GGMLFType.MOSTLY_Q8_0)
    # attention / fc weights quantized; norms, biases, convs, pos embed not
    assert result["layers.0.fc1.weight"] == int(GGMLType.Q8_0)
    assert result["layers.0.self_attn.q_proj.weight"] == int(GGMLType.Q8_0)
    assert result["conv1.weight"] == int(GGMLType.F16)
    assert result["layer_norm.weight"] == int(GGMLType.F32)
    assert result["embed_positions.weight"] == int(GGMLType.F32)

    # the quantized file loads and encodes
    dst.seek(0)
    c = WhisperContext.init_from_buffer_with_params(dst.getvalue())
    assert c.hparams.ftype == int(GGMLFType.MOSTLY_Q8_0)
    rc = c.full(full_default_params(),
                (0.1 * np.random.default_rng(0).standard_normal(32000)).astype(np.float32))
    assert rc == 0
    assert np.isfinite(c.state.embd_enc).all()


def test_timings_print(ctx, capsys):
    msgs = []
    from qwen2_audio_tpu.utils.logging import log_set
    log_set(lambda lvl, text, ud: msgs.append(text))
    try:
        ctx.print_timings()
        ctx.reset_timings()
        assert ctx.state.timings.n_encode == 0
    finally:
        log_set(None)
    assert any("encode time" in m for m in msgs)


def test_audio_ctx_shrink(ctx, rng):
    """Experimental audio_ctx override shrinks the encode window
    (exp_n_audio_ctx semantics, src/qwen2-whisper.cpp:1898, :2244)."""
    samples = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    ctx.pcm_to_mel(samples)
    rc = ctx.encode(0, audio_ctx=512)
    assert rc == 0
    assert ctx.state.embd_enc.shape == (256, HP.n_audio_state)
    # larger than the model maximum is rejected
    assert ctx.encode(0, audio_ctx=HP.n_audio_ctx + 10) == -2


def test_get_logits_populated_by_decode(rng):
    import io as _io
    from qwen2_audio_tpu.audio import mel_filterbank as _mf
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint as _w
    from qwen2_audio_tpu.models.encoder import random_encoder_params as _rp
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle

    buf = _io.BytesIO()
    _w(buf, _rp(rng, HP), HP, _mf(HP.n_mels), [b"x"] * 60)
    c = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    cfg = Qwen2DecoderConfig(vocab_size=96, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=1,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=16, tie_word_embeddings=False)
    c.decoder = random_bundle(rng, cfg, enc_state=64, max_ctx=1024)
    p = full_default_params()
    p.max_new_tokens = 4
    p.temperature_inc = 0.0
    assert c.full(p, (0.1 * rng.standard_normal(32000)).astype(np.float32)) == 0
    logits = c.get_logits()
    assert logits is not None and logits.shape == (1, 96)


def test_gelu_flavor_auto_by_provenance(tmp_path):
    """A ggml-loaded context defaults to the reference's tanh-LUT gelu
    flavor (ggml/src/ggml.c ggml_vec_gelu_f32); explicit False pins exact
    erf (the HF torch flavor) and changes the encoder output."""
    import numpy as np
    from qwen2_audio_tpu.audio import mel_filterbank, write_wav
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.runtime import ContextParams, WhisperContext

    hp = WhisperHParams(n_vocab=16, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=1, n_mels=16)
    model = str(tmp_path / "m.bin")
    write_encoder_checkpoint(model,
                             random_encoder_params(np.random.default_rng(3),
                                                   hp),
                             hp, mel_filterbank(hp.n_mels),
                             [b"t%d" % i for i in range(16)])
    t = np.arange(24000) / 16000.0
    pcm = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

    from qwen2_audio_tpu.runtime import full_default_params

    cp = ContextParams()
    ctx = WhisperContext.init_from_file_with_params(model, cp)
    assert cp.gelu_approximate is None          # caller's object untouched
    assert ctx.params.gelu_approximate is True  # ggml provenance -> tanh
    assert ctx.full(full_default_params(), pcm) == 0
    enc_tanh = ctx.state.embd_enc.copy()

    ctx2 = WhisperContext.init_from_file_with_params(
        model, ContextParams(gelu_approximate=False))
    assert ctx2.full(full_default_params(), pcm) == 0
    enc_erf = ctx2.state.embd_enc
    diff = np.abs(enc_tanh - enc_erf).max()
    assert 0 < diff < 5e-2                      # flavors differ, boundedly
