"""Training checkpoint save/restore + encoder export round-trip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from qwen2_audio_tpu.config import (
    Qwen2AudioConfig,
    Qwen2DecoderConfig,
    WhisperHParams,
)
from qwen2_audio_tpu.training.checkpoint import (
    export_encoder_to_ggml,
    restore_train_state,
    save_train_state,
)
from qwen2_audio_tpu.training.step import init_train_state, make_train_step

AUDIO = WhisperHParams(n_vocab=64, n_audio_ctx=32, n_audio_state=64,
                       n_audio_head=4, n_audio_layer=2, n_mels=16)
TEXT = Qwen2DecoderConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, tie_word_embeddings=False)
CFG = Qwen2AudioConfig(audio=AUDIO, text=TEXT)


def test_save_restore_roundtrip(tmp_path, rng):
    opt = optax.adamw(1e-3)
    state = init_train_state(rng, CFG, opt)
    step = make_train_step(CFG, opt)

    mel = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 128, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.float32)
    state, _ = step(state, mel, toks, mask)
    state, loss1 = step(state, mel, toks, mask)

    path = save_train_state(tmp_path / "ckpt", state)
    assert path.exists()

    template = init_train_state(np.random.default_rng(99), CFG, opt)
    restored = restore_train_state(tmp_path / "ckpt", template)
    assert int(restored.step) == 2

    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues identically from the restored state
    _, loss_a = step(state, mel, toks, mask)
    _, loss_b = step(restored, mel, toks, mask)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_export_encoder_to_ggml(tmp_path, rng):
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params

    opt = optax.adamw(1e-3)
    state = init_train_state(rng, CFG, opt)
    out = str(tmp_path / "finetuned.bin")
    export_encoder_to_ggml(out, state, AUDIO, mel_filterbank(16), [b"x"] * 60)

    ctx = WhisperContext.init_from_file_with_params(out)
    assert ctx.hparams.n_audio_state == 64
    rc = ctx.full(full_default_params(),
                  (0.1 * rng.standard_normal(32000)).astype(np.float32))
    assert rc == 0


def test_param_cache_roundtrip(tmp_path, rng):
    """Device-layout disk cache: quantized pytree (incl. bf16 + int8 + list
    nesting) round-trips bit-exactly through one .npz."""
    import ml_dtypes
    from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig
    from qwen2_audio_tpu.io.param_cache import cached_build, load_pytree, save_pytree
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params

    cfg = Qwen2DecoderConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    p = random_decoder_params(rng, cfg, host=True)
    p["_aux"] = [np.arange(3), {"x": np.float32(2.5) * np.ones(2)}]
    p["_bf16"] = np.ones((4, 4), ml_dtypes.bfloat16)
    q = quantize_decoder_params(p, GGMLType.Q8_0, to_device=False)

    path = str(tmp_path / "cache.npz")
    save_pytree(path, q)
    r = load_pytree(path)

    import jax
    leaves_a, td_a = jax.tree_util.tree_flatten(q)
    leaves_b, td_b = jax.tree_util.tree_flatten(r)
    assert td_a == td_b
    for a, b in zip(leaves_a, leaves_b):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cached_build: second call must not invoke the builder
    calls = []
    t1 = cached_build(path, lambda: calls.append(1) or q)
    assert not calls and jax.tree_util.tree_structure(t1) == td_a
