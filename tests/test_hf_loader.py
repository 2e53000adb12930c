"""HF Qwen2-Audio checkpoint loading end-to-end with a synthetic tiny model
saved by transformers itself."""

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    import torch
    from transformers import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
        Qwen2AudioForConditionalGeneration,
    )
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config

    audio = Qwen2AudioEncoderConfig(
        d_model=64, encoder_attention_heads=4, encoder_layers=2,
        num_mel_bins=16, max_source_positions=1500, encoder_ffn_dim=256)
    text = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1_000_000.0, tie_word_embeddings=False)
    cfg = Qwen2AudioConfig(audio_config=audio.to_dict(),
                           text_config=text.to_dict(), audio_token_index=120)
    torch.manual_seed(11)
    model = Qwen2AudioForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("hf_qwen2audio")
    model.save_pretrained(str(d))
    return str(d), model


def test_load_qwen2_audio(hf_dir, rng):
    import torch
    path, hf_model = hf_dir
    from qwen2_audio_tpu.io.hf import load_qwen2_audio
    from qwen2_audio_tpu.models.encoder import encoder_forward

    loaded = load_qwen2_audio(path, dtype=jnp.float32,
                              cache_dtype=jnp.float32)
    hp = loaded["hparams"]
    assert hp.n_audio_state == 64 and hp.n_audio_layer == 2
    assert loaded["decoder_config"].num_key_value_heads == 2

    # encoder parity vs the HF audio tower
    mel = rng.standard_normal((1, 16, 3000)).astype(np.float32)
    with torch.no_grad():
        want = hf_model.audio_tower(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(encoder_forward(loaded["encoder_params"],
                                     jnp.asarray(mel), hp))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_generation_matches_hf(hf_dir, rng):
    import torch
    path, hf_model = hf_dir
    from qwen2_audio_tpu.io.hf import load_qwen2_audio
    from qwen2_audio_tpu.models.encoder import encoder_forward
    from qwen2_audio_tpu.runtime.decoding import greedy_decode

    loaded = load_qwen2_audio(path, dtype=jnp.float32,
                              cache_dtype=jnp.float32)
    hp, bundle = loaded["hparams"], loaded["bundle"]

    mel = rng.standard_normal((1, 16, 3000)).astype(np.float32)
    enc = encoder_forward(loaded["encoder_params"], jnp.asarray(mel), hp)
    audio = bundle.project_audio(np.asarray(enc)[0])

    # HF path: merge audio features into input embeds manually
    prompt = np.asarray([[5, 9, 17]])
    with torch.no_grad():
        hf_audio = hf_model.multi_modal_projector(
            hf_model.audio_tower(torch.from_numpy(mel)).last_hidden_state)
        tok_emb = hf_model.get_input_embeddings()(torch.from_numpy(prompt))
        inputs_embeds = torch.cat([hf_audio, tok_emb], dim=1)
        want = hf_model.language_model.generate(
            inputs_embeds=inputs_embeds, max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0)[0].numpy()

    from qwen2_audio_tpu.models.qwen2_decoder import embed_tokens
    prefill = jnp.concatenate(
        [audio[None], embed_tokens(bundle.params, jnp.asarray(prompt))],
        axis=1)
    got = greedy_decode(bundle, prefill, max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(got.tokens[0]), want[:8])


def test_convert_hf_to_ggml_tool(hf_dir, tmp_path):
    import subprocess, sys
    path, _ = hf_dir
    out = str(tmp_path / "model.bin")
    r = subprocess.run(
        [sys.executable, "tools/convert_hf_to_ggml.py", path, out],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params
    ctx = WhisperContext.init_from_file_with_params(out)
    assert ctx.hparams.n_audio_state == 64
    rc = ctx.full(full_default_params(),
                  (0.1 * np.random.default_rng(0).standard_normal(32000)
                   ).astype(np.float32))
    assert rc == 0
    assert ctx.state.embd_enc.shape == (750, 64)


def test_load_with_decoder_quant(hf_dir, rng):
    import jax.numpy as jnp
    from qwen2_audio_tpu.io.hf import load_qwen2_audio
    from qwen2_audio_tpu.models.encoder import encoder_forward
    from qwen2_audio_tpu.runtime.decoding import greedy_decode

    path, _ = hf_dir
    fp = load_qwen2_audio(path, dtype=jnp.float32, cache_dtype=jnp.float32)
    q8 = load_qwen2_audio(path, dtype=jnp.float32, cache_dtype=jnp.float32,
                          decoder_quant="q8_0")
    fast = load_qwen2_audio(path, dtype=jnp.float32, cache_dtype=jnp.float32,
                            decoder_quant="w8a8")
    # the loader applies the measured-best single-chip schema by default
    # (fused qkv/gate_up); fuse=False keeps the canonical TP-able layout
    assert "qs" in q8["bundle"].params["layers"]["qkv"]
    assert "qs8" in fast["bundle"].params["layers"]["qkv"]
    q8u = load_qwen2_audio(path, dtype=jnp.float32, cache_dtype=jnp.float32,
                           decoder_quant="q8_0", fuse=False)
    assert "qs" in q8u["bundle"].params["layers"]["q"]
    # q4_0 on CPU auto-panelizes the packed leaves (qmm_q4panel gating)
    q4 = load_qwen2_audio(path, dtype=jnp.float32, cache_dtype=jnp.float32,
                          decoder_quant="q4_0")
    assert any(k in q4["bundle"].params["layers"]["qkv"]
               for k in ("qs4_p", "qs_p", "qs4", "qs"))

    mel = rng.standard_normal((1, 16, 3000)).astype(np.float32)
    enc = encoder_forward(fp["encoder_params"], jnp.asarray(mel),
                          fp["hparams"])
    audio = fp["bundle"].project_audio(np.asarray(enc)[0])[None]
    a = greedy_decode(fp["bundle"], audio, max_new_tokens=4)
    b = greedy_decode(q8["bundle"], audio, max_new_tokens=4)
    # same first token through q8 quantization
    assert a.tokens[0][0] == b.tokens[0][0]
