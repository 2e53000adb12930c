"""On-device while_loop generation vs the host loop."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import embed_tokens, random_decoder_params
from qwen2_audio_tpu.runtime.decoding import DecoderBundle, greedy_decode
from qwen2_audio_tpu.runtime.generate import greedy_decode_device

CFG = Qwen2DecoderConfig(
    vocab_size=96, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, tie_word_embeddings=False)


@pytest.fixture(scope="module")
def bundle():
    params = random_decoder_params(np.random.default_rng(3), CFG)
    return DecoderBundle(cfg=CFG, params=params, proj_w=jnp.eye(64),
                         proj_b=jnp.zeros(64), eos_token_id=95,
                         bos_tokens=[], post_audio_tokens=[],
                         max_ctx=64, cache_dtype=jnp.float32)


def test_device_matches_host_greedy(bundle, rng):
    prompt = rng.integers(2, 90, (2, 5))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    host = greedy_decode(bundle, prefill, max_new_tokens=10)
    dev = greedy_decode_device(bundle, prefill, max_new_tokens=10)
    assert dev.tokens == host.tokens
    for a, b in zip(dev.logprobs, host.logprobs):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_device_repetition_penalty_matches_host(bundle, rng):
    prompt = rng.integers(2, 90, (1, 4))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    host = greedy_decode(bundle, prefill, max_new_tokens=8,
                         repetition_penalty=2.0)
    dev = greedy_decode_device(bundle, prefill, max_new_tokens=8,
                               repetition_penalty=2.0)
    assert dev.tokens == host.tokens


def test_device_eos_short_circuit(bundle, rng):
    """Streams stop at EOS; buffer tail is EOS padding."""
    prompt = rng.integers(2, 90, (1, 3))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    r = greedy_decode_device(bundle, prefill, max_new_tokens=50)
    toks = r.tokens[0]
    if bundle.eos_token_id in toks:
        assert toks[-1] == bundle.eos_token_id
        assert bundle.eos_token_id not in toks[:-1]


@pytest.mark.parametrize("length_penalty,rep_penalty",
                         [(-1.0, 1.0), (1.0, 1.0), (0.6, 1.3)])
def test_device_beam_matches_host(bundle, rng, length_penalty, rep_penalty):
    from qwen2_audio_tpu.runtime.decoding import beam_search
    from qwen2_audio_tpu.runtime.generate import beam_search_device
    prompt = rng.integers(2, 90, (1, 5))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    host = beam_search(bundle, prefill, beam_size=4, max_new_tokens=10,
                       length_penalty=length_penalty,
                       repetition_penalty=rep_penalty)
    dev = beam_search_device(bundle, prefill, beam_size=4,
                             max_new_tokens=10,
                             length_penalty=length_penalty,
                             repetition_penalty=rep_penalty)
    assert dev.tokens == host.tokens
    np.testing.assert_allclose(dev.logprobs[0], host.logprobs[0], atol=2e-3)


def test_device_beam_matches_hf(rng):
    """Device beam vs HF num_beams generate — the external oracle."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from qwen2_audio_tpu.models.qwen2_decoder import (
        decoder_params_from_hf_state_dict)
    from qwen2_audio_tpu.runtime.generate import beam_search_device

    cfg = Qwen2Config(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        rope_theta=CFG.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(7)
    hf = Qwen2ForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = decoder_params_from_hf_state_dict(sd, CFG)
    b = DecoderBundle(cfg=CFG, params=params, proj_w=jnp.eye(64),
                      proj_b=jnp.zeros(64), eos_token_id=95,
                      bos_tokens=[], post_audio_tokens=[],
                      max_ctx=64, cache_dtype=jnp.float32)
    prompt = rng.integers(2, 90, (1, 5))
    with torch.no_grad():
        want = hf.generate(torch.from_numpy(prompt), max_new_tokens=8,
                           num_beams=4, do_sample=False, eos_token_id=95,
                           pad_token_id=0, length_penalty=1.0,
                           early_stopping=True).numpy()[0, 5:]
    prefill = embed_tokens(params, jnp.asarray(prompt))
    got = beam_search_device(b, prefill, beam_size=4, max_new_tokens=8,
                             length_penalty=1.0)
    tt = [t for t in want if t != 0]
    np.testing.assert_array_equal(np.asarray(got.tokens[0][:len(tt)]), tt)


def test_full_pipeline_uses_device_path(rng):
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params

    hp = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    ctx.decoder = random_bundle(rng, CFG, enc_state=64, max_ctx=1024)

    p = full_default_params()
    p.max_new_tokens = 8
    p.temperature_inc = 0.0
    rc = ctx.full(p, (0.1 * rng.standard_normal(32000)).astype(np.float32))
    assert rc == 0
    assert len(ctx.state.result_tokens) > 0
    assert ctx.state.timings.t_decode_us > 0


def test_suppress_first_parity_all_paths(bundle, rng):
    """FullParams.suppress_blank lowers to a step-0 additive mask that is
    applied in FIVE decode implementations (host greedy/beam, device
    greedy/beam, speculative). CLAUDE.md requires host-vs-device parity
    for every decode-path change: same mask -> identical tokens on every
    path, and the mask must actually flip the step-0 choice."""
    from qwen2_audio_tpu.runtime.decoding import beam_search, greedy_decode
    from qwen2_audio_tpu.runtime.generate import beam_search_device

    prompt = rng.integers(2, 90, (1, 5))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))

    base = greedy_decode(bundle, prefill, max_new_tokens=8)
    first = base.tokens[0][0]
    mask = np.zeros(CFG.vocab_size, np.float32)
    mask[first] = -np.inf                 # force a different step-0 token

    host = greedy_decode(bundle, prefill, max_new_tokens=8,
                         suppress_first=mask)
    assert host.tokens[0][0] != first     # the mask bites
    dev = greedy_decode_device(bundle, prefill, max_new_tokens=8,
                               suppress_first=mask)
    assert dev.tokens == host.tokens
    spec = greedy_decode_device(bundle, prefill, max_new_tokens=8,
                                spec_k=3, suppress_first=mask)
    assert spec.tokens == host.tokens

    hbeam = beam_search(bundle, prefill, beam_size=3, max_new_tokens=8,
                        suppress_first=mask)
    assert all(t != first for t in (b[0] for b in hbeam.tokens if b))
    dbeam = beam_search_device(bundle, prefill, beam_size=3,
                               max_new_tokens=8, suppress_first=mask)
    assert dbeam.tokens == hbeam.tokens


def test_spec_respects_caller_cache_ctx(bundle, rng):
    """spec_k>0 with a BINDING cache_ctx must emit exactly what spec_k=0
    emits (round-3 review: the spec path silently grew the cache past the
    caller's capacity and kept generating)."""
    prompt = rng.integers(2, 90, (1, 5))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    cap = prefill.shape[1] + 4          # room for only 4 new tokens
    plain = greedy_decode_device(bundle, prefill, max_new_tokens=16,
                                 cache_ctx=cap)
    spec = greedy_decode_device(bundle, prefill, max_new_tokens=16,
                                cache_ctx=cap, spec_k=3)
    assert spec.tokens == plain.tokens
    assert len(plain.tokens[0]) <= 4
