"""Regression tests for the code-review findings (round 1 self-review)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import embed_tokens, random_decoder_params
from qwen2_audio_tpu.runtime.decoding import DecoderBundle, beam_search, _token_entropy

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


def test_beam_repetition_penalty_suppresses_repeats(bundle, rng):
    """Penalty must act on raw logits (review finding #4): with a strong
    penalty the beam result must repeat no more than the unpenalized one."""
    prompt = rng.integers(2, 90, (1, 4))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    plain = beam_search(bundle, prefill, beam_size=3, max_new_tokens=12)
    pen = beam_search(bundle, prefill, beam_size=3, max_new_tokens=12,
                      repetition_penalty=5.0)

    def repeats(seq):
        return len(seq) - len(set(seq))
    assert repeats(pen.tokens[0]) <= repeats(plain.tokens[0])


def test_device_loop_respects_cache_capacity(bundle, rng):
    """max_new_tokens past max_ctx must stop, not clamp-corrupt (finding #2)."""
    from qwen2_audio_tpu.runtime.generate import greedy_decode_device
    prompt = rng.integers(2, 90, (1, 50))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    r = greedy_decode_device(bundle, prefill, max_new_tokens=200)
    # bundle.max_ctx=64, T0=50 -> at most 14 generated tokens
    assert len(r.tokens[0]) <= 14


def test_beam_overlong_prefill_raises(bundle, rng):
    prompt = rng.integers(2, 90, (1, 70))   # > max_ctx 64
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    with pytest.raises(ValueError, match="max_ctx"):
        beam_search(bundle, prefill, beam_size=2, max_new_tokens=4)


def test_token_entropy():
    assert _token_entropy([1, 1, 1, 1]) == 0.0
    assert _token_entropy([1, 2, 3, 4]) == pytest.approx(np.log(4))
    assert _token_entropy([]) == float("inf")


def test_high_pass_reference_coefficient():
    """Filter must use alpha = dt/(rc+dt) like common.cpp:753-758 (finding
    #3): transcribe the reference recurrence directly and compare."""
    from qwen2_audio_tpu.audio.vad import high_pass_filter
    rng = np.random.default_rng(0)
    x = rng.standard_normal(500).astype(np.float32)
    got = high_pass_filter(x, 100.0, 16000)

    rc = 1.0 / (2.0 * np.pi * 100.0)
    dt = 1.0 / 16000.0
    alpha = dt / (rc + dt)
    y = np.empty_like(x)
    y[0] = x[0]
    acc = x[0]
    for i in range(1, len(x)):
        acc = alpha * (acc + x[i] - x[i - 1])
        y[i] = acc
    np.testing.assert_allclose(got, y, atol=1e-5)


def test_wav_extensible_float(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE float files must parse as float (finding #7)."""
    import struct
    from qwen2_audio_tpu.audio.wav import read_wav
    samples = (0.25 * np.sin(np.linspace(0, 30, 1000))).astype("<f4")
    data = samples.tobytes()
    # fmt chunk: extensible (40 bytes), subformat = 3 (IEEE float)
    sub = struct.pack("<H", 3) + b"\x00" * 14
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 16000, 64000, 4, 32, 22, 32, 0
                      ) + sub
    riff = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    path = tmp_path / "ext.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    x, rate = read_wav(str(path))
    assert rate == 16000
    np.testing.assert_allclose(x, samples, atol=1e-6)


def test_native_short_input_mel():
    """Native mel on inputs shorter than the reflect pad must not read OOB
    and must match the Python path (finding #1)."""
    from qwen2_audio_tpu import native
    if not native.available():
        pytest.skip("native lib not built")
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.audio.mel import log_mel_spectrogram
    filters = mel_filterbank(80)
    x = (0.5 * np.sin(np.linspace(0, 20, 100))).astype(np.float32)  # n=100
    data, n_len_org = native.log_mel(x, filters, n_threads=2)
    want = log_mel_spectrogram(x, filters)
    assert n_len_org == want.n_len_org
    np.testing.assert_allclose(data, want.data, atol=5e-4)


def test_prefetch_loader_early_break_no_leak(tmp_path):
    """Breaking out of the loader must not leave blocked workers (finding #10)."""
    import threading
    from qwen2_audio_tpu.audio import mel_filterbank, write_wav
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.training.data import AudioTextDataset, Example, PrefetchLoader

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    wav = str(tmp_path / "x.wav")
    write_wav(wav, np.zeros(8000, np.float32))
    exs = [Example(wav, f"t{i}") for i in range(8)]
    ds = AudioTextDataset(exs, hp, mel_filterbank(16),
                          tokenize=lambda s: [1, 2], use_native=False)
    before = threading.active_count()
    loader = PrefetchLoader(ds, batch_size=1, num_workers=3, prefetch=1)
    for _ in loader:
        break   # early exit closes the generator
    import time
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_device_final_logits_matches_host_on_eos_stop():
    """Round-2 review: on an EOS stop the host loop reports the logits the
    last token was sampled FROM (it breaks before the next forward); the
    device loop used to report the post-EOS distribution instead. Both
    stop modes must now agree, for the plain and speculative paths."""
    from qwen2_audio_tpu.runtime.decoding import greedy_decode
    from qwen2_audio_tpu.runtime.generate import (generate_on_device,
                                                  generate_speculative,
                                                  greedy_decode_device)

    cfg = Qwen2DecoderConfig(
        vocab_size=16, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, tie_word_embeddings=False)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 128)) * 0.1,
        jnp.float32)
    # find a token greedy emits mid-sequence to use as EOS
    probe = generate_on_device(params, cfg, prefill, None,
                               max_new_tokens=16, eos_token_id=-1,
                               cache_max_ctx=32, cache_dtype=jnp.float32)
    eos = int(np.asarray(probe[0])[0, 6])

    bundle = DecoderBundle(
        cfg=cfg, params=params, proj_w=jnp.eye(128, dtype=jnp.float32),
        proj_b=jnp.zeros(128, jnp.float32), eos_token_id=eos,
        bos_tokens=[], post_audio_tokens=[], max_ctx=64,
        cache_dtype=jnp.float32)
    host = greedy_decode(bundle, prefill, max_new_tokens=32)
    dev = greedy_decode_device(bundle, prefill, max_new_tokens=32)
    spec = greedy_decode_device(bundle, prefill, max_new_tokens=32,
                                spec_k=4)
    assert host.tokens == dev.tokens == spec.tokens
    np.testing.assert_allclose(np.asarray(dev.final_logits),
                               host.final_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(spec.final_logits),
                               host.final_logits, rtol=2e-4, atol=2e-4)

    # capacity stop (no EOS reachable; host cache is sized T0+max_new so
    # its capacity break fires before a trailing forward): same rule
    bundle2 = DecoderBundle(
        cfg=cfg, params=params, proj_w=jnp.eye(128, dtype=jnp.float32),
        proj_b=jnp.zeros(128, jnp.float32), eos_token_id=-1,
        bos_tokens=[], post_audio_tokens=[], max_ctx=64,
        cache_dtype=jnp.float32)
    host2 = greedy_decode(bundle2, prefill, max_new_tokens=8)
    dev2 = greedy_decode_device(bundle2, prefill, max_new_tokens=8)
    assert host2.tokens == dev2.tokens
    np.testing.assert_allclose(np.asarray(dev2.final_logits),
                               host2.final_logits, rtol=2e-4, atol=2e-4)
