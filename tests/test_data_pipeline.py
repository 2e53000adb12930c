"""Training data pipeline: discovery, loading, threaded prefetch, and an
end-to-end fine-tuning loop over real (synthetic) wav files."""

import numpy as np
import pytest
import jax.numpy as jnp
import optax

from qwen2_audio_tpu.audio import mel_filterbank, write_wav
from qwen2_audio_tpu.config import (
    Qwen2AudioConfig,
    Qwen2DecoderConfig,
    WhisperHParams,
)
from qwen2_audio_tpu.training.data import (
    AudioTextDataset,
    Example,
    PrefetchLoader,
    discover_pairs,
)

HP = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                    n_audio_head=4, n_audio_layer=2, n_mels=16)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for i in range(5):
        t = np.arange(16000) / 16000
        sig = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        write_wav(str(d / f"clip{i}.wav"), sig.astype(np.float32))
        (d / f"clip{i}.txt").write_text(f"transcript {i}")
    return d


def test_discover_pairs(corpus):
    pairs = discover_pairs(corpus)
    assert len(pairs) == 5
    assert pairs[0].text == "transcript 0"


def test_dataset_load(corpus):
    ds = AudioTextDataset(discover_pairs(corpus), HP, mel_filterbank(16),
                          tokenize=lambda s: [ord(c) % 60 for c in s][:8],
                          use_native=False)
    mel, toks = ds.load(0)
    assert mel.shape == (16, 128)
    assert 1 <= len(toks) <= 8


def test_prefetch_loader_deterministic(corpus):
    ds = AudioTextDataset(discover_pairs(corpus), HP, mel_filterbank(16),
                          tokenize=lambda s: [1, 2, 3], use_native=False)
    loader = PrefetchLoader(ds, batch_size=2, num_workers=3, seed=1)
    a = [(m.copy(), t.copy(), k.copy()) for m, t, k in loader]
    b = [(m.copy(), t.copy(), k.copy()) for m, t, k in loader]
    assert len(a) == 2  # 5 examples, batch 2, drop_last
    for (m1, t1, k1), (m2, t2, k2) in zip(a, b):
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(t1, t2)


def test_end_to_end_finetune(corpus):
    from qwen2_audio_tpu.training.step import init_train_state, make_train_step
    cfg = Qwen2AudioConfig(
        audio=HP,
        text=Qwen2DecoderConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, tie_word_embeddings=True))
    ds = AudioTextDataset(discover_pairs(corpus), HP, mel_filterbank(16),
                          tokenize=lambda s: [ord(c) % 60 for c in s][:6],
                          use_native=False)
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2)
    opt = optax.adamw(1e-3)
    state = init_train_state(np.random.default_rng(0), cfg, opt)
    step = make_train_step(cfg, opt)

    losses = []
    for _ in range(3):  # epochs
        for mel, toks, mask in loader:
            state, loss = step(state, jnp.asarray(mel), jnp.asarray(toks),
                               jnp.asarray(mask))
            losses.append(float(loss))
    assert losses[-1] < losses[0]
