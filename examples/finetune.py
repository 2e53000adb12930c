#!/usr/bin/env python
"""Example: fine-tune the multimodal model on a directory of wav+txt pairs
and export the tuned encoder back to a ggml checkpoint.

    python examples/finetune.py <corpus_dir> <out.bin> [epochs]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    corpus, out = sys.argv[1], sys.argv[2]
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax.numpy as jnp
    import optax
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import (Qwen2AudioConfig, Qwen2DecoderConfig,
                                        WhisperHParams)
    from qwen2_audio_tpu.training.checkpoint import export_encoder_to_ggml
    from qwen2_audio_tpu.training.data import (AudioTextDataset,
                                               PrefetchLoader, discover_pairs)
    from qwen2_audio_tpu.training.step import init_train_state, make_train_step

    hp = WhisperHParams(n_vocab=64, n_audio_ctx=64, n_audio_state=64,
                        n_audio_head=4, n_audio_layer=2, n_mels=16)
    cfg = Qwen2AudioConfig(
        audio=hp,
        text=Qwen2DecoderConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, tie_word_embeddings=True))

    pairs = discover_pairs(corpus)
    if not pairs:
        print(f"no wav+txt pairs under {corpus}", file=sys.stderr)
        return 1
    filters = mel_filterbank(hp.n_mels)
    ds = AudioTextDataset(pairs, hp, filters,
                          tokenize=lambda s: [ord(c) % 60 for c in s][:16],
                          use_native=False)
    loader = PrefetchLoader(ds, batch_size=min(2, len(ds)), num_workers=2)

    opt = optax.adamw(1e-3)
    state = init_train_state(np.random.default_rng(0), cfg, opt)
    step = make_train_step(cfg, opt)
    for epoch in range(epochs):
        for mel, toks, mask in loader:
            state, loss = step(state, jnp.asarray(mel), jnp.asarray(toks),
                               jnp.asarray(mask))
        print(f"epoch {epoch}: loss {float(loss):.4f}")

    export_encoder_to_ggml(out, state, hp, filters, [b"x"] * 60)
    print(f"exported tuned encoder -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
