#!/usr/bin/env python
"""Convert a HF Qwen2-Audio checkpoint directory to the ggml-model.bin
format (replaces models/convert-pt-to-ggml.py, which needed a torch .pt
checkpoint plus an openai/whisper repo checkout for mel filters + vocab).

Only the audio tower goes into the ggml file (that is all the ggml format
carries — the reference strips the decoder, SURVEY.md §0.2); the mel
filterbank is generated directly (audio/filters.py) and the vocab section is
filled from the HF tokenizer when present.

Usage: python tools/convert_hf_to_ggml.py <hf_dir> <out.bin> [--f32]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("hf_dir")
    ap.add_argument("out")
    ap.add_argument("--f32", action="store_true",
                    help="store all tensors as f32 (default: f16 2-D)")
    args = ap.parse_args()

    from qwen2_audio_tpu.audio.filters import mel_filterbank
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.io.hf import (
        _load_state_dict,
        encoder_params_from_hf_state_dict,
        hparams_from_hf_config,
    )

    hf = Path(args.hf_dir)
    with open(hf / "config.json") as f:
        cfg = json.load(f)
    hp, _ = hparams_from_hf_config(cfg)
    sd = _load_state_dict(hf)
    params = encoder_params_from_hf_state_dict(sd, hp, dtype=jnp.float32)

    vocab: list[bytes] = []
    try:
        from transformers import AutoTokenizer
        from qwen2_audio_tpu.tokenizer import token_surface_to_bytes
        tok = AutoTokenizer.from_pretrained(str(hf))
        # len(tok) includes added special tokens (vocab_size does not);
        # surfaces are byte-level-BPE encoded and must be byte-DECODED for
        # the file (the reference converter applies byte_decoder,
        # convert-pt-to-ggml.py:242-255)
        n = min(hp.n_vocab, len(tok))
        vocab = [token_surface_to_bytes(tok.convert_ids_to_tokens(i) or "")
                 for i in range(n)]
    except Exception:
        vocab = [b"<tok%d>" % i for i in range(min(hp.n_vocab, 1000))]

    filters = mel_filterbank(hp.n_mels)
    write_encoder_checkpoint(args.out, params, hp, filters, vocab,
                             use_f16=not args.f32)
    print(f"wrote {args.out}: {hp.model_type} encoder "
          f"({hp.n_audio_layer} layers, d={hp.n_audio_state}, "
          f"{len(vocab)} vocab entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
