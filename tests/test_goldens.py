"""Golden regression values: the de-facto parity mechanism of the reference
is the 20-float encoder fingerprint eyeballed across runs (SURVEY.md §4.1).
Here the goldens are pinned for a fixed seed/model/input, so any accidental
change to the mel or encoder math fails loudly.

Regenerate (only after an intentional numerics change) with the snippet in
the git history of this file's introduction commit.
"""

import numpy as np
import jax.numpy as jnp

from qwen2_audio_tpu.audio import mel_filterbank
from qwen2_audio_tpu.audio.mel import log_mel_spectrogram, mel_input_window
from qwen2_audio_tpu.config import WhisperHParams
from qwen2_audio_tpu.models.encoder import (
    encoder_forward,
    fingerprint,
    random_encoder_params,
)

HP = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                    n_audio_layer=2, n_mels=16)

# fixed seed 42 model, 2 s 440 Hz tone, CPU f32
ENC_FP = (" 0.290 -0.484 -0.240 1.003 -0.552 1.141 1.149 0.820 -1.200"
          " -1.020 0.518 0.483 1.089 0.517 -0.571 -1.989 -1.420 -0.602"
          " 0.406 0.179")
MEL_FP = "-0.7882 1.2118 1.2031 -0.7882"


def _pipeline():
    params = random_encoder_params(np.random.default_rng(42), HP)
    t = np.arange(32000) / 16000
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = log_mel_spectrogram(x, mel_filterbank(16))
    win = mel_input_window(mel, 0, HP.n_audio_ctx)
    out = encoder_forward(params, jnp.asarray(win[None]), HP)
    return mel, out


def test_mel_golden():
    mel, _ = _pipeline()
    got = " ".join(f"{v:.4f}" for v in mel.data[:4, 100])
    assert got == MEL_FP, got


def test_encoder_fingerprint_golden():
    _, out = _pipeline()
    got = fingerprint(np.asarray(out))
    want = [float(v) for v in ENC_FP.split()]
    got_vals = [float(v) for v in got.split()]
    # printed at 3 decimals; allow one ulp of print rounding
    np.testing.assert_allclose(got_vals, want, atol=2e-3)
