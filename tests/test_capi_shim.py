"""C ABI shim: drive the qa_main binary end-to-end (gated on the build)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

BIN = Path("/root/repo/native/build/qa_main")


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    from qwen2_audio_tpu.audio import mel_filterbank, write_wav
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    d = tmp_path_factory.mktemp("capi")
    hp = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_mels=16)
    model = str(d / "m.bin")
    wav = str(d / "a.wav")
    write_encoder_checkpoint(model,
                             random_encoder_params(np.random.default_rng(0), hp),
                             hp, mel_filterbank(16), [b"x"] * 60)
    t = np.arange(32000) / 16000
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32))
    return model, wav


@pytest.mark.skipif(not BIN.exists(), reason="qa_main not built")
def test_qa_main_end_to_end(assets):
    model, wav = assets
    r = subprocess.run(
        [str(BIN), model, wav, "2"], capture_output=True, text=True,
        env={"PATH": "/opt/venv/bin:/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             # embedded CPython needs the venv's site-packages explicitly
             "PYTHONPATH": "/root/repo:" + ":".join(
                 p for p in sys.path if "site-packages" in p),
             "HOME": "/root"},
        timeout=600)
    assert r.returncode == 0, r.stderr
    fps = [ln for ln in r.stdout.splitlines() if ln.startswith(" ")]
    assert len(fps) == 2 and fps[0] == fps[1]
    assert "Elapsed time is" in r.stdout
    assert "n_vocab=64" in r.stderr
