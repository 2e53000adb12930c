"""CLI smoke test: model + wav -> bench loop -> fingerprint output."""

import subprocess
import sys

import numpy as np
import pytest

from qwen2_audio_tpu.audio import mel_filterbank, write_wav
from qwen2_audio_tpu.config import WhisperHParams
from qwen2_audio_tpu.io.export import write_encoder_checkpoint
from qwen2_audio_tpu.models.encoder import random_encoder_params

HP = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                    n_audio_layer=2, n_mels=16)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    model = str(d / "model.bin")
    wav = str(d / "in.wav")
    write_encoder_checkpoint(model,
                             random_encoder_params(np.random.default_rng(0), HP),
                             HP, mel_filterbank(HP.n_mels),
                             [b"t%d" % i for i in range(60)])
    t = np.arange(32000) / 16000.0
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32))
    return model, wav


def run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "cli.main", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
        timeout=300)


def test_cli_encode_bench(assets):
    model, wav = assets
    r = run_cli(["-m", model, "-f", wav, "--bench-iters", "2", "-np"])
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    # 2 fingerprint lines + elapsed
    fps = [ln for ln in lines if ln.startswith(" ") or ln.startswith(" -")]
    assert len([ln for ln in lines if "Elapsed time" in ln]) == 1
    assert len(fps) == 2
    assert fps[0] == fps[1]  # deterministic across iterations


def test_cli_response_file(assets, tmp_path):
    model, wav = assets
    rsp = tmp_path / "args.rsp"
    rsp.write_text(f"-m {model} -f {wav} --bench-iters 1 -np")
    r = run_cli([f"@{rsp}"])
    assert r.returncode == 0, r.stderr


def test_cli_no_input():
    r = run_cli(["-m", "x.bin"])
    assert r.returncode == 1
    assert "no input files" in r.stderr


def test_cli_mp3_input(assets, tmp_path):
    """mp3 in -> same encoder fingerprint path as wav (the reference needs
    an ffmpeg build for this; here it rides the libmpg123 binding)."""
    from qwen2_audio_tpu.audio import have_mp3
    if not have_mp3():
        pytest.skip("libmpg123 not available")
    from tests.test_mp3 import LAME, encode_mp3
    if LAME is None:
        pytest.skip("libmp3lame not available")
    model, _wav = assets
    mp3 = str(tmp_path / "in.mp3")
    t = np.arange(32000) / 16000.0
    encode_mp3(mp3, (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32),
               16000)
    r = run_cli(["-m", model, "-f", mp3, "--bench-iters", "1", "-np"])
    assert r.returncode == 0, r.stderr
    assert "Elapsed time" in r.stdout          # fingerprint loop completed
