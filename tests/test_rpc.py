"""Remote offload (runtime/rpc.py) — the ggml-rpc analog.

≙ /root/reference/ggml/src/ggml-rpc.cpp (command framing :84-96, client
proxy backend, server-side execution). The reference ships no RPC test
harness (SURVEY.md §4.7); these tests create one: a live localhost
server + client pair, results diffed against a local WhisperContext.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from qwen2_audio_tpu.audio import mel_filterbank
from qwen2_audio_tpu.config import WhisperHParams
from qwen2_audio_tpu.io.export import write_encoder_checkpoint
from qwen2_audio_tpu.models.encoder import random_encoder_params
from qwen2_audio_tpu.runtime import (ContextParams, FullParams,
                                     WhisperContext, full_default_params)
from qwen2_audio_tpu.runtime.rpc import (RemoteWhisperContext, RpcError,
                                         RpcServer)


@pytest.fixture(scope="module")
def model_bytes():
    hp = WhisperHParams(n_vocab=64, n_audio_ctx=128, n_audio_state=64,
                        n_audio_head=2, n_audio_layer=1, n_mels=16)
    params = random_encoder_params(np.random.default_rng(0), hp)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, params, hp, mel_filterbank(16),
                             [b"tok%d" % i for i in range(60)])
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    srv = RpcServer("127.0.0.1", 0)
    srv.start_background()
    yield srv
    srv.shutdown()


@pytest.fixture()
def pcm():
    t = np.arange(16000 * 2) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_rpc_hello_reports_backend(server):
    cli = RemoteWhisperContext.connect(f"127.0.0.1:{server.port}")
    assert cli.server_backend in ("cpu", "tpu", "axon")
    assert "qwen2" in cli.system_info().lower() or cli.system_info()
    cli.close()


def test_rpc_full_matches_local(server, model_bytes, pcm):
    """Remote whisper_full returns the same fingerprint and segments as a
    local context on the same checkpoint + audio."""
    cli = RemoteWhisperContext.connect(f"127.0.0.1:{server.port}")
    cli.load_model_bytes(model_bytes)
    rc = cli.full(full_default_params(), pcm)
    assert rc == 0
    remote_fp = cli.print_emb_enc()
    remote_emb = cli.get_emb_enc()
    remote_segs = list(cli.segments)
    cli.close()

    ctx = WhisperContext.init_from_buffer_with_params(model_bytes,
                                                      ContextParams())
    assert ctx.full(full_default_params(), pcm) == 0
    assert remote_fp == ctx.print_emb_enc()
    np.testing.assert_allclose(
        remote_emb.reshape(np.asarray(ctx.state.embd_enc).shape),
        np.asarray(ctx.state.embd_enc), atol=1e-5)
    assert len(remote_segs) == len(ctx.state.segments)
    for rs, ls in zip(remote_segs, ctx.state.segments):
        assert rs["text"] == ls["text"]
        assert rs["tokens"] == list(map(int, ls["tokens"]))


def test_rpc_full_params_cross_the_wire(server, model_bytes, pcm):
    """Non-default FullParams fields survive serialization (callbacks are
    dropped, like ggml-rpc never forwards abort_callback)."""
    cli = RemoteWhisperContext.connect(f"127.0.0.1:{server.port}")
    cli.load_model_bytes(model_bytes)
    p = FullParams(offset_ms=500, audio_ctx=64, print_progress=False,
                   abort_callback=lambda: False)   # non-serializable, dropped
    assert cli.full(p, pcm) == 0
    cli.close()


def test_rpc_errors_are_reported_not_fatal(server, model_bytes):
    cli = RemoteWhisperContext.connect(f"127.0.0.1:{server.port}")
    with pytest.raises(RpcError):            # no model loaded
        cli.full(full_default_params(), np.zeros(16000, np.float32))
    # the connection survives an error frame
    cli.load_model_bytes(model_bytes)
    assert cli._ctx_id is not None
    cli.close()


def test_rpc_multiple_contexts_isolated(server, model_bytes, pcm):
    a = RemoteWhisperContext.connect(f"127.0.0.1:{server.port}")
    b = RemoteWhisperContext.connect(f"127.0.0.1:{server.port}")
    a.load_model_bytes(model_bytes)
    b.load_model_bytes(model_bytes)
    assert a._ctx_id != b._ctx_id
    assert a.full(full_default_params(), pcm) == 0
    assert a.segments is not None and b.segments == []   # b untouched
    a.close()
    b.close()


def test_rpc_cli_end_to_end(server, model_bytes, pcm, tmp_path):
    """CLI --rpc HOST:PORT offloads the whole run to the server and prints
    the same fingerprint lines as a local run."""
    from cli.main import main as cli_main
    from qwen2_audio_tpu.audio import write_wav
    model = tmp_path / "model.bin"
    model.write_bytes(model_bytes)
    wav = tmp_path / "in.wav"
    write_wav(str(wav), pcm)
    rc = cli_main(["-m", str(model), "-f", str(wav), "--bench-iters", "1",
                   "-np", "--rpc", f"127.0.0.1:{server.port}"])
    assert rc == 0


def test_rpc_native_cpp_client(server, model_bytes, pcm, tmp_path):
    """The C++ client (native/qa_rpc_client.cpp, ≙ ggml-rpc's native
    client role) speaks the wire protocol end-to-end: load model, full(),
    fingerprint — and the fingerprint matches the Python client's."""
    import os
    import subprocess
    bin_path = os.path.join(os.path.dirname(__file__), "..",
                            "native", "build", "qa_rpc")
    if not os.path.exists(bin_path):
        pytest.skip("native build absent (cmake native/ first)")
    from qwen2_audio_tpu.audio import write_wav
    model = tmp_path / "model.bin"
    model.write_bytes(model_bytes)
    wav = tmp_path / "in.wav"
    write_wav(str(wav), pcm)

    r = subprocess.run(
        [bin_path, f"127.0.0.1:{server.port}", str(model), str(wav)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    native_fp = r.stdout.strip()

    # both sides must see the identical samples: the wav stores int16 PCM,
    # so read it back rather than reusing the float source
    from qwen2_audio_tpu.audio import read_wav
    wav_pcm, _ = read_wav(str(wav))
    cli = RemoteWhisperContext.connect(f"127.0.0.1:{server.port}")
    cli.load_model_bytes(model_bytes)
    assert cli.full(full_default_params(), wav_pcm) == 0
    assert native_fp == cli.print_emb_enc().strip()
    cli.close()
