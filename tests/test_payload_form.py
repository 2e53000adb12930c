"""The quantized payload form is an EXPLICIT contract (quant/qparams.py::
Q4Form), not ambient process state.

Round-4 history: code that quantized with default env produced different
q4_0 payload forms depending on which hardware-validation markers had
armed earlier in the same process (the sym default flipping mid-run broke
fused-MLP validation twice — commits 46a9ea2, d49d5f5). These tests pin
the fixed contract: an explicit Q4Form always wins over env, repeated
builds are order-independent, payload_form() names what was actually
built, and pinned_form() restores prior env instead of popping it.
"""

import os

import numpy as np
import pytest

from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.quant.qparams import (
    Q4Form, payload_form, pinned_form, quantize_array_for_device,
    quantize_decoder_params, resolve_q4_form)


@pytest.fixture
def w():
    rng = np.random.default_rng(0)
    return rng.standard_normal((64, 32), dtype=np.float32) * 0.05


def _np_tree(d):
    return {k: np.asarray(v) for k, v in d.items()}


def test_explicit_form_beats_env(w, monkeypatch):
    """form= pins the payload even when env says the opposite."""
    monkeypatch.setenv("QA_Q4_SYM", "0")
    monkeypatch.setenv("QA_Q4_I8", "1")
    monkeypatch.setenv("QA_SCALE16", "1")
    qw = quantize_array_for_device(
        w, GGMLType.Q4_0, to_device=False,
        form=Q4Form(packed=True, sym=True, i8=False, scale="f32"))
    assert payload_form(qw) == "packed4+sym+u8+f32sc"
    # and the ambient build under that env really is the other form
    qa = quantize_array_for_device(w, GGMLType.Q4_0, to_device=False)
    assert payload_form(qa) == "packed4+mins+i8+f16sc"


def test_build_order_independence(w, monkeypatch):
    """Interleaving forms leaves no state behind: the same explicit form
    produces byte-identical payloads whatever was built before it (the
    marker-arm-order hazard, restated without /tmp markers)."""
    sym = Q4Form(sym=True)
    mins = Q4Form(sym=False)
    a1 = quantize_array_for_device(w, GGMLType.Q4_0, to_device=False,
                                   form=sym)
    _ = quantize_array_for_device(w, GGMLType.Q4_0, to_device=False,
                                  form=mins)
    monkeypatch.setenv("QA_Q4_SYM", "0")   # ambient flip mid-sequence
    a2 = quantize_array_for_device(w, GGMLType.Q4_0, to_device=False,
                                   form=sym)
    assert sorted(a1) == sorted(a2) == ["qs4", "scales"]
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])


def test_payload_form_names():
    u8 = np.zeros((16, 32), np.uint8)
    f32 = np.zeros((2, 32), np.float32)
    assert payload_form({"qs4": u8, "scales": f32}) == "packed4+sym+u8+f32sc"
    assert payload_form({"qs4": u8.view(np.int8), "scales": f32,
                         "mins": f32}) == "packed4+mins+i8+f32sc"
    assert payload_form({"qs4_p": u8[None], "scales_p": f32[None]}) \
        == "packed4-panel+sym+u8+f32sc"
    assert payload_form({"qs": u8.view(np.int8), "scales":
                         f32.astype(np.float16)}) == "strided+sym+f16sc"
    assert payload_form({"qs8": u8.view(np.int8),
                         "scale_n": f32[0]}) == "w8a8"
    with pytest.raises(ValueError):
        payload_form({"w": f32})


def test_pinned_form_restores_env(monkeypatch):
    monkeypatch.setenv("QA_Q4_SYM", "0")
    monkeypatch.delenv("QA_Q4_I8", raising=False)
    with pinned_form(Q4Form(sym=True, i8=True)):
        assert os.environ["QA_Q4_SYM"] == "1"
        assert os.environ["QA_Q4_I8"] == "1"
        assert resolve_q4_form().sym is True
    assert os.environ["QA_Q4_SYM"] == "0"      # restored, not popped
    assert "QA_Q4_I8" not in os.environ        # unset restored to unset


def test_decoder_build_uses_one_form(monkeypatch):
    """Model-level builds resolve the form once and apply it everywhere
    (layers + lm_head), independent of env."""
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    cfg = Qwen2DecoderConfig(vocab_size=64, hidden_size=64,
                             intermediate_size=128, num_hidden_layers=2,
                             num_attention_heads=2, num_key_value_heads=1,
                             head_dim=32, tie_word_embeddings=False)
    p = random_decoder_params(np.random.default_rng(0), cfg,
                              dtype=jnp.float32, host=True)
    monkeypatch.setenv("QA_Q4_SYM", "0")       # env says mins...
    q = quantize_decoder_params(p, GGMLType.Q4_0, to_device=False,
                                form=Q4Form(sym=True))   # ...form wins
    for key in ("q", "k", "v", "o", "gate", "up", "down"):
        got = payload_form(q["layers"][key])
        assert got == "packed4+sym+u8+f32sc", (key, got)
    assert payload_form(_np_tree(q["lm_head"])) == "packed4+sym+u8+f32sc"


def test_q41_form_controls_stream_dtype(w):
    """Mins-carrying formats (q4_1) compose with the i8 stream form."""
    qw = quantize_array_for_device(w, GGMLType.Q4_1, to_device=False,
                                   form=Q4Form(i8=True, scale="f32"))
    assert payload_form(qw) == "packed4+mins+i8+f32sc"


def test_prebuild_synth_layout_matches_exact_pipeline():
    """The direct-synthesis bench prebuild must keep emitting exactly the
    layout the real quantize pipeline produces — for BOTH synthesized
    formats (q4_0 sym/packed and q8_0 u16-scale). Guards the 7B cache
    shape against qparams.py drift from inside the suite, not just at
    tool runtime (tools/prebuild_param_cache.py::selfcheck_tiny)."""
    import subprocess
    import sys
    for quant in ("q4_0", "q8_0"):
        # subprocess: selfcheck_tiny hard-assigns QA_* env pins, which
        # must not leak into this test process's ambient defaults
        env = {k: v for k, v in os.environ.items()
               if k != "PALLAS_AXON_POOL_IPS"}   # sitecustomize clobbers
        env["JAX_PLATFORMS"] = "cpu"             # JAX_PLATFORMS otherwise
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, '.');"
             "import jax; jax.config.update('jax_platforms', 'cpu');"
             "from tools.prebuild_param_cache import selfcheck_tiny;"
             f"selfcheck_tiny({quant!r})"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, (quant, r.stdout[-800:], r.stderr[-800:])
