"""Per-node inspection + cross-run comparison utilities."""

import numpy as np
import jax.numpy as jnp

from qwen2_audio_tpu.config import GGMLType, WhisperHParams
from qwen2_audio_tpu.models.encoder import encoder_forward, random_encoder_params
from qwen2_audio_tpu.utils.inspect_graph import (
    compare_runs,
    encoder_intermediates,
    first_divergence,
)

HP = WhisperHParams(n_audio_ctx=128, n_audio_state=64, n_audio_head=4,
                    n_audio_layer=2, n_mels=16)


def test_intermediates_match_forward(rng):
    params = random_encoder_params(rng, HP)
    mel = jnp.asarray(rng.standard_normal((1, 16, 256)), jnp.float32)
    nodes = encoder_intermediates(params, mel, HP)
    want = np.asarray(encoder_forward(params, mel, HP))
    np.testing.assert_allclose(nodes["ln_post"], want, atol=1e-5)
    assert "conv1" in nodes and "layer1.out" in nodes and "avg_pool" in nodes


def test_callback_invoked(rng):
    params = random_encoder_params(rng, HP)
    mel = jnp.asarray(rng.standard_normal((1, 16, 256)), jnp.float32)
    seen = []
    encoder_intermediates(params, mel, HP,
                          callback=lambda n, v: seen.append(n))
    assert seen[0] == "conv1" and seen[-1] == "ln_post"


def test_compare_runs_finds_divergence(rng):
    """Quantize only layer 1 -> first divergence must be inside layer 1."""
    from qwen2_audio_tpu.quant.qparams import quantize_array_for_device
    params = random_encoder_params(rng, HP)
    import copy
    q = {**params, "layers": [params["layers"][0], dict(params["layers"][1])]}
    lyr = dict(q["layers"][1])
    fc1 = quantize_array_for_device(np.asarray(lyr["fc1"]["w"]), GGMLType.Q4_0)
    lyr["fc1"] = {**fc1, "b": lyr["fc1"]["b"]}
    q["layers"][1] = lyr

    mel = jnp.asarray(rng.standard_normal((1, 16, 256)), jnp.float32)
    a = encoder_intermediates(params, mel, HP)
    b = encoder_intermediates(q, mel, HP)
    report = compare_runs(a, b, atol=1e-6, rtol=1e-6)
    div = first_divergence(report)
    assert div == "layer1.fc1", div
    # everything before layer1.fc1 is identical
    for r in report:
        if r["node"] == "layer1.fc1":
            break
        assert r["ok"], r
