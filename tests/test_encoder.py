"""Encoder parity tests against the HuggingFace Qwen2AudioEncoder oracle —
the actual model family the reference's checkpoint comes from (tensor-name
map src/qwen2-whisper.cpp:1603-1662 is the HF naming)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import WhisperHParams, GGMLType
from qwen2_audio_tpu.models.encoder import (
    encoder_forward,
    encoder_params_from_ggml,
    fingerprint,
    random_encoder_params,
)

HP = WhisperHParams(n_vocab=64, n_audio_ctx=1500, n_audio_state=64,
                    n_audio_head=4, n_audio_layer=2, n_mels=16)


@pytest.fixture(scope="module")
def hf_pair():
    """(hf_model, our_params) with identical weights."""
    import torch
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioEncoderConfig)
    from transformers.models.qwen2_audio.modeling_qwen2_audio import (
        Qwen2AudioEncoder)

    cfg = Qwen2AudioEncoderConfig(
        d_model=HP.n_audio_state, encoder_attention_heads=HP.n_audio_head,
        encoder_layers=HP.n_audio_layer, num_mel_bins=HP.n_mels,
        max_source_positions=HP.n_audio_ctx,
        encoder_ffn_dim=4 * HP.n_audio_state)
    torch.manual_seed(0)
    hf = Qwen2AudioEncoder(cfg).eval()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def lin(p, bias=True):
        out = {"w": jnp.asarray(sd[p + ".weight"].T)}
        if bias:
            out["b"] = jnp.asarray(sd[p + ".bias"])
        return out

    def ln(p):
        return {"w": jnp.asarray(sd[p + ".weight"]),
                "b": jnp.asarray(sd[p + ".bias"])}

    layers = []
    for i in range(HP.n_audio_layer):
        p = f"layers.{i}"
        layers.append({
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj", bias=False),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        })
    params = {
        "conv1": {"w": jnp.asarray(sd["conv1.weight"]),
                  "b": jnp.asarray(sd["conv1.bias"])},
        "conv2": {"w": jnp.asarray(sd["conv2.weight"]),
                  "b": jnp.asarray(sd["conv2.bias"])},
        "pos": jnp.asarray(sd["embed_positions.weight"]),
        "layers": layers,
        "ln_post": ln("layer_norm"),
    }
    return hf, params


def test_encoder_matches_hf(hf_pair, rng):
    import torch
    hf, params = hf_pair
    mel = rng.standard_normal((1, HP.n_mels, 2 * HP.n_audio_ctx)).astype(np.float32)

    with torch.no_grad():
        want = hf(torch.from_numpy(mel)).last_hidden_state.numpy()

    got = np.asarray(encoder_forward(params, jnp.asarray(mel), HP))
    assert got.shape == want.shape == (1, HP.n_audio_ctx // 2, HP.n_audio_state)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_encoder_batched(hf_pair, rng):
    import torch
    hf, params = hf_pair
    mel = rng.standard_normal((3, HP.n_mels, 2 * HP.n_audio_ctx)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(encoder_forward(params, jnp.asarray(mel), HP))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_matmul_stem_matches_conv_stem(rng):
    """The im2col stem (production default, stem="matmul") must match the
    lax.conv lowering (stem="conv") — same math, different XLA lowering;
    f32 accumulation order may differ by ulps only."""
    params = random_encoder_params(rng, HP)
    mel = rng.standard_normal((2, HP.n_mels, 2 * HP.n_audio_ctx)).astype(np.float32)
    a = np.asarray(encoder_forward(params, jnp.asarray(mel), HP,
                                   stem="matmul"))
    b = np.asarray(encoder_forward(params, jnp.asarray(mel), HP,
                                   stem="conv"))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_matmul_stem_stride_geometry(rng):
    """im2col tap alignment: a time-impulse mel must produce identical conv1
    and conv2 outputs under both lowerings (catches off-by-one pad/stride)."""
    from qwen2_audio_tpu.models.encoder import _conv1d, _conv1d_mm
    w = jnp.asarray(rng.standard_normal((8, 4, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    x = np.zeros((1, 4, 16), np.float32)
    x[0, 2, 5] = 1.0          # impulse
    x[0, 1, 0] = 1.0          # edge (exercises left pad)
    x[0, 3, 15] = 1.0         # edge (exercises right pad)
    xc = jnp.asarray(x)
    for stride in (1, 2):
        ref = np.asarray(_conv1d(xc, w, b, stride))          # (B, C, T)
        got = np.asarray(_conv1d_mm(jnp.swapaxes(xc, 1, 2), w, b, stride))
        np.testing.assert_allclose(got, ref.transpose(0, 2, 1),
                                   atol=1e-6, rtol=1e-6)


def test_gelu_tanh_close_to_erf(rng):
    """ggml's tanh-LUT gelu vs exact erf: document the expected gap."""
    params = random_encoder_params(rng, HP)
    mel = rng.standard_normal((1, HP.n_mels, 2 * HP.n_audio_ctx)).astype(np.float32) * 0.5
    a = np.asarray(encoder_forward(params, jnp.asarray(mel), HP,
                                   gelu_approximate=False))
    b = np.asarray(encoder_forward(params, jnp.asarray(mel), HP,
                                   gelu_approximate=True))
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_params_from_ggml_roundtrip(rng):
    """Write encoder weights in the ggml file layout, reload, identical output."""
    import io
    from qwen2_audio_tpu.io import GGMLTensor, write_ggml_file, read_ggml_file

    params = random_encoder_params(rng, HP)

    tensors = [
        GGMLTensor("embed_positions.weight", tuple(params["pos"].shape),
                   GGMLType.F32, np.asarray(params["pos"])),
        GGMLTensor("conv1.weight", tuple(params["conv1"]["w"].shape),
                   GGMLType.F16, np.asarray(params["conv1"]["w"], np.float16)),
        GGMLTensor("conv1.bias", (HP.n_audio_state, 1), GGMLType.F32,
                   np.asarray(params["conv1"]["b"]).reshape(-1, 1)),
        GGMLTensor("conv2.weight", tuple(params["conv2"]["w"].shape),
                   GGMLType.F16, np.asarray(params["conv2"]["w"], np.float16)),
        GGMLTensor("conv2.bias", (HP.n_audio_state, 1), GGMLType.F32,
                   np.asarray(params["conv2"]["b"]).reshape(-1, 1)),
        GGMLTensor("layer_norm.weight", (HP.n_audio_state,), GGMLType.F32,
                   np.asarray(params["ln_post"]["w"])),
        GGMLTensor("layer_norm.bias", (HP.n_audio_state,), GGMLType.F32,
                   np.asarray(params["ln_post"]["b"])),
    ]
    for i, lyr in enumerate(params["layers"]):
        p = f"layers.{i}"
        def W(name, arr):  # torch [out, in] layout on disk
            tensors.append(GGMLTensor(name, tuple(arr.shape), GGMLType.F32,
                                      np.asarray(arr)))
        W(f"{p}.self_attn_layer_norm.weight", lyr["ln1"]["w"])
        W(f"{p}.self_attn_layer_norm.bias", lyr["ln1"]["b"])
        W(f"{p}.self_attn.q_proj.weight", np.asarray(lyr["q"]["w"]).T)
        W(f"{p}.self_attn.q_proj.bias", lyr["q"]["b"])
        W(f"{p}.self_attn.k_proj.weight", np.asarray(lyr["k"]["w"]).T)
        W(f"{p}.self_attn.v_proj.weight", np.asarray(lyr["v"]["w"]).T)
        W(f"{p}.self_attn.v_proj.bias", lyr["v"]["b"])
        W(f"{p}.self_attn.out_proj.weight", np.asarray(lyr["o"]["w"]).T)
        W(f"{p}.self_attn.out_proj.bias", lyr["o"]["b"])
        W(f"{p}.final_layer_norm.weight", lyr["ln2"]["w"])
        W(f"{p}.final_layer_norm.bias", lyr["ln2"]["b"])
        W(f"{p}.fc1.weight", np.asarray(lyr["fc1"]["w"]).T)
        W(f"{p}.fc1.bias", lyr["fc1"]["b"])
        W(f"{p}.fc2.weight", np.asarray(lyr["fc2"]["w"]).T)
        W(f"{p}.fc2.bias", lyr["fc2"]["b"])

    buf = io.BytesIO()
    write_ggml_file(buf, HP, np.zeros((HP.n_mels, 201), np.float32),
                    [b"x"] * 4, tensors)
    buf.seek(0)
    loaded = encoder_params_from_ggml(read_ggml_file(buf))

    mel = rng.standard_normal((1, HP.n_mels, 2 * HP.n_audio_ctx)).astype(np.float32)
    a = np.asarray(encoder_forward(params, jnp.asarray(mel), HP))
    b = np.asarray(encoder_forward(loaded, jnp.asarray(mel), HP))
    # conv weights go through f16 on disk
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_fingerprint_format(rng):
    params = random_encoder_params(rng, HP)
    mel = rng.standard_normal((1, HP.n_mels, 2 * HP.n_audio_ctx)).astype(np.float32)
    out = encoder_forward(params, jnp.asarray(mel), HP)
    fp = fingerprint(np.asarray(out))
    parts = fp.split()
    assert len(parts) == 20
    assert all("." in p for p in parts)


def test_fused_qkv_matches_separate(rng):
    """fuse_encoder_qkv (the runtime layout WhisperContext applies) is a
    pure re-parameterization: identical outputs, dense and quantized."""
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.models.encoder import (encoder_forward,
                                                fuse_encoder_qkv,
                                                random_encoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_encoder_params
    hp = HP
    params = random_encoder_params(rng, hp)
    mel = jnp.asarray(rng.standard_normal((1, hp.n_mels,
                                           2 * hp.n_audio_ctx)), jnp.float32)
    a = np.asarray(encoder_forward(params, mel, hp))
    b = np.asarray(encoder_forward(fuse_encoder_qkv(params), mel, hp))
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)

    qp = quantize_encoder_params(params, GGMLType.Q8_0)
    aq = np.asarray(encoder_forward(qp, mel, hp))
    bq = np.asarray(encoder_forward(fuse_encoder_qkv(qp), mel, hp))
    np.testing.assert_allclose(bq, aq, atol=1e-5, rtol=1e-5)


def test_w8a8_encoder_close_to_dense(rng):
    """quantize_encoder_params(mode="fast") — the serving-throughput
    encoder config (per-channel int8 weights on the native int8 MXU,
    ops/linear.py::_w8a8). Not a bit-exactness contract like the ggml
    blocks; assert the output tracks dense within w8a8 rounding, and the
    fused-QKV transform stays a pure re-parameterization."""
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.models.encoder import (encoder_forward,
                                                fuse_encoder_qkv,
                                                random_encoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_encoder_params
    hp = HP
    params = random_encoder_params(rng, hp)
    mel = jnp.asarray(rng.standard_normal((1, hp.n_mels,
                                           2 * hp.n_audio_ctx)), jnp.float32)
    dense = np.asarray(encoder_forward(params, mel, hp))
    qp = quantize_encoder_params(params, GGMLType.Q8_0, mode="fast")
    assert "qs8" in qp["layers"][0]["q"] and "scale_n" in qp["layers"][0]["q"]
    w8 = np.asarray(encoder_forward(qp, mel, hp))
    # per-channel int8 rounding through a tiny tower: same scale of error
    # as the decoder's w8a8 logits drift — loose but must correlate
    assert np.corrcoef(dense.ravel(), w8.ravel())[0, 1] > 0.999
    assert np.max(np.abs(w8 - dense)) < 0.15 * np.max(np.abs(dense))
    w8f = np.asarray(encoder_forward(fuse_encoder_qkv(qp), mel, hp))
    np.testing.assert_allclose(w8f, w8, atol=2e-5, rtol=1e-5)
