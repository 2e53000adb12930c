"""One-launch SwiGLU MLP kernel (ops/fused_mlp.py) vs the two-kernel path.

The fused kernel must track silu(x@gate)*(x@up)@down computed by the
separate stacked quant matmuls within the fast-mode rounding envelope
(the intermediate is rounded to bf16 in both paths), and the dequant
(f32) mode must match tightly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_stacked
from qwen2_audio_tpu.ops.quant_matmul import quant_linear_stacked
from qwen2_audio_tpu.quant.qparams import quantize_array_for_device


def _stack(dicts):
    return {k: jnp.stack([d[k] for d in dicts]) for k in dicts[0]}


def _mk(rng, L, K, I, ttype=GGMLType.Q8_0):
    gus, dns = [], []
    for _ in range(L):
        gu = rng.standard_normal((K, 2 * I)).astype(np.float32) * 0.1
        dn = rng.standard_normal((I, K)).astype(np.float32) * 0.1
        gus.append(quantize_array_for_device(gu, ttype))
        dns.append(quantize_array_for_device(dn, ttype))
    return _stack(gus), _stack(dns)


@pytest.mark.parametrize("fast", [False, True])
def test_fused_matches_two_kernel(fast, rng):
    L, K, I, M = 2, 256, 512, 8
    gu, dn = _mk(rng, L, K, I)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    import jax
    for li in range(L):
        lij = jnp.asarray(li, jnp.int32)
        got = np.asarray(fused_mlp_stacked(
            x, gu["qs"], gu["scales"], dn["qs"], dn["scales"], lij,
            fast=fast))
        gu_out = quant_linear_stacked(x, gu, lij, fast=fast)
        gated = jax.nn.silu(gu_out[:, :I]) * gu_out[:, I:]
        want = np.asarray(quant_linear_stacked(gated, dn, lij, fast=fast))
        tol = 0.03 if fast else 1e-4
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < tol, \
            (li, fast, np.abs(got - want).max(), scale)


def test_fused_block_i_edge_cases(rng):
    """I not divisible by the preferred block falls back cleanly."""
    L, K, I, M = 1, 256, 768, 4     # 768 % 256 == 0 but test bi=512 pref
    gu, dn = _mk(rng, L, K, I)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    lij = jnp.asarray(0, jnp.int32)
    got = np.asarray(fused_mlp_stacked(x, gu["qs"], gu["scales"],
                                       dn["qs"], dn["scales"], lij,
                                       block_i=512))
    import jax
    gu_out = quant_linear_stacked(x, gu, lij)
    gated = jax.nn.silu(gu_out[:, :I]) * gu_out[:, I:]
    want = np.asarray(quant_linear_stacked(gated, dn, lij))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("ttype", [GGMLType.Q4_0, GGMLType.Q4_1])
def test_fused4_matches_two_kernel(fast, ttype, monkeypatch, rng):
    """Packed-nibble fused MLP (mins folded in-kernel) vs the two-launch
    packed path + external gsum@mins correction.  Pins QA_Q4_SYM=0: this
    is the mins-carrying form's test (sym default would drop the q4_0
    mins leaf; the sym fused path has its own parity tests)."""
    from qwen2_audio_tpu.ops.fused_mlp import fused_mlp4_stacked

    monkeypatch.setenv("QA_Q4_SYM", "0")
    L, K, I, M = 2, 256, 512, 8
    gu, dn = _mk(rng, L, K, I, ttype=ttype)
    assert "qs4" in gu, "pack4 storage expected for 4-bit formats"
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    import jax
    for li in range(L):
        lij = jnp.asarray(li, jnp.int32)
        got = np.asarray(fused_mlp4_stacked(
            x, gu["qs4"], gu["scales"], gu["mins"],
            dn["qs4"], dn["scales"], dn["mins"], lij, fast=fast))
        gu_out = quant_linear_stacked(x, gu, lij, fast=fast)
        gated = jax.nn.silu(gu_out[:, :I]) * gu_out[:, I:]
        want = np.asarray(quant_linear_stacked(gated, dn, lij, fast=fast))
        tol = 0.03 if fast else 1e-4
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < tol, \
            (li, fast, np.abs(got - want).max(), scale)


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("ttype", [GGMLType.Q5_1, GGMLType.Q2_K])
def test_fused_m_matches_two_kernel(fast, ttype, rng):
    """Strided-int8 + mins fused MLP (q5_1 32-groups, q2_K 16-groups) vs
    the two-launch path + external gsum@mins correction."""
    from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_m_stacked

    L, K, I, M = 2, 256, 512, 8
    gu, dn = _mk(rng, L, K, I, ttype=ttype)
    assert "mins" in gu and "qs" in gu, "strided+mins storage expected"
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    import jax
    for li in range(L):
        lij = jnp.asarray(li, jnp.int32)
        got = np.asarray(fused_mlp_m_stacked(
            x, gu["qs"], gu["scales"], gu["mins"],
            dn["qs"], dn["scales"], dn["mins"], lij, fast=fast))
        gu_out = quant_linear_stacked(x, gu, lij, fast=fast)
        gated = jax.nn.silu(gu_out[:, :I]) * gu_out[:, I:]
        want = np.asarray(quant_linear_stacked(gated, dn, lij, fast=fast))
        tol = 0.03 if fast else 1e-4
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < tol, \
            (li, fast, np.abs(got - want).max(), scale)


def test_decoder_uses_fused_m_mlp_and_matches(monkeypatch, rng):
    """decoder_forward q5_1 (strided + mins): fused on/off logits parity
    — the dispatch routes min-carrying strided dicts to the m-variant."""
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, embed_tokens, fuse_decoder_params,
        random_decoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params

    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qp = fuse_decoder_params(quantize_decoder_params(params, GGMLType.Q5_1))
    assert "mins" in qp["layers"]["gate_up"], "expected strided+mins q5_1"
    toks = jnp.asarray(rng.integers(0, 128, (1, 5)))
    x = embed_tokens(params, toks)

    outs = {}
    for env in ("0", "1"):
        monkeypatch.setenv("QA_FUSED_MLP", env)
        cache = create_cache(cfg, 1, 8, dtype=jnp.float32)
        lg, _ = decoder_forward(qp, cfg, x, cache, 0, block_only=True)
        outs[env] = np.asarray(lg)
        decoder_forward.clear_cache()
    scale = np.abs(outs["0"]).max() + 1e-6
    assert np.abs(outs["1"] - outs["0"]).max() / scale < 1e-4


def test_decoder_uses_fused4_mlp_and_matches(monkeypatch, rng):
    """decoder_forward q4_0 with QA_FUSED_MLP on vs off: same logits
    within the fast-mode envelope (the packed fused kernel engages —
    its dispatch requires qs4+mins on both gate_up and down)."""
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, embed_tokens, fuse_decoder_params,
        random_decoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params

    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qp = fuse_decoder_params(quantize_decoder_params(params, GGMLType.Q4_0))
    assert "qs4" in qp["layers"]["gate_up"], "expected packed q4_0"
    toks = jnp.asarray(rng.integers(0, 128, (1, 5)))
    x = embed_tokens(params, toks)

    outs = {}
    for env in ("0", "1"):
        monkeypatch.setenv("QA_FUSED_MLP", env)
        cache = create_cache(cfg, 1, 8, dtype=jnp.float32)
        lg, _ = decoder_forward(qp, cfg, x, cache, 0, block_only=True)
        outs[env] = np.asarray(lg)
        decoder_forward.clear_cache()
    scale = np.abs(outs["0"]).max() + 1e-6
    assert np.abs(outs["1"] - outs["0"]).max() / scale < 1e-4


def test_decoder_uses_fused_mlp_and_matches(monkeypatch, rng):
    """decoder_forward with QA_FUSED_MLP on vs off: same logits within the
    fast-mode envelope; the dispatch actually engages (fused params,
    strided q8_0, decode-sized T)."""
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, embed_tokens, fuse_decoder_params,
        random_decoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params

    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qp = fuse_decoder_params(quantize_decoder_params(params, GGMLType.Q8_0))
    toks = jnp.asarray(rng.integers(0, 128, (1, 5)))
    x = embed_tokens(params, toks)

    outs = {}
    for env in ("0", "1"):
        monkeypatch.setenv("QA_FUSED_MLP", env)
        cache = create_cache(cfg, 1, 8, dtype=jnp.float32)
        lg, _ = decoder_forward(qp, cfg, x, cache, 0, block_only=True)
        outs[env] = np.asarray(lg)
        decoder_forward.clear_cache()
    scale = np.abs(outs["0"]).max() + 1e-6
    assert np.abs(outs["1"] - outs["0"]).max() / scale < 1e-4


def _mk_split(rng, L, K, I, ttype):
    g, u, dn = ([], [], [])
    for _ in range(L):
        g.append(quantize_array_for_device(
            rng.standard_normal((K, I)).astype(np.float32) * 0.1, ttype))
        u.append(quantize_array_for_device(
            rng.standard_normal((K, I)).astype(np.float32) * 0.1, ttype))
        dn.append(quantize_array_for_device(
            rng.standard_normal((I, K)).astype(np.float32) * 0.1, ttype))
    return _stack(g), _stack(u), _stack(dn)


@pytest.mark.parametrize("ttype", [GGMLType.Q8_0, GGMLType.Q4_0,
                                   GGMLType.Q4_1, GGMLType.Q5_1])
def test_fused_split_matches_three_kernel(ttype, rng):
    """Split-schema (canonical gate/up) one-launch SwiGLU must match the
    three-launch path — the form TP shards use (VERDICT r3 weak #6).
    Q4_0 exercises the sym (2-leaf packed, (q-8)*d) kind under the sym
    default; Q4_1 keeps the mins-carrying packed_m kind covered."""
    import jax
    from qwen2_audio_tpu.ops.fused_mlp import fused_mlp_split_stacked

    L, K, I, M = 2, 256, 512, 8
    g, u, dn = _mk_split(rng, L, K, I, ttype)
    packed = "qs4" in g
    base = ("qs4",) if packed else ("qs",)
    order = base + (("scales", "mins") if "mins" in g else ("scales",))
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    for li in range(L):
        lij = jnp.asarray(li, jnp.int32)
        got = np.asarray(fused_mlp_split_stacked(
            x, tuple(g[k] for k in order), tuple(u[k] for k in order),
            tuple(dn[k] for k in order), lij, packed=packed, fast=True))
        gated = jax.nn.silu(quant_linear_stacked(x, g, lij, fast=True)) \
            * quant_linear_stacked(x, u, lij, fast=True)
        want = np.asarray(quant_linear_stacked(gated, dn, lij, fast=True))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
        assert np.isfinite(got).all() and rel < 0.03, (li, rel)


def test_fused_split_at_dispatch_and_guards(rng):
    """ops/linear.py::fused_mlp_split_at engages on the canonical schema
    (CPU default-on), falls back to None for prefill M, int8 mode, and a
    whole-I VMEM-busting block."""
    import jax
    from qwen2_audio_tpu.ops.linear import fused_mlp_split_at, linear_at
    from qwen2_audio_tpu.ops import linear as linear_mod

    L, K, I, M = 2, 256, 512, 8
    g, u, dn = _mk_split(rng, L, K, I, GGMLType.Q8_0)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    lij = jnp.asarray(1, jnp.int32)
    y = fused_mlp_split_at(x, g, u, dn, lij)
    assert y is not None
    gated = jax.nn.silu(linear_at(x, g, lij)) * linear_at(x, u, lij)
    want = np.asarray(linear_at(gated, dn, lij))
    rel = np.abs(np.asarray(y) - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.03

    # prefill-scale M falls back
    xp = jnp.asarray(rng.standard_normal((65, K)).astype(np.float32))
    assert fused_mlp_split_at(xp, g, u, dn, lij) is None

    # int8 exact mode bypasses the fused kernel
    linear_mod.set_group_matmul_mode("int8")
    try:
        assert fused_mlp_split_at(x, g, u, dn, lij) is None
    finally:
        linear_mod.set_group_matmul_mode(None)

    # a TP-local I with no conforming block divisor + huge K would blow
    # the scoped-VMEM budget -> refused (pick_block_i falls back to I)
    from qwen2_audio_tpu.ops.fused_mlp import pick_block_i
    assert pick_block_i(4736, 32) == 4736      # 7B tp=4 local I


def test_validator_split_block_covers_all_forms(rng):
    """Drive tools/validate_tpu_kernels.py::validate_fused_mlp_split on
    the CPU: the r4e fresh-host run found its old hardcoded
    ("qs4","scales","mins") leaf orders KeyError-ing once the sym q4_0
    default (no mins leaf) engaged — which silently left the TP/canonical
    schema on the three-launch MLP on every later host. The validator's
    own block must keep passing in BOTH q4 forms so the marker can arm."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from validate_tpu_kernels import (validate_fused_mlp4,
                                      validate_fused_mlp_split)
    validate_fused_mlp4(np.random.default_rng(0))
    validate_fused_mlp_split(np.random.default_rng(0))
