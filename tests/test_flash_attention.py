"""Flash attention kernel vs plain softmax reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_encoder,
)


def ref_attention(q, k, v, sm_scale, causal=False, kv_valid=None):
    logits = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * sm_scale
    Tk = k.shape[2]
    if kv_valid is not None and kv_valid < Tk:
        logits[..., kv_valid:] = -np.inf
    if causal:
        Tq = q.shape[2]
        mask = np.tril(np.ones((Tq, Tk), bool), k=Tk - Tq)
        logits = np.where(mask, logits, -np.inf)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v).astype(np.float32)


@pytest.mark.parametrize("Tq,Tk,d", [(256, 256, 64), (300, 300, 64),
                                     (128, 384, 128)])
def test_matches_reference(Tq, Tk, d, rng):
    q = rng.standard_normal((2, 3, Tq, d)).astype(np.float32)
    k = rng.standard_normal((2, 3, Tk, d)).astype(np.float32)
    v = rng.standard_normal((2, 3, Tk, d)).astype(np.float32)
    sm = d ** -0.5
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), sm_scale=sm))
    want = ref_attention(q, k, v, sm)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_causal(rng):
    q = rng.standard_normal((1, 2, 256, 64)).astype(np.float32)
    k = rng.standard_normal((1, 2, 256, 64)).astype(np.float32)
    v = rng.standard_normal((1, 2, 256, 64)).astype(np.float32)
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), sm_scale=0.125,
                                     causal=True))
    want = ref_attention(q, k, v, 0.125, causal=True)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_kv_valid_mask(rng):
    """Padded key positions must not leak attention mass."""
    q = rng.standard_normal((1, 1, 128, 64)).astype(np.float32)
    k = rng.standard_normal((1, 1, 200, 64)).astype(np.float32)
    v = rng.standard_normal((1, 1, 200, 64)).astype(np.float32)
    # poison the tail
    k[:, :, 150:] = 100.0
    v[:, :, 150:] = 100.0
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), sm_scale=0.125,
                                     kv_valid=150))
    want = ref_attention(q[:, :, :, :], k[:, :, :150], v[:, :, :150], 0.125)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_encoder_entry_matches_sdpa(rng):
    from qwen2_audio_tpu.models.encoder import _sdpa
    B, T, D, H = 2, 300, 128, 2
    q = rng.standard_normal((B, T, D)).astype(np.float32)
    k = rng.standard_normal((B, T, D)).astype(np.float32)
    v = rng.standard_normal((B, T, D)).astype(np.float32)
    got = np.asarray(flash_attention_encoder(jnp.asarray(q), jnp.asarray(k),
                                             jnp.asarray(v), H))
    want = np.asarray(_sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_encoder_forward_flash_vs_einsum(rng):
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.models.encoder import (encoder_forward,
                                                random_encoder_params)
    hp = WhisperHParams(n_audio_ctx=256, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_mels=16)
    params = random_encoder_params(rng, hp)
    mel = rng.standard_normal((1, hp.n_mels, 2 * hp.n_audio_ctx)).astype(np.float32)
    a = np.asarray(encoder_forward(params, jnp.asarray(mel), hp, use_flash=False))
    b = np.asarray(encoder_forward(params, jnp.asarray(mel), hp, use_flash=True))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_single_pass_matches_online_kernel(rng):
    """The one-shot (single KV block) kernel must match the online-softmax
    kernel bit-for-bit at f32 on both the padded and unpadded tails."""
    for T in (256, 300):     # 256: no key padding; 300: padded to 384
        q = rng.standard_normal((1, 2, T, 64)).astype(np.float32)
        k = rng.standard_normal((1, 2, T, 64)).astype(np.float32)
        v = rng.standard_normal((1, 2, T, 64)).astype(np.float32)
        bk = T + (-T % 128)
        args = dict(sm_scale=0.125, block_q=128, block_k=bk)
        one = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v), single=True, **args))
        onl = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v), single=False, **args))
        np.testing.assert_allclose(one, onl, atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(one, ref_attention(q, k, v, 0.125),
                                   atol=2e-5, rtol=1e-4)


def test_lite_matches_online_kernel(rng):
    """The MXU-bookkeeping one-shot kernel (scale baked into Q, mask bias
    and softmax denominator riding the pad lanes) must match the online
    kernel and the plain reference, including a padded key tail."""
    for T in (256, 300):     # 256: no key padding; 300: padded to 384
        q = rng.standard_normal((1, 2, T, 64)).astype(np.float32)
        k = rng.standard_normal((1, 2, T, 64)).astype(np.float32)
        v = rng.standard_normal((1, 2, T, 64)).astype(np.float32)
        bk = T + (-T % 128)
        args = dict(sm_scale=0.125, block_q=128, block_k=bk)
        lite = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), single=True,
                                          lite=True, **args))
        onl = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v), single=False,
                                         **args))
        np.testing.assert_allclose(lite, onl, atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(lite, ref_attention(q, k, v, 0.125),
                                   atol=2e-5, rtol=1e-4)


def test_lite_poisoned_tail(rng):
    """Padded keys must not leak through the lane-bias masking, even when
    the tail is poisoned with huge values."""
    q = rng.standard_normal((1, 1, 128, 64)).astype(np.float32)
    k = rng.standard_normal((1, 1, 200, 64)).astype(np.float32)
    v = rng.standard_normal((1, 1, 200, 64)).astype(np.float32)
    k[:, :, 150:] = 100.0
    v[:, :, 150:] = 100.0
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), sm_scale=0.125,
                                     kv_valid=150, block_q=128, block_k=256,
                                     single=True, lite=True))
    want = ref_attention(q[:, :, :, :], k[:, :, :150], v[:, :, :150], 0.125)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_nopad_matches_reference(rng):
    """The unpadded one-shot variant (d=64 lane blocks, OOB q tail rows,
    zero-padded K/V tail) must match the plain softmax reference at the
    encoder regime, including a non-block-multiple sequence and GQA."""
    from qwen2_audio_tpu.ops.fa_variants import \
        flash_attention_nopad as _flash_attention_nopad
    for T, H, Hkv in ((256, 2, 2), (300, 4, 2), (1500 // 4, 5, 5)):
        q = rng.standard_normal((1, H, T, 64)).astype(np.float32)
        k = rng.standard_normal((1, Hkv, T, 64)).astype(np.float32)
        v = rng.standard_normal((1, Hkv, T, 64)).astype(np.float32)
        got = np.asarray(_flash_attention_nopad(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            sm_scale=0.125, block_q=128))
        assert got.shape == (1, H, T, 64)
        rep = H // Hkv
        want = ref_attention(q, np.repeat(k, rep, axis=1),
                             np.repeat(v, rep, axis=1), 0.125)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_exp2_matches_reference(rng):
    """exp2-domain softmax (scores pre-scaled by log2(e), kernels using
    exp2) must reproduce base-e attention on every kernel path: online,
    one-shot, lite, and the unpadded one-shot."""
    from qwen2_audio_tpu.ops.fa_variants import \
        flash_attention_nopad as _flash_attention_nopad
    from qwen2_audio_tpu.ops.flash_attention import _LOG2E
    T, d = 300, 64
    q = rng.standard_normal((1, 2, T, d)).astype(np.float32)
    k = rng.standard_normal((1, 2, T, d)).astype(np.float32)
    v = rng.standard_normal((1, 2, T, d)).astype(np.float32)
    sm = d ** -0.5
    want = ref_attention(q, k, v, sm)
    bk = T + (-T % 128)
    for kwargs in (dict(),                                   # online kernel
                   dict(single=True, block_q=128, block_k=bk),
                   dict(single=True, lite=True, block_q=128, block_k=bk)):
        got = np.asarray(flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            sm_scale=sm * _LOG2E, exp2=True, **kwargs))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4,
                                   err_msg=str(kwargs))
    got = np.asarray(_flash_attention_nopad(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        sm_scale=sm * _LOG2E, block_q=128, exp2=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_encoder_entry_exp2_env(rng, monkeypatch):
    """QA_FA_EXP2=1 must leave flash_attention_encoder's values unchanged
    (the LOG2E fold rides the Q pre-scale; the kernel swaps exp->exp2)."""
    B, T, D, H = 1, 300, 128, 2
    q = rng.standard_normal((B, T, D)).astype(np.float32)
    k = rng.standard_normal((B, T, D)).astype(np.float32)
    v = rng.standard_normal((B, T, D)).astype(np.float32)
    # ADVICE r3: clear any inherited QA_FA_EXP2 so the baseline really
    # runs base-e (otherwise both calls run exp2 and parity is vacuous)
    monkeypatch.delenv("QA_FA_EXP2", raising=False)
    base = np.asarray(flash_attention_encoder(jnp.asarray(q), jnp.asarray(k),
                                              jnp.asarray(v), H))
    monkeypatch.setenv("QA_FA_EXP2", "1")
    got = np.asarray(flash_attention_encoder(jnp.asarray(q), jnp.asarray(k),
                                             jnp.asarray(v), H))
    np.testing.assert_allclose(got, base, atol=2e-5, rtol=1e-4)


def test_encoder_entry_nopad_vs_padded(rng):
    """flash_attention_encoder must produce the same values whichever
    attention lowering the env picks (nopad / padded-single / online)."""
    import os
    B, T, D, H = 1, 300, 256, 4
    q = rng.standard_normal((B, T, D)).astype(np.float32)
    k = rng.standard_normal((B, T, D)).astype(np.float32)
    v = rng.standard_normal((B, T, D)).astype(np.float32)
    outs = {}
    for nopad, single in (("1", "0"), ("0", "1"), ("0", "0")):
        os.environ["QA_FA_NOPAD"] = nopad
        os.environ["QA_FA_SINGLE"] = single
        try:
            outs[(nopad, single)] = np.asarray(flash_attention_encoder(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H))
        finally:
            del os.environ["QA_FA_NOPAD"], os.environ["QA_FA_SINGLE"]
    base = outs[("0", "0")]
    for key, val in outs.items():
        np.testing.assert_allclose(val, base, atol=2e-5, rtol=1e-4,
                                   err_msg=str(key))


def test_pexp16_matches_reference(rng):
    """bf16-exponent one-shot softmax (QA_FA_PEXP16): the probability
    tile rounds to bf16 before the transcendental, so parity vs the f32
    kernel sits in the bf16-weight class (~2^-8 per weight), not the
    usual 2e-5."""
    T, d = 300, 64
    q = rng.standard_normal((1, 2, T, d)).astype(np.float32)
    k = rng.standard_normal((1, 2, T, d)).astype(np.float32)
    v = rng.standard_normal((1, 2, T, d)).astype(np.float32)
    kw = dict(sm_scale=d ** -0.5, single=True, block_k=512)
    base = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), **kw))
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), pexp16=True, **kw))
    err = np.abs(got - base).max() / (np.abs(base).max() + 1e-9)
    assert err < 1.5e-2, err
    # and through the encoder entry via the env gate
    import os
    os.environ["QA_FA_PEXP16"] = "1"
    try:
        B, D, H = 1, 256, 4
        q2 = rng.standard_normal((B, T, D)).astype(np.float32)
        k2 = rng.standard_normal((B, T, D)).astype(np.float32)
        v2 = rng.standard_normal((B, T, D)).astype(np.float32)
        got2 = np.asarray(flash_attention_encoder(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2), H))
    finally:
        del os.environ["QA_FA_PEXP16"]
    base2 = np.asarray(flash_attention_encoder(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2), H))
    err2 = np.abs(got2 - base2).max() / (np.abs(base2).max() + 1e-9)
    assert err2 < 1.5e-2, err2
