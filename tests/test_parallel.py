"""Sharding + training-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from qwen2_audio_tpu.config import (
    Qwen2AudioConfig,
    Qwen2DecoderConfig,
    WhisperHParams,
)
from qwen2_audio_tpu.parallel.mesh import (
    decoder_param_spec,
    encoder_param_spec,
    kv_cache_spec,
    make_mesh,
    shard_params,
)

AUDIO = WhisperHParams(n_vocab=64, n_audio_ctx=32, n_audio_state=64,
                       n_audio_head=4, n_audio_layer=2, n_mels=16)
TEXT = Qwen2DecoderConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, tie_word_embeddings=False)


def test_mesh_creation():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(dp=4, tp=4)


def test_decoder_spec_covers_all_leaves(rng):
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    params = random_decoder_params(rng, TEXT)
    spec = decoder_param_spec(params)
    assert jax.tree.structure(params) == jax.tree.structure(spec)
    # column-parallel q, row-parallel o
    assert spec["layers"]["q"]["w"] == P(None, None, "tp")
    assert spec["layers"]["o"]["w"] == P(None, "tp", None)
    assert spec["layers"]["ln1"]["w"] == P()
    assert spec["lm_head"]["w"] == P(None, "tp")


def test_quantized_decoder_spec(rng):
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
    params = quantize_decoder_params(random_decoder_params(rng, TEXT),
                                     GGMLType.Q8_0)
    spec = decoder_param_spec(params)
    assert jax.tree.structure(params) == jax.tree.structure(spec)
    assert spec["layers"]["q"]["qs"] == P(None, None, "tp")
    assert spec["layers"]["down"]["scales"] == P(None, "tp", None)


def test_sharded_decoder_forward_matches_single(rng):
    """TP+DP sharded forward must equal the unsharded one."""
    from qwen2_audio_tpu.models.qwen2_decoder import (
        KVCache, decoder_forward, embed_tokens, random_decoder_params)
    params = random_decoder_params(rng, TEXT)
    toks = jnp.asarray(rng.integers(0, 128, (4, 6)))
    x = embed_tokens(params, toks)

    cache = KVCache.create(TEXT, 4, 8, dtype=jnp.float32)
    want, _ = decoder_forward(params, TEXT, x, cache, 0)

    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        sp = shard_params(params, decoder_param_spec(params), mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
        cache2 = jax.device_put(KVCache.create(TEXT, 4, 8, dtype=jnp.float32),
                                jax.tree.map(lambda s: NamedSharding(mesh, s),
                                             kv_cache_spec()))
        got, new_cache = decoder_forward(sp, TEXT, xs, cache2, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    assert int(new_cache.pos) == 6


def test_sharded_encoder_forward_matches_single(rng):
    from qwen2_audio_tpu.models.encoder import encoder_forward, random_encoder_params
    params = random_encoder_params(rng, AUDIO)
    mel = jnp.asarray(rng.standard_normal((4, 16, 64)), jnp.float32)
    want = encoder_forward(params, mel, AUDIO)

    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        sp = shard_params(params, encoder_param_spec(params), mesh)
        mels = jax.device_put(mel, NamedSharding(mesh, P("dp", None, None)))
        got = encoder_forward(sp, mels, AUDIO)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_train_step_decreases_loss(rng):
    from qwen2_audio_tpu.training.step import init_train_state, make_train_step
    cfg = Qwen2AudioConfig(audio=AUDIO, text=TEXT)
    opt = optax.adamw(1e-3)
    state = init_train_state(rng, cfg, opt)
    step = make_train_step(cfg, opt)

    mel = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 128, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.float32)

    losses = []
    for _ in range(5):
        state, loss = step(state, mel, toks, mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_quant_cache_decode(rng):
    """TP+DP decode over the int8 cache matches the unsharded result."""
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, embed_tokens, random_decoder_params)
    from qwen2_audio_tpu.parallel.mesh import quant_kv_cache_spec
    params = random_decoder_params(rng, TEXT)
    toks = jnp.asarray(rng.integers(0, 128, (4, 5)))
    x = embed_tokens(params, toks)

    c0 = create_cache(TEXT, 4, 8, dtype="q8")
    want, _ = decoder_forward(params, TEXT, x, c0, 0)

    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        sp = shard_params(params, decoder_param_spec(params), mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
        cache = jax.device_put(
            create_cache(TEXT, 4, 8, dtype="q8"),
            jax.tree.map(lambda s: NamedSharding(mesh, s),
                         quant_kv_cache_spec()))
        got, _ = decoder_forward(sp, TEXT, xs, cache, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)


def test_distributed_single_process_cluster():
    """jax.distributed with a 1-process localhost coordinator: initialize,
    build a global mesh on the virtual devices, run a psum + the
    host-local batch pattern. Runs in a subprocess because
    jax.distributed.initialize must precede first backend use (other
    tests in this session have already initialized it)."""
    import socket
    import subprocess
    import sys
    # a fixed coordinator port collides with concurrent sessions (this
    # test once failed under background-job load); bind port 0 to get a
    # free one — the tiny close-to-reuse race window is fine for a test
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = f"""
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from qwen2_audio_tpu.parallel import distributed as dist

assert dist.initialize() is False          # nothing configured: no-op
assert dist.initialize(coordinator_address="127.0.0.1:{port}",
                       num_processes=1, process_id=0)
assert jax.process_count() == 1
mesh = dist.global_mesh(tp=2)
assert mesh.shape["tp"] == 2
assert mesh.shape["dp"] == len(jax.devices()) // 2

batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
garr = dist.host_local_batch_to_global(batch, mesh, P("dp"))
assert garr.shape == (8, 3)
np.testing.assert_array_equal(np.asarray(garr), batch)

with mesh:
    s = jax.jit(lambda x: jnp.sum(x))(garr)
assert float(s) == float(batch.sum())

g = dist.process_allgather(np.array([3.0]))
assert g.shape == (1, 1) and g[0, 0] == 3.0
dist.shutdown()
print("DIST_OK")
"""
    env = {"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
           "HOME": "/root", "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=180)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DIST_OK" in r.stdout
