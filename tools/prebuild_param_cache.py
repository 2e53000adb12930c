#!/usr/bin/env python
"""Pre-build bench param caches HOST-SIDE (no TPU touch).

Fresh hosts wipe ~/.cache/qwen2_audio_tpu/param_cache; the 7B host build
is ~30 min of CPU that would otherwise serialize in front of every TPU
decode run.  This builds the q4_0 symmetric cache bench_decode would
build (same env-pinned layout: packed nibbles, f32 scales, no mins) and
derives the int8-stored-nibble variant by dtype view (same bits —
quant/qparams.py::_pack4_i8_enabled).

Run with:  env -u PALLAS_AXON_POOL_IPS python -u tools/prebuild_param_cache.py 7b
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

# Mirror the layout the TPU bench run will compute (markers armed,
# packed4 => f32 scales, symmetric q4_0) BEFORE any qwen2 import.
os.environ.setdefault("QA_PACK4", "1")
os.environ.setdefault("QA_Q4_SYM", "1")
os.environ.setdefault("QA_Q4_I8", "0")
os.environ.setdefault("QA_SCALE16", "0")
os.environ.setdefault("QA_SCALE_U16", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host build must not open the tunnel

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.bench_decode import SIZES  # noqa: E402
from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig  # noqa: E402
from qwen2_audio_tpu.io.param_cache import (cached_build, load_pytree,  # noqa: E402
                                            save_pytree)
from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params  # noqa: E402
from qwen2_audio_tpu.quant.qparams import quantize_decoder_params  # noqa: E402
from qwen2_audio_tpu.utils.cache import param_cache_dir  # noqa: E402


def main() -> int:
    size = sys.argv[1] if len(sys.argv) > 1 else "7b"
    h, inter, L, H, KV, dh, V = SIZES[size]
    cfg = Qwen2DecoderConfig(
        vocab_size=V, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        head_dim=dh, tie_word_embeddings=False)
    cache = param_cache_dir()
    sym_path = os.path.join(cache, f"bench-{size}-q4_0-sym.npz")
    i8_path = os.path.join(cache, f"bench-{size}-q4_0-q4i8-sym.npz")

    def build_host():
        rng = np.random.default_rng(0)
        p = random_decoder_params(rng, cfg, dtype=jnp.bfloat16, host=True)
        return quantize_decoder_params(p, GGMLType.Q4_0, to_device=False)

    t0 = time.time()
    tree = cached_build(sym_path, build_host)
    print(f"sym cache ready in {time.time()-t0:.1f}s: {sym_path}")

    if not os.path.exists(i8_path):
        def view_i8(node):
            if isinstance(node, dict):
                out = {k: view_i8(v) for k, v in node.items()}
                if "qs4" in out and out["qs4"].dtype == np.uint8:
                    out["qs4"] = np.asarray(out["qs4"]).view(np.int8)
                return out
            if isinstance(node, list):
                return [view_i8(v) for v in node]
            return node

        t0 = time.time()
        save_pytree(i8_path, view_i8(tree))
        print(f"i8 cache derived in {time.time()-t0:.1f}s: {i8_path}")
    # sanity: reload headers only
    for p in (sym_path, i8_path):
        z = np.load(p, mmap_mode="r", allow_pickle=False)
        n = len(z.files)
        print(f"  {os.path.basename(p)}: {n} leaves, "
              f"{os.path.getsize(p)/1e9:.2f} GB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
