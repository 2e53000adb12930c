"""Device-layout parameter disk cache.

The expensive parts of bringing a big quantized model up on one chip are
(1) host-side quantization into ggml groups and (2) the checkpoint->device
layout conversion. Both are deterministic functions of the source weights,
so their OUTPUT — the numpy pytree exactly as the kernels consume it
(int8/int4 ``qs``, f32 ``scales``/``mins``, dense norms) — is cached to
one .npz per model. A later process mmap-loads and uploads leaf-by-leaf,
dropping 7B time-to-first-token from ~15 min of re-quantization to the
upload+compile cost (docs/ROADMAP.md item 6; the reference has no analog —
ggml files already ARE its device layout, src/qwen2-whisper.cpp:1339-1348).

Format: numpy .npz; pytree structure is encoded in the keys
("layers.q.qs", "lm_head.scales", ...). Only dict-of-dict/array pytrees
are supported — exactly what the model builders produce.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

_SEP = "\x1f"   # key separator that cannot appear in param names


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            assert _SEP not in str(k)
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
        return out
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{_SEP}"))
        return out
    out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _insert(root: dict, parts: list[str], value) -> None:
    node = root
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _listify(node):
    """Convert {'#0': .., '#1': ..} dicts back into lists."""
    if not isinstance(node, dict):
        return node
    if node and all(k.startswith("#") for k in node):
        return [_listify(node[f"#{i}"]) for i in range(len(node))]
    return {k: _listify(v) for k, v in node.items()}


def save_pytree(path: str, tree: Any) -> None:
    """Persist a numpy pytree (atomic rename; ~storage = sum of leaves)."""
    flat = _flatten(tree)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_pytree(path: str) -> Any:
    """Load a pytree saved by save_pytree; leaves come back as numpy
    (mmap-backed where possible) ready for per-leaf device upload."""
    z = np.load(path, mmap_mode="r", allow_pickle=False)
    root: dict = {}
    for key in z.files:
        a = np.asarray(z[key])
        if a.dtype.kind == "V" and a.dtype.itemsize == 2:
            # npz stores ml_dtypes.bfloat16 as raw |V2; restore the view
            import ml_dtypes
            a = a.view(ml_dtypes.bfloat16)
        _insert(root, key.split(_SEP), a)
    return _listify(root)


def cached_build(path: str, build_fn) -> Any:
    """Return the cached pytree at ``path`` or build + persist it."""
    if os.path.exists(path):
        return load_pytree(path)
    tree = build_fn()
    save_pytree(path, tree)
    return tree
