"""Training checkpoint/resume (orbax).

The reference's only checkpoint story is the inference model file itself
(SURVEY.md §5: "the single-file ggml model format *is* the checkpoint",
layout src/qwen2-whisper.cpp:1339-1348). For the training subsystem this
module adds real save/restore of the full TrainState (params + optimizer
moments + step) with orbax, plus export of the trained encoder back to the
ggml format so inference tooling can consume fine-tuned weights.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_train_state(ckpt_dir: str | Path, state, step: int | None = None
                     ) -> Path:
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    path = ckpt_dir / f"step_{step:08d}"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_train_state(ckpt_dir: str | Path, template,
                        step: int | None = None):
    """Restore into the structure of `template` (an initialized TrainState)."""
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).resolve()
    if step is None:
        steps = sorted(p.name for p in ckpt_dir.glob("step_*"))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        path = ckpt_dir / steps[-1]
    else:
        path = ckpt_dir / f"step_{step:08d}"
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template))
    return jax.tree.map(lambda t, r: r, template, restored)


def export_encoder_to_ggml(path: str, train_state, hp, filters: np.ndarray,
                           vocab: list[bytes], use_f16: bool = True) -> None:
    """Fine-tuned encoder -> ggml-model.bin (round-trips into the inference
    runtime and into the original ggml tooling)."""
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    enc = jax.device_get(train_state.params["encoder"])
    write_encoder_checkpoint(path, enc, hp, filters, vocab, use_f16=use_f16)
