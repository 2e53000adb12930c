"""qwen2_audio_tpu — a TPU-native (JAX/XLA/Pallas) inference + training framework
with the capabilities of Liufeiran123/qwen2-audio-whisper-ggml.

The reference is a whisper.cpp fork re-targeted at the Qwen2-Audio audio encoder
tower (see /root/reference, SURVEY.md).  This package is a from-scratch rebuild:

- ``audio``    — log-mel spectrogram frontend (reference: src/qwen2-whisper.cpp:2402-2665)
- ``io``       — ggml-model.bin + HF safetensors checkpoint I/O
                 (reference: src/qwen2-whisper.cpp:1350-1872, models/convert-pt-to-ggml.py)
- ``quant``    — ggml-compatible q4_0/q4_1/q5_0/q5_1/q8_0 block codecs
                 (reference: ggml/src/ggml-quants.c, ggml/src/ggml-common.h:144-191)
- ``models``   — Qwen2-Audio encoder tower + Qwen2 text decoder (functional JAX)
- ``ops``      — Pallas TPU kernels (flash attention, fused mel, quantized matmul)
- ``parallel`` — jax.sharding mesh + partition specs (replaces ggml-backend sched / RPC)
- ``runtime``  — whisper.cpp-style public API: context/state, full(), timings
                 (reference: include/qwen2-whisper.h:141-527)
- ``training`` — sharded training step (optax) for fine-tuning
"""

__version__ = "0.2.0"

from qwen2_audio_tpu.config import (  # noqa: F401
    WhisperHParams,
    Qwen2DecoderConfig,
    GGMLType,
    GGMLFType,
)
