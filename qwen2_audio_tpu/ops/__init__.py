from qwen2_audio_tpu.ops.flash_attention import (  # noqa: F401
    flash_attention,
    flash_attention_encoder,
)
