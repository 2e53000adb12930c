from qwen2_audio_tpu.models.encoder import (  # noqa: F401
    encoder_forward,
    encoder_params_from_ggml,
    random_encoder_params,
)
