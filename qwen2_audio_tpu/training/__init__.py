from qwen2_audio_tpu.training.step import (  # noqa: F401
    TrainState,
    make_train_step,
    init_train_state,
)
