from qwen2_audio_tpu.io.ggml_format import (  # noqa: F401
    GGMLTensor,
    GGMLModelFile,
    read_ggml_file,
    write_ggml_file,
)
