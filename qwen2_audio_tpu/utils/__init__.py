from qwen2_audio_tpu.utils.logging import log, log_set, LogLevel  # noqa: F401
from qwen2_audio_tpu.utils.timings import Timings  # noqa: F401
