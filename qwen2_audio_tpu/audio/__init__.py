from qwen2_audio_tpu.audio.filters import mel_filterbank  # noqa: F401
from qwen2_audio_tpu.audio.mel import (  # noqa: F401
    LogMelSpectrogram,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
)
from qwen2_audio_tpu.audio.wav import read_wav, write_wav  # noqa: F401
