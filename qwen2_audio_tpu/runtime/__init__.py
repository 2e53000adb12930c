from qwen2_audio_tpu.runtime.context import (  # noqa: F401
    ContextParams,
    FullParams,
    WhisperContext,
    WhisperState,
    context_default_params,
    full_default_params,
)
from qwen2_audio_tpu.runtime.rpc import (  # noqa: F401
    RemoteWhisperContext,
    RpcServer,
)
