"""Per-phase wall-clock accounting (reference: whisper_state timing fields
src/qwen2-whisper.cpp:796-810, accumulation :2335-2336, report
whisper_print_timings :3516-3538, reset :3540-3551).

TPU note: phases are timed around host-side synchronization points
(device_get of the phase result), since XLA executes asynchronously.
"""

from __future__ import annotations

import dataclasses
import time

from qwen2_audio_tpu.utils.logging import log_info


def time_us() -> int:
    return int(time.perf_counter() * 1e6)


@dataclasses.dataclass
class Timings:
    t_start_us: int = 0
    t_load_us: int = 0
    t_mel_us: int = 0
    t_sample_us: int = 0
    t_encode_us: int = 0
    t_decode_us: int = 0
    t_batchd_us: int = 0
    t_prompt_us: int = 0
    n_sample: int = 0
    n_encode: int = 0
    n_decode: int = 0
    n_batchd: int = 0
    n_prompt: int = 0
    n_fail_p: int = 0
    n_fail_h: int = 0

    def reset(self) -> None:
        for f in ("t_mel_us", "t_sample_us", "t_encode_us", "t_decode_us",
                  "t_batchd_us", "t_prompt_us", "n_sample", "n_encode",
                  "n_decode", "n_batchd", "n_prompt", "n_fail_p", "n_fail_h"):
            setattr(self, f, 0)

    def print(self, t_end_us: int | None = None) -> None:
        t_end_us = time_us() if t_end_us is None else t_end_us
        log_info("\n")
        log_info("timings: load time = %8.2f ms\n", self.t_load_us / 1000.0)
        log_info("timings: fallbacks = %3d p / %3d h\n",
                 self.n_fail_p, self.n_fail_h)
        log_info("timings: mel time  = %8.2f ms\n", self.t_mel_us / 1000.0)
        for name, t, n in (("sample", self.t_sample_us, self.n_sample),
                           ("encode", self.t_encode_us, self.n_encode),
                           ("decode", self.t_decode_us, self.n_decode),
                           ("batchd", self.t_batchd_us, self.n_batchd),
                           ("prompt", self.t_prompt_us, self.n_prompt)):
            n_ = max(n, 1)
            log_info("timings: %s time = %8.2f ms / %5d runs (%8.2f ms per run)\n",
                     name, t / 1000.0, n, (t / 1000.0) / n_)
        if self.t_start_us:
            log_info("timings: total time = %8.2f ms\n",
                     (t_end_us - self.t_start_us) / 1000.0)
