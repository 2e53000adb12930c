"""Pluggable logging with levels (reference: whisper_log_set /
whisper_log_internal / default stderr sink, src/qwen2-whisper.cpp:883-889,
4186-4229; levels from ggml_log_level)."""

from __future__ import annotations

import enum
import sys
from typing import Callable


class LogLevel(enum.IntEnum):
    NONE = 0
    DEBUG = 1
    INFO = 2
    WARN = 3
    ERROR = 4
    CONT = 5


LogCallback = Callable[[LogLevel, str, object], None]


def _default_callback(level: LogLevel, text: str, user_data: object) -> None:
    sys.stderr.write(text)
    sys.stderr.flush()


_callback: LogCallback = _default_callback
_user_data: object = None


def log_set(callback: LogCallback | None, user_data: object = None) -> None:
    """Install a log sink; None restores the stderr default."""
    global _callback, _user_data
    _callback = callback or _default_callback
    _user_data = user_data


def log(level: LogLevel, fmt: str, *args) -> None:
    _callback(level, fmt % args if args else fmt, _user_data)


def log_info(fmt: str, *args) -> None:
    log(LogLevel.INFO, fmt, *args)


def log_warn(fmt: str, *args) -> None:
    log(LogLevel.WARN, fmt, *args)


def log_error(fmt: str, *args) -> None:
    log(LogLevel.ERROR, fmt, *args)
