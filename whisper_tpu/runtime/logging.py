"""Levelled logging + system info (whisper_log_set /
whisper_print_system_info analogues, src/whisper.cpp:9166-9203, :4339).

A globally settable callback receives every framework log line; the default
prints to stderr.  Modules log through `log(level, msg)`.
"""

from __future__ import annotations

import enum
import sys
from typing import Callable, Optional


class LogLevel(enum.IntEnum):
    NONE = 0
    DEBUG = 1
    INFO = 2
    WARN = 3
    ERROR = 4


_callback: Optional[Callable[[LogLevel, str], None]] = None


def _default_callback(level: LogLevel, text: str) -> None:
    if level == LogLevel.DEBUG:
        return
    sys.stderr.write(text)
    sys.stderr.flush()


def log_set(callback: Optional[Callable[[LogLevel, str], None]]) -> None:
    """whisper_log_set: install a global log callback (None restores the
    stderr default)."""
    global _callback
    _callback = callback


def log(level: LogLevel, text: str) -> None:
    (_callback or _default_callback)(level, text)


def log_info(text: str) -> None:
    log(LogLevel.INFO, text)


def log_warn(text: str) -> None:
    log(LogLevel.WARN, text)


def log_error(text: str) -> None:
    log(LogLevel.ERROR, text)


def print_system_info() -> str:
    """whisper_print_system_info: capability string for the active runtime."""
    import jax

    from .. import native

    parts = [f"WHISPER_TPU : backend = {jax.default_backend()}"]
    devs = jax.devices()
    parts.append(f"devices = {len(devs)}")
    if devs:
        parts.append(f"device0 = {devs[0].device_kind}")
    lib = native.get_lib()
    parts.append(f"NATIVE = {1 if lib is not None else 0}")
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401

        parts.append("FLASH_ATTN = 1")
    except ImportError:
        parts.append("FLASH_ATTN = 0")
    return " | ".join(parts)
