"""Logging + system-info API tests (whisper_log_set analogue)."""


def test_log_callback_roundtrip():
    from whisper_tpu.runtime.logging import (LogLevel, log, log_set,
                                             log_info, log_warn)

    seen = []
    log_set(lambda level, text: seen.append((level, text)))
    try:
        log_info("hello\n")
        log_warn("danger\n")
        log(LogLevel.DEBUG, "dbg\n")
    finally:
        log_set(None)
    assert seen[0] == (LogLevel.INFO, "hello\n")
    assert seen[1] == (LogLevel.WARN, "danger\n")
    assert seen[2][0] == LogLevel.DEBUG  # custom callback sees DEBUG too


def test_default_suppresses_debug(capsys):
    from whisper_tpu.runtime.logging import LogLevel, log, log_set

    log_set(None)
    log(LogLevel.DEBUG, "invisible\n")
    log(LogLevel.ERROR, "visible\n")
    err = capsys.readouterr().err
    assert "invisible" not in err
    assert "visible" in err


def test_system_info_string():
    from whisper_tpu.runtime.logging import print_system_info

    s = print_system_info()
    assert "WHISPER_TPU" in s and "NATIVE" in s and "FLASH_ATTN" in s
