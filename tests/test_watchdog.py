"""utils/watchdog.py: readback deadline + background kernel validation."""

import os
import time

from qwen2_audio_tpu.utils import watchdog as wd


def test_watchdog_cancel_prevents_exit():
    cancel = wd.watchdog(0.2, "test")
    cancel()
    time.sleep(0.4)          # would have os._exit(2)'d the test runner


def test_guarded_context_manager():
    with wd.guarded(0.2, "test"):
        pass
    time.sleep(0.4)


def test_kernel_marker_respects_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("QA_MARKER_DIR", str(tmp_path))
    assert not wd.kernel_marker("xyz")
    (tmp_path / "qa_kernel_ok_xyz").write_text("1")
    assert wd.kernel_marker("xyz")


def test_ensure_validation_short_circuits_on_marker(tmp_path, monkeypatch):
    monkeypatch.setenv("QA_MARKER_DIR", str(tmp_path))
    (tmp_path / "qa_kernel_ok_tpu").write_text("1")
    assert wd.ensure_kernel_validation() is True
    # no launch happened: no lock file
    assert not (tmp_path / "qa_kernel_validate_running").exists()


def test_ensure_validation_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("QA_MARKER_DIR", str(tmp_path))
    monkeypatch.setenv("QA_NO_AUTOVALIDATE", "1")
    assert wd.ensure_kernel_validation() is False
    assert not (tmp_path / "qa_kernel_validate_running").exists()


def test_ensure_validation_single_flight(tmp_path, monkeypatch):
    """A fresh lock suppresses a second launch attempt."""
    monkeypatch.setenv("QA_MARKER_DIR", str(tmp_path))
    (tmp_path / "qa_kernel_validate_running").write_text(str(os.getpid()))
    calls = []
    monkeypatch.setattr(wd.subprocess, "Popen",
                        lambda *a, **k: calls.append(a))
    assert wd.ensure_kernel_validation() is False
    assert calls == []
