"""TPU entry-point hardening.

Two hazards on this setup (CLAUDE.md):
1. The tunnel can WEDGE — dispatch succeeds but the device->host readback
   never returns, hanging the process (and anything driving it) forever.
   ``watchdog`` fails loudly instead.
2. Composed Pallas programs must be hardware-validated per host before
   they are composed into big jits (unvalidated compiles have wedged the
   remote-compile path). ``ensure_kernel_validation`` launches
   tools/validate_tpu_kernels.py as a DETACHED background process when
   the markers are missing, so first TPU use self-arms the fast paths —
   callers keep running on the always-safe paths until markers appear.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
from pathlib import Path
from typing import Callable

def _marker_dir() -> str:
    return os.environ.get("QA_MARKER_DIR", "/tmp")


def _lock_path() -> str:
    return os.path.join(_marker_dir(), "qa_kernel_validate_running")


def watchdog(seconds: float, label: str = "tpu",
             on_timeout: Callable[[], None] | None = None) -> Callable[[], None]:
    """Arm a daemon-thread deadline: if not cancelled within ``seconds``,
    print a loud diagnostic (then ``on_timeout()`` if given) and
    ``os._exit(2)`` — a wedged readback must kill the process, not hang
    the caller. Returns a zero-cost cancel function."""
    cancelled = threading.Event()

    def _arm():
        if not cancelled.wait(seconds):
            print(f"[watchdog:{label}] TPU did not respond within "
                  f"{seconds:.0f}s — the tunnel readback is likely wedged "
                  "(CLAUDE.md: killing a process mid-TPU-op wedges it for "
                  "hours; do NOT retry immediately)", file=sys.stderr,
                  flush=True)
            if on_timeout is not None:
                try:
                    on_timeout()
                except Exception:
                    pass
            os._exit(2)

    threading.Thread(target=_arm, daemon=True).start()
    return cancelled.set


class guarded:
    """Context manager form: ``with guarded(300, "decode bench"): ...``"""

    def __init__(self, seconds: float, label: str = "tpu"):
        self.seconds, self.label = seconds, label

    def __enter__(self):
        self._cancel = watchdog(self.seconds, self.label)
        return self

    def __exit__(self, *exc):
        self._cancel()
        return False


def kernel_marker(name: str) -> bool:
    return os.path.exists(os.path.join(_marker_dir(), f"qa_kernel_ok_{name}"))


def ensure_kernel_validation(wait_s: float = 0.0) -> bool:
    """If this host has no kernel-validation markers yet, start
    tools/validate_tpu_kernels.py detached in the background (never killed
    — see module docstring) and return. With ``wait_s`` > 0, poll up to
    that long for the baseline ``tpu`` marker. Returns True when the
    baseline marker exists on return."""
    if kernel_marker("tpu"):
        return True
    if os.environ.get("QA_NO_AUTOVALIDATE") == "1":
        return False
    tool = Path(__file__).resolve().parents[2] / "tools" / "validate_tpu_kernels.py"
    if not tool.exists():
        return False
    # single-flight across processes: the lock only means "a validation
    # run was launched within the last hour" — completion is signalled by
    # the markers themselves
    launch = False
    try:
        fd = os.open(_lock_path(), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        launch = True
    except FileExistsError:
        try:
            stale = os.path.getmtime(_lock_path()) < time.time() - 3600
        except OSError:                 # raced: someone removed it
            stale = False
        if stale:
            # stale lock from a dead run. Takeover must be atomic: a bare
            # unlink+O_EXCL lets a second late-arriving process unlink the
            # WINNER's fresh lock and both spawn TPU validators. rename()
            # is atomic on the same filesystem — exactly one of N racing
            # processes moves the stale lock aside; only that one
            # re-acquires with the fresh-path O_CREAT|O_EXCL primitive.
            claimed = _lock_path() + f".stale.{os.getpid()}"
            try:
                os.rename(_lock_path(), claimed)
            except OSError:             # lost the rename race
                pass
            else:
                try:
                    os.unlink(claimed)
                except OSError:
                    pass
                try:
                    fd = os.open(_lock_path(),
                                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.write(fd, str(os.getpid()).encode())
                    os.close(fd)
                    launch = True
                except (FileExistsError, OSError):
                    pass
    if launch:
        log = open("/tmp/qa_kernel_validate.log", "ab")
        subprocess.Popen(
            [sys.executable, "-u", str(tool)],
            stdout=log, stderr=subprocess.STDOUT,
            stdin=subprocess.DEVNULL, start_new_session=True)
        print("[hostcheck] kernel validation launched in background "
              "(log: /tmp/qa_kernel_validate.log); Pallas fast paths "
              "arm as markers appear", file=sys.stderr, flush=True)
    deadline = time.time() + wait_s
    while time.time() < deadline:
        if kernel_marker("tpu"):
            return True
        time.sleep(2.0)
    return kernel_marker("tpu")
