"""Accelerator-wedge watchdog (core/watchdog.py) — the SURVEY §5
failure-detection primitive for the tunneled-TPU runtime."""

import threading
import time

from adipose_tpu.core import watchdog


class TestWatchdog:
    def test_arm_disarm_no_bail(self):
        """A disarmed watchdog must never fire (firing would os._exit the
        pytest process — this test existing at all pins that)."""
        watchdog.arm(0.2, message="test")
        watchdog.disarm()
        time.sleep(0.4)

    def test_rearm_replaces_timer(self):
        watchdog.arm(0.2, message="first")
        watchdog.arm(60.0, message="second")  # replaces the 0.2 s timer
        time.sleep(0.4)  # outlives the first timer: it must not fire
        watchdog.disarm()

    def test_on_bail_callback_runs_in_subprocess(self):
        """Full bail path (callback + hard exit) — in a subprocess, since
        bailing kills the interpreter by design."""
        import subprocess
        import sys

        code = (
            "from adipose_tpu.core import watchdog\n"
            "import time\n"
            "watchdog.arm(0.1, message='boom', exit_code=7,"
            " on_bail=lambda: print('BAILED', flush=True))\n"
            "time.sleep(30)\n"
        )
        out = subprocess.run([sys.executable, "-c", code], timeout=60,
                             capture_output=True, text=True)
        assert out.returncode == 7
        assert "BAILED" in out.stdout
        assert "boom" in out.stderr

    def test_probe_device_cpu(self):
        assert watchdog.probe_device(timeout_s=120, platform="cpu")

    def test_timer_is_daemon(self):
        """An armed watchdog must not keep the interpreter alive."""
        watchdog.arm(3600, message="long")
        t = [th for th in threading.enumerate() if isinstance(th, threading.Timer)]
        assert t and all(th.daemon for th in t)
        watchdog.disarm()
