"""Accelerator-wedge watchdog — the failure-detection primitive for scripts
that talk to the tunneled TPU.

Failure mode (observed r2/r4, CLAUDE.md): the tunnel / remote-compile
service can wedge so hard that EVERY device call — including
``jax.devices()`` itself — blocks forever inside a C extension call.
Signal handlers never run (the GIL-holding thread is in C), so
``signal.alarm`` / KeyboardInterrupt are useless; an unattended script
hangs until killed from outside. The two reliable tools, extracted here
from ``bench.py`` (which carried them inline since r2):

* :func:`arm` — a daemon ``threading.Timer`` that ``os._exit``\\ s the
  process with an honest message if not re-armed/disarmed in time. Timer
  threads still run while the main thread is stuck in C, and ``os._exit``
  skips atexit/finalizers that could themselves hang.
* :func:`probe_device` — liveness check that runs a trivial device op in a
  SUBPROCESS with a hard timeout. In-process probing is impossible (a
  wedged call can't be cancelled), so a throwaway interpreter is the only
  bounded way to ask "is the accelerator answering right now?".

The reference has no analog (single-host CUDA, no tunnel); this implements
the failure-detection duty of SURVEY.md §5 for the axon runtime.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading

_TIMER: threading.Timer | None = None
_LOCK = threading.Lock()


def arm(seconds: float, message: str = "accelerator unresponsive",
        exit_code: int = 2, on_bail=None) -> None:
    """(Re-)arm the watchdog: unless :func:`arm` or :func:`disarm` is called
    again within ``seconds``, print ``message`` to stderr and hard-exit.

    Call it phase-aware, like bench.py: a generous budget across warmup /
    first compile (remote compiles measured 1 s – 5 min by tunnel day), then
    re-arm with a tight one per measured iteration. ``on_bail`` (optional
    zero-arg callable) runs first — e.g. to emit a JSON error line for a
    driver; exceptions in it are swallowed so the exit still happens.
    """
    def bail():
        try:
            try:
                if on_bail is not None:
                    on_bail()
            except Exception:  # noqa: BLE001 — on_bail must not mute the diagnostic
                pass
            print(f"[watchdog] {message} within {seconds:.0f}s — exiting",
                  file=sys.stderr, flush=True)
        finally:
            os._exit(exit_code)

    global _TIMER
    with _LOCK:
        if _TIMER is not None:
            _TIMER.cancel()
        _TIMER = threading.Timer(seconds, bail)
        _TIMER.daemon = True
        _TIMER.start()


def disarm() -> None:
    """Cancel the armed watchdog (work finished)."""
    global _TIMER
    with _LOCK:
        if _TIMER is not None:
            _TIMER.cancel()
            _TIMER = None


def probe_device(timeout_s: float = 60.0, platform: str | None = None) -> bool:
    """True iff a trivial jax device op completes within ``timeout_s``.

    Runs in a fresh subprocess (inheriting the environment, so the same
    backend selection applies) because a wedged in-process device call can
    never be cancelled. Use before committing to long unattended TPU work::

        if not watchdog.probe_device(60):
            sys.exit("TPU tunnel wedged; not starting")
    """
    env = dict(os.environ)
    pre = ""
    if platform is not None:
        # the env's sitecustomize forces jax_platforms back to "axon,cpu" at
        # interpreter start, so the env var alone cannot steer the backend
        # (CLAUDE.md); override via config BEFORE backend init, like
        # tests/conftest.py
        env["JAX_PLATFORMS"] = platform
        pre = (f"import jax; "
               f"jax.config.update('jax_platforms', {platform!r}); ")
    code = (f"{pre}import jax, jax.numpy as jnp; "
            "print(float(jnp.sum(jnp.ones((8, 8)))))")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        return False
    return out.returncode == 0 and b"64.0" in out.stdout
