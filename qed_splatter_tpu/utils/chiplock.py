"""Single-client guard for the (tunneled) TPU chip.

Round-3 finding (RESULTS.md): two processes must never share the tunneled
chip — a worker crash in one hangs the other's in-flight dispatch without
an exception (the resumed 30k run stalled silently when a concurrently
launched bench crashed the worker). That rule was a convention in prose;
this makes it code: every entry point that dispatches to an accelerator
takes an exclusive ``flock`` on a well-known lock file first and holds it
for the process lifetime. ``flock`` is released by the kernel when the
holder exits or dies, so stale locks are impossible (only the advisory
PID/purpose *contents* can go stale, never the lock itself).

CPU-only runs (unit tests, the virtual multi-chip dryrun) never lock.
"""

from __future__ import annotations

import os
from typing import Optional, TextIO

_LOCK: Optional[TextIO] = None  # held for process lifetime


class ChipBusy(RuntimeError):
    """Another live process holds the accelerator lock."""


def _lock_path() -> str:
    return os.environ.get("QED_CHIP_LOCK", "/tmp/qed_tpu.lock")


def accelerator_present() -> bool:
    """True when JAX's default backend is a real accelerator (not CPU)."""
    import jax

    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def acquire_chip_lock(purpose: str, required: bool = True) -> bool:
    """Take the exclusive accelerator lock (no-op on CPU backends).

    Returns True when the lock is held (or not needed). When another live
    process holds it: raises ``ChipBusy`` if ``required``, else returns
    False. Reentrant within a process.
    """
    global _LOCK
    if _LOCK is not None:
        return True
    if not accelerator_present():
        return True
    import fcntl

    fh = open(_lock_path(), "a+")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        fh.seek(0)
        holder = fh.read().strip() or "unknown process"
        fh.close()
        msg = (
            f"accelerator is held by {holder} (lock {_lock_path()}); a "
            "second client sharing the tunneled chip hangs silently on the "
            "first worker crash — run sequentially or stop the holder"
        )
        if required:
            raise ChipBusy(msg)
        print(f"WARNING: {msg}")
        return False
    fh.seek(0)
    fh.truncate()
    fh.write(f"pid {os.getpid()} ({purpose})\n")
    fh.flush()
    _LOCK = fh  # keep the fd (and therefore the flock) alive
    return True


def release_chip_lock() -> None:
    """Explicit release (tests); normal exit releases via the kernel."""
    global _LOCK
    if _LOCK is not None:
        _LOCK.close()
        _LOCK = None
