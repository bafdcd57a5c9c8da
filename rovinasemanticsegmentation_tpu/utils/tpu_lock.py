"""Machine-wide one-TPU-process mutual exclusion + soft step deadlines.

The axon dev tunnel admits ONE TPU client at a time; a second client
contends invisibly, and killing a client mid-remote-compile wedges the
tunnel for hours (ROADMAP.md "Benchmarking rules"). Two independent
launchers exist — the unattended measurement queue (``scripts/tpu_queue.sh``)
and the driver's end-of-round ``bench.py`` — so every TPU-process entry
point acquires this flock before first touching the backend. Waiters BLOCK
(bounded) instead of overlapping; nothing is ever killed.

Soft deadlines: the queue exports ``TPUQ_DEADLINE_S`` per step. Harnesses
call :func:`deadline_expired` between epochs/steps/iterations and exit
cleanly (emitting whatever they have) instead of being SIGTERM'd — the
kill-free way to bound a step.

CPU-pinned runs (``JAX_PLATFORMS=cpu``) never touch the TPU, so they skip
the lock entirely and never block a real measurement.
"""

from __future__ import annotations

import fcntl
import os
import sys
import time

LOCK_PATH = os.environ.get("ROVINA_TPU_LOCK", "/tmp/tpuq/tpu.lock")

_lock_fd: int | None = None
_t0 = time.monotonic()  # process start ~= step start (imported early)
_deadline_s = float(os.environ.get("TPUQ_DEADLINE_S", 0) or 0)


def _cpu_pinned() -> bool:
    return os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"


def acquire(timeout_s: float = 7200.0, poll_s: float = 5.0) -> bool:
    """Take the exclusive TPU lock, waiting up to ``timeout_s``.

    Returns True once held (or immediately for CPU-pinned processes).
    Returns False if another TPU process held it for the whole timeout —
    callers should then SKIP their TPU work, never proceed unlocked.
    The lock is released by the kernel when the process exits, so a
    crashed holder can never leave it stuck.
    """
    global _lock_fd
    if _cpu_pinned() or _lock_fd is not None:
        return True
    os.makedirs(os.path.dirname(LOCK_PATH), exist_ok=True)
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o644)
    deadline = time.monotonic() + timeout_s
    announced = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            if time.monotonic() >= deadline:
                os.close(fd)
                return False
            if not announced:
                try:
                    with open(LOCK_PATH) as f:
                        holder = f.read().strip()
                except OSError:
                    holder = "?"
                print(
                    f"tpu_lock: waiting on {LOCK_PATH} (held by {holder})",
                    file=sys.stderr,
                )
                announced = True
            time.sleep(poll_s)
            continue
        try:
            os.ftruncate(fd, 0)
            os.write(
                fd,
                f"pid={os.getpid()} argv={' '.join(sys.argv[:4])}\n".encode(),
            )
        except OSError:
            pass
        _lock_fd = fd
        return True


def release() -> None:
    global _lock_fd
    if _lock_fd is not None:
        try:
            fcntl.flock(_lock_fd, fcntl.LOCK_UN)
            os.close(_lock_fd)
        except OSError:
            pass
        _lock_fd = None


def deadline_remaining() -> float | None:
    """Seconds left in this step's soft deadline, or None if unbounded."""
    if _deadline_s <= 0:
        return None
    return _deadline_s - (time.monotonic() - _t0)


def deadline_expired(margin_s: float = 0.0) -> bool:
    """True when the step should wrap up (soft TPUQ_DEADLINE_S reached).

    ``margin_s`` reserves time for the caller's wrap-up work (e.g. one
    more epoch it knows the cost of, or result serialization).
    """
    rem = deadline_remaining()
    return rem is not None and rem <= margin_s
