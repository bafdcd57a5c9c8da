"""TPU mutual-exclusion lock + soft-deadline tests (VERDICT r4 item 2).

The unattended measurement queue and the driver's end-of-round bench.py
must never run two TPU clients at once (the axon tunnel wedges; see
ROADMAP.md). These tests pin the flock semantics: waiters block instead
of overlapping, a dead holder releases the lock, CPU-pinned processes
skip it, and TPUQ_DEADLINE_S becomes a soft in-process deadline.
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HOLD_AND_REPORT = """
import os, sys, time
sys.path.insert(0, {root!r})
os.environ.pop("JAX_PLATFORMS", None)
from rovinasemanticsegmentation_tpu.utils import tpu_lock
tpu_lock.LOCK_PATH = {lock!r}
ok = tpu_lock.acquire(timeout_s={timeout}, poll_s=0.05)
print("acquired" if ok else "timeout", flush=True)
if ok:
    time.sleep({hold})
"""


def _spawn(lock, timeout, hold):
    return subprocess.Popen(
        [sys.executable, "-c",
         HOLD_AND_REPORT.format(root=ROOT, lock=lock, timeout=timeout,
                                hold=hold)],
        stdout=subprocess.PIPE, text=True,
    )


def test_second_client_waits_until_holder_exits(tmp_path):
    lock = str(tmp_path / "tpu.lock")
    holder = _spawn(lock, timeout=10, hold=1.5)
    assert holder.stdout.readline().strip() == "acquired"
    t0 = time.monotonic()
    waiter = _spawn(lock, timeout=30, hold=0)
    assert waiter.stdout.readline().strip() == "acquired"
    waited = time.monotonic() - t0
    # The waiter could not get the lock until the holder exited (~1.5 s in).
    assert waited > 0.5, f"waiter overlapped the holder (waited {waited:.2f}s)"
    holder.wait(timeout=10)
    waiter.wait(timeout=10)


def test_timeout_returns_false_never_proceeds(tmp_path):
    lock = str(tmp_path / "tpu.lock")
    # Hold far longer than the waiter's interpreter startup: under a loaded
    # machine (full suite + a real TPU job) the waiter subprocess can take
    # >5 s just to import the package, and a holder that exits first turns
    # the expected "timeout" into a flaky "acquired". The holder is
    # terminated explicitly the moment the waiter reports.
    holder = _spawn(lock, timeout=10, hold=60.0)
    assert holder.stdout.readline().strip() == "acquired"
    waiter = _spawn(lock, timeout=0.3, hold=0)
    assert waiter.stdout.readline().strip() == "timeout"
    holder.terminate()
    holder.wait(timeout=10)
    waiter.wait(timeout=10)


def test_cpu_pinned_process_skips_lock(tmp_path, monkeypatch):
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(tpu_lock, "LOCK_PATH", str(tmp_path / "l"))
    assert tpu_lock.acquire(timeout_s=0.01)
    assert not os.path.exists(tmp_path / "l")  # never even created


def test_deadline_from_env():
    code = """
import os, sys, time
sys.path.insert(0, %r)
os.environ["TPUQ_DEADLINE_S"] = "0.2"
from rovinasemanticsegmentation_tpu.utils import tpu_lock
assert not tpu_lock.deadline_expired()
rem = tpu_lock.deadline_remaining()
assert rem is not None and 0 < rem <= 0.2, rem
assert tpu_lock.deadline_expired(margin_s=1.0)  # margin larger than budget
time.sleep(0.25)
assert tpu_lock.deadline_expired()
print("ok")
""" % ROOT
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"


def test_no_deadline_means_unbounded():
    code = """
import os, sys
sys.path.insert(0, %r)
os.environ.pop("TPUQ_DEADLINE_S", None)
from rovinasemanticsegmentation_tpu.utils import tpu_lock
assert tpu_lock.deadline_remaining() is None
assert not tpu_lock.deadline_expired(margin_s=1e9)
print("ok")
""" % ROOT
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=30)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"
