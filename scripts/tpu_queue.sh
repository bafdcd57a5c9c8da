#!/bin/bash
# Waits for the TPU tunnel to recover, then runs the round-5 measurement
# plan sequentially (one TPU process at a time), logging to /tmp/tpuq.
# Steps exit on their own (fixed epoch/iteration counts) and honor the
# soft TPUQ_DEADLINE_S via tpu_lock.deadline_expired between iterations;
# there is NO hard timeout around them: SIGTERM/SIGKILLing a TPU client
# whose remote compile is in flight wedges the tunnel for hours (see
# ROADMAP.md). Every step additionally takes the machine-wide flock
# (rovinasemanticsegmentation_tpu/utils/tpu_lock.py), so this queue and
# the driver's end-of-round bench.py can never run two TPU clients at
# once — late-comers wait, nothing overlaps.
#
# `touch /tmp/tpuq/STOP` makes the queue exit before starting the next
# step.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpuq

probe() {
    # The probe client runs UNDER the machine-wide lock, not after a
    # separate check: a check-then-probe gap would let the driver's
    # end-of-round bench.py start mid-probe and run alongside it (a
    # second client contends invisibly and perturbs the measurement).
    # -w 60 bounds the wait — if another TPU client holds the lock for
    # longer, report "not ready" and re-check after the sleep; once the
    # lock frees, the real probe runs and the plan's own steps take the
    # same lock through tpu_lock.acquire. Killing the probe on its
    # 360 s timeout is safe: a stateless jax.devices() init hang is the
    # documented kill-safe case (unlike a client mid-remote-compile).
    flock -w 60 /tmp/tpuq/tpu.lock \
        timeout 360 python -c "import jax; print(jax.devices())" \
        >/tmp/tpuq/probe.log 2>&1
}

echo "$(date) waiting for TPU..." >> /tmp/tpuq/queue.log
until probe; do
    [ -f /tmp/tpuq/STOP ] && { echo "$(date) STOP requested" >> /tmp/tpuq/queue.log; exit 0; }
    echo "$(date) still down" >> /tmp/tpuq/queue.log
    sleep 240
done
echo "$(date) TPU UP: $(tail -1 /tmp/tpuq/probe.log)" >> /tmp/tpuq/queue.log

run() {
    name=$1; ddl=$2; shift 2
    [ -f /tmp/tpuq/STOP ] && { echo "$(date) STOP requested before $name" >> /tmp/tpuq/queue.log; exit 0; }
    echo "$(date) START $name" >> /tmp/tpuq/queue.log
    TPUQ_DEADLINE_S="$ddl" "$@" > "/tmp/tpuq/$name.log" 2>&1
    echo "$(date) END $name rc=$?" >> /tmp/tpuq/queue.log
}

# Round-5 plan (VERDICT r4 "Next round" items 1,3,4,5). The official
# capture runs FIRST: if the tunnel dies again mid-plan, a fresh number
# is already in BENCH_LKG.json (now with captured_at provenance).
run bench 5400 python bench.py
# Item 5: per-stage winners -> TUNING.json, then tuned re-capture.
run exp_descent 5400 python scripts/exp_descent.py bench
run exp_patches 3600 python scripts/exp_patches.py bench
run profile_normals 3600 python scripts/profile_normals.py
# Item 3: fused-forest training vs the in-env C++ 12.8 s.
run bench_train 3600 python scripts/bench_train.py 100000 2
# Item 4: dense_inference wall time vs the in-env C++ 214-303 ms.
run dense_inf 1800 python scripts/bench_dense_inference.py
# Compiled-numerics validation of every Pallas kernel + stage table.
run tpu_smoke 3600 env ROVINA_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -m tpu -q
run slope_b5 3600 env BATCH=5 python scripts/profile_slope.py
# Re-capture with every experiment's recorded winner applied (TUNING.json):
run bench_tuned 5400 python bench.py
# Leaf-gather lead scout (informs only, records nothing):
run exp_hist 1800 python scripts/exp_hist.py bench
echo "$(date) ALL DONE" >> /tmp/tpuq/queue.log
