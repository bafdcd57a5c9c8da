#!/bin/bash
# Waits for the TPU tunnel to recover, then runs the round-3 measurement
# plan sequentially (one TPU process at a time), logging to /tmp/tpuq.
# Generous per-step timeouts; steps exit cleanly rather than being killed
# mid-compile (see ROADMAP.md: killing a client mid-remote-compile wedges
# the terminal).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpuq

probe() {
    timeout 360 python -c "import jax; print(jax.devices())" >/tmp/tpuq/probe.log 2>&1
}

echo "$(date) waiting for TPU..." >> /tmp/tpuq/queue.log
until probe; do
    echo "$(date) still down" >> /tmp/tpuq/queue.log
    sleep 240
done
echo "$(date) TPU UP: $(cat /tmp/tpuq/probe.log | tail -1)" >> /tmp/tpuq/queue.log

# NO hard `timeout` around the steps: SIGTERM/SIGKILLing a TPU client
# whose remote compile is in flight wedges the tunnel for hours (see
# ROADMAP.md). Each step bounds its own work (fixed epoch/iteration
# counts) and honors TPUQ_DEADLINE_S cooperatively where supported; a
# stuck step is left to finish or be dealt with by hand.
run() {
    name=$1; ddl=$2; shift 2
    echo "$(date) START $name" >> /tmp/tpuq/queue.log
    TPUQ_DEADLINE_S="$ddl" "$@" > "/tmp/tpuq/$name.log" 2>&1
    echo "$(date) END $name rc=$?" >> /tmp/tpuq/queue.log
}

# Round-4 plan (VERDICT r3 "Next round" items, in leverage order):
run exp_descent 5400 python scripts/exp_descent.py bench
run bench 5400 python bench.py
run bench_transpose 5400 env ROVINA_DESCENT_TRANSPOSE=1 python bench.py
run bench_train 3600 python scripts/bench_train.py 100000 2
run dense_inf 1800 python scripts/bench_dense_inference.py
run tpu_smoke 3600 env ROVINA_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -m tpu -q
run slope_b5 3600 env BATCH=5 python scripts/profile_slope.py
echo "$(date) ALL DONE" >> /tmp/tpuq/queue.log
