"""TPU wall time for the dense_inference demo (VERDICT r3 item 5).

The in-env compiled reference binary runs the 320x240x21 demo in
214-303 ms/image, best of 3, including PPM IO + lattice build
(/root/reference/third-party/densecrf/examples/dense_inference.cpp:86-101;
BASELINE.md round-3 row). This measures the TPU CLI
(cli/dense_inference.py) on the same three PPM pairs with the same span:
load -> unary -> CRF setup (incl. host lattice builds) -> mean field ->
colorize -> save.

Measures BOTH demo paths — host lattice build (models/crf.py) and the
fully-on-device build (models/crf2d_device.py) — verifies each against
the compiled-reference goldens, and records the faster one in
TUNING.json (``dense2d_device_build``, compiled measurements only).

Timing rules (ROADMAP.md): the runtime memoizes identical executions, so
each warm repeat recolors one annotation pixel (shape- and cost-identical
label work, different uploaded values) to force a real execution; rep 0
stays pristine for the golden-parity check.

Prints one JSON line with per-image best-of-3 warm wall times and the
cold (compile-included) first-run time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

# sitecustomize boots the axon TPU plugin before env vars are honored;
# re-pin so `JAX_PLATFORMS=cpu` control-flow dry-runs work offline.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ccache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rovinasemanticsegmentation_tpu.cli.dense_inference import run
from rovinasemanticsegmentation_tpu.utils.imageio import load_ppm

M = 21
EXAMPLES = "/root/reference/third-party/densecrf/examples"
GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "golden"
)


def one_pass(im_path, anno_path, out_path, rep, device_build):
    """The reference's full timed span: the CLI itself, load -> save.

    The axon runtime memoizes same-input executions (ROADMAP benchmarking
    rules), so warm reps must vary the dispatch inputs: rep > 0 runs
    against an annotation copy with one pixel recolored to another color
    already present in the image. The label work is shape- and
    cost-identical; only the uploaded label values differ. rep 0 is the
    pristine pass used for the golden-parity check.
    """
    if rep:
        anno = load_ppm(anno_path)
        flat = anno.reshape(-1, 3)
        donors = np.unique(flat[np.any(flat != 0, axis=1)], axis=0)
        flat[rep % 7] = donors[rep % len(donors)]
        anno_path = f"/tmp/dense_anno_rep{rep}.ppm"
        from rovinasemanticsegmentation_tpu.utils.imageio import save_ppm

        save_ppm(anno_path, anno)
    return run(im_path, anno_path, out_path, device_build=device_build)


def _measure_path(device_build, deadline_guard):
    """Best-of-3 warm per image for one path + golden parity of rep 0."""
    out, cold_ms, parity = {}, None, True
    for i in (1, 2, 3):
        if out and deadline_guard():
            print("TPUQ_DEADLINE_S reached; reporting measured images only",
                  file=sys.stderr)
            break
        im = f"{EXAMPLES}/im{i}.ppm"
        anno = f"{EXAMPLES}/anno{i}.ppm"
        dst = f"/tmp/dense_out{i}.ppm"
        t0 = time.perf_counter()
        one_pass(im, anno, dst, 0, device_build)
        first = (time.perf_counter() - t0) * 1000.0
        if cold_ms is None:
            cold_ms = first
        same = np.array_equal(
            load_ppm(dst), load_ppm(f"{GOLDEN}/out{i}_ref.ppm")
        )
        parity &= bool(same)
        best = 1e18
        for rep in range(1, 4):
            t0 = time.perf_counter()
            one_pass(im, anno, dst, rep, device_build)
            best = min(best, (time.perf_counter() - t0) * 1000.0)
        out[f"im{i}"] = round(best, 1)
        print(
            f"im{i} device_build={device_build}: warm best {best:.1f} ms "
            f"(first {first:.1f} ms, golden={'OK' if same else 'MISMATCH'})",
            file=sys.stderr,
        )
    return out, cold_ms, parity


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock, tuning

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU bench",
              file=sys.stderr)
        raise SystemExit(3)
    guard = lambda: tpu_lock.deadline_expired(margin_s=120)  # noqa: E731
    host_out, host_cold, host_par = _measure_path(False, guard)
    dev_out, dev_cold, dev_par = _measure_path(True, guard)

    candidates = {}
    if host_out and host_par:
        candidates[False] = max(host_out.values())
    if dev_out and dev_par:
        candidates[True] = max(dev_out.values())
    record = {
        "metric": "dense_inference_ms_per_image",
        "unit": "ms (best-of-3 warm, full span incl. IO + lattice build)",
        "per_image_host_build": host_out,
        "per_image_device_build": dev_out,
        "golden_parity": {"host": host_par, "device": dev_par},
        "cold_first_ms": {"host": host_cold, "device": dev_cold},
        "reference_ms": "214-303 (in-env C++ -O2, BASELINE.md)",
    }
    if candidates:
        winner = min(candidates, key=candidates.get)
        record["value"] = round(candidates[winner], 1)
        record["vs_baseline"] = round(candidates[winner] / 303.0, 3)
        record["device_build_wins"] = bool(winner)
        if len(candidates) == 2 and jax.default_backend() == "tpu":
            # Record only a compiled, golden-parity-verified winner.
            tuning.record(
                "dense2d_device_build", bool(winner),
                {"host_ms": candidates.get(False),
                 "device_ms": candidates.get(True),
                 "script": "bench_dense_inference.py"},
            )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
