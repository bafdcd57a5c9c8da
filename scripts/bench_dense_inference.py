"""TPU wall time for the dense_inference demo (VERDICT r3 item 5).

The in-env compiled reference binary runs the 320x240x21 demo in
214-303 ms/image, best of 3, including PPM IO + lattice build
(/root/reference/third-party/densecrf/examples/dense_inference.cpp:86-101;
BASELINE.md round-3 row). This measures the TPU CLI
(cli/dense_inference.py) on the same three PPM pairs with the same span:
load -> unary -> CRF setup (incl. host lattice builds) -> mean field ->
colorize -> save.

Timing rules (ROADMAP.md): the runtime memoizes identical executions, so
each timed repeat perturbs the unary by a numerically irrelevant epsilon
(one pixel, 1e-5 * rep — far below the energy scale) to force a real
execution; results are materialized via np.asarray inside crf.map.

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

from rovinasemanticsegmentation_tpu.cli.dense_inference import (
    colorize,
    unary_from_annotation,
)
from rovinasemanticsegmentation_tpu.models.crf import (
    DenseCRF2D,
    PottsCompatibility,
)
from rovinasemanticsegmentation_tpu.utils.imageio import load_ppm, save_ppm

M = 21
EXAMPLES = "/root/reference/third-party/densecrf/examples"


def one_pass(im_path, anno_path, out_path, eps):
    """The reference's full timed span, with an epsilon unary perturbation."""
    im = load_ppm(im_path)
    anno = load_ppm(anno_path)
    h, w = im.shape[:2]
    unary, _ = unary_from_annotation(anno)
    unary = unary.copy()
    unary[0, 0] += eps  # defeat execution memoization, not the math
    crf = DenseCRF2D(w, h, M)
    crf.set_unary_energy(unary)
    crf.add_pairwise_gaussian(3, 3, PottsCompatibility(3))
    crf.add_pairwise_bilateral(80, 80, 13, 13, 13, im, PottsCompatibility(10))
    map_labels = crf.map(5)  # dense_inference.cpp:97 (5 iterations)
    result = colorize(map_labels, anno).reshape(h, w, 3)
    save_ppm(out_path, result)
    return map_labels


def main():
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        print("tpu_lock: held past timeout; skipping TPU bench",
              file=sys.stderr)
        raise SystemExit(3)
    out = {}
    cold_ms = None
    for i in (1, 2, 3):
        if out and tpu_lock.deadline_expired(margin_s=120):
            print("TPUQ_DEADLINE_S reached; reporting measured images only",
                  file=sys.stderr)
            break
        im = f"{EXAMPLES}/im{i}.ppm"
        anno = f"{EXAMPLES}/anno{i}.ppm"
        dst = f"/tmp/dense_out{i}.ppm"
        t0 = time.perf_counter()
        one_pass(im, anno, dst, 0.0)
        first = (time.perf_counter() - t0) * 1000.0
        if cold_ms is None:
            cold_ms = first
        best = 1e18
        for rep in range(1, 4):
            t0 = time.perf_counter()
            one_pass(im, anno, dst, rep * 1e-5)
            best = min(best, (time.perf_counter() - t0) * 1000.0)
        out[f"im{i}"] = round(best, 1)
        print(f"im{i}: warm best {best:.1f} ms (first {first:.1f} ms)",
              file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "dense_inference_ms_per_image",
                "value": round(max(out.values()), 1),
                "unit": "ms (best-of-3 warm, full span incl. IO + lattice build)",
                "vs_baseline": round(max(out.values()) / 303.0, 3),
                "per_image": out,
                "cold_first_ms": round(cold_ms, 1),
                "reference_ms": "214-303 (in-env C++ -O2, BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
