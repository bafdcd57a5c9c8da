"""TPU-execution smoke tests (VERDICT r3 item 7).

Every other test pins JAX to the virtual CPU mesh, so Mosaic-compiled
numerics and VMEM/latency behavior are only exercised by hand-run scripts
between benches. This module gives the driver ONE command that catches TPU
regressions:

    ROVINA_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -m tpu -q

It runs the REAL workload — the trained fixture forest (depth ~23, ~10.7k
nodes/tree) at VGA through the full frame path, not ``entry()``'s light
compile-check model — plus one slope measurement per stage, and dumps the
stage timings to ``TPU_SMOKE.json`` at the repo root for between-bench
regression visibility.

Rules honored (ROADMAP.md "Benchmarking rules"): inputs perturbed per
iteration (execution memoization), results materialized to host
(block_until_ready returns early during remote compiles), persistent
compile cache enabled by the profile harness.
"""

import json
import os
import sys
import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "resources", "bench_forest.dat")

# One TPU client machine-wide: take the flock BEFORE jax.default_backend()
# initializes the backend (wedge hazard, ROADMAP.md).
if os.environ.get("ROVINA_TPU_TESTS") == "1":
    from rovinasemanticsegmentation_tpu.utils import tpu_lock

    if not tpu_lock.acquire():
        pytest.skip(
            "tpu_lock held past timeout; not contending for the chip",
            allow_module_level=True,
        )

on_tpu = (
    os.environ.get("ROVINA_TPU_TESTS") == "1"
    and jax.default_backend() == "tpu"
)
pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not on_tpu,
        reason="needs ROVINA_TPU_TESTS=1 and a live TPU backend",
    ),
    pytest.mark.skipif(
        not os.path.exists(FIXTURE), reason="trained fixture missing"
    ),
]

ARTIFACT = os.path.join(ROOT, "TPU_SMOKE.json")


def _write_artifact(update: dict) -> None:
    data = {}
    if os.path.exists(ARTIFACT):
        try:
            with open(ARTIFACT) as f:
                data = json.load(f)
        except Exception:
            data = {}
    data.update(update)
    data["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(ARTIFACT, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")


class TestTpuSmoke:
    def test_frame_path_trained_fixture_vga(self):
        """Full frame path (features -> descent -> posteriors -> labels)
        with the trained fixture at VGA: compiles, runs, and its wall time
        per keyframe is recorded. Catches VMEM/latency regressions the
        light ``entry()`` model cannot."""
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/jax_ccache"
        )
        from rovinasemanticsegmentation_tpu.features.extractor import (
            FeatureConfig,
        )
        from rovinasemanticsegmentation_tpu.models.forest import load_forest
        from rovinasemanticsegmentation_tpu.pipelines.single_frame import (
            SingleFramePipeline,
        )
        from rovinasemanticsegmentation_tpu.utils.calibration import (
            Calibration,
        )

        rng = np.random.default_rng(0)
        h, w = 480, 640
        forest = load_forest(FIXTURE, class_counts=[8, 9])
        pipeline = SingleFramePipeline(
            FeatureConfig(), forest, stride=2, fill_value=0.0
        )
        calib = Calibration(
            intrinsic=np.array(
                [[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]]
            ),
            rotation=np.eye(3),
            translation=np.zeros(3),
        )
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        depth = rng.integers(600, 14000, (h, w)).astype(np.uint16)

        # Warm (compile), then time a short loop with per-iter perturbation.
        res = pipeline.run(rgb, depth, calib)
        assert len(res.posteriors) == 2
        for p in res.posteriors:
            assert np.isfinite(np.asarray(p)).all()

        n_iters = 10
        t0 = time.perf_counter()
        for i in range(n_iters):
            r = pipeline.run(rgb ^ np.uint8(i + 1), depth + np.uint16(i), calib)
        # Materialize the last result (never trust block_until_ready alone).
        np.asarray(r.labels[0])
        ms_per_kf = (time.perf_counter() - t0) * 1000.0 / n_iters
        _write_artifact({"frame_path_ms_per_kf_unbatched": round(ms_per_kf, 2)})
        # Generous ceiling: this is a REGRESSION tripwire, not a bench.
        # (Round-3 state: ~27-29 ms/kf batched; single-frame dispatch adds
        # tunnel latency, so allow a wide margin before calling it broken.)
        assert ms_per_kf < 500.0, f"frame path {ms_per_kf:.1f} ms/kf"

    def test_stage_slopes(self):
        """One slope measurement per pipeline stage (trained fixture);
        timings dumped to TPU_SMOKE.json."""
        sys.path.insert(0, os.path.join(ROOT, "scripts"))
        import profile_slope

        results = profile_slope.main()
        assert results, "profile_slope returned no stage timings"
        for name, ms in results.items():
            assert np.isfinite(ms), f"stage {name} slope is not finite"
        _write_artifact(
            {"stage_ms": {k: round(v, 3) for k, v in results.items()}}
        )
