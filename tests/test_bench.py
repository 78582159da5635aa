"""bench.py smoke tests: every mode runs end-to-end on CPU with tiny knobs
and prints one well-formed JSON line.

The driver runs bench.py on the real chip at the end of every round; this
keeps code rot out of that path (the bench imports tower/loss/cascade modules
directly, so refactors there can silently break it).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

TINY_ENV = {
    "BENCH_PLATFORM": "cpu",
    "BENCH_IMAGE_SIZE": "64",
    "BENCH_BATCH": "8",
    "BENCH_ITERS": "2",
    "BENCH_WINDOWS": "1",
    "BENCH_TRAIN_STEPS": "4",
    "BENCH_TRAIN_BANK": "64",
    "BENCH_SEQ": "32",
    "BENCH_REF_LAYERS": "2",
    "BENCH_ROOFLINE_N": "256",
    "BENCH_ROOFLINE_ITERS": "2",
    "BENCH_ROOFLINE_WINDOWS": "1",
}


def _run(mode):
    env = dict(os.environ)
    env.update(TINY_ENV)
    env["BENCH_MODE"] = mode
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_encode_smoke():
    result = _run("encode")
    assert result["unit"] == "images/sec/chip"
    assert result["value"] > 0
    detail = result["detail"]
    for key in (
        "compute_only_img_per_sec", "h2d_only_img_per_sec", "flops_per_image_g",
        "matmul_roofline_tflops", "mfu_vs_matmul_roofline",
        "v5e_projected_img_per_sec", "bound",
    ):
        assert key in detail
    # no-floor contract: the projection must equal peak * min(mfu,1) / flops.
    # Both operands are re-derived from ROUNDED detail fields (mfu to 4dp,
    # flops_per_image_g to 3dp), so scale the tolerance to the rounding
    # granularity of the tiny smoke tower's small FLOP count.
    mfu = min(detail["mfu_vs_matmul_roofline"], 1.0)
    flops_g = detail["flops_per_image_g"]
    if flops_g > 0:
        expected = 197.0e12 * mfu / (flops_g * 1e9)
        rounding_rel = 0.5e-3 / flops_g + 0.5e-4 / max(mfu, 1e-6) + 0.01
        assert abs(detail["v5e_projected_img_per_sec"] - expected) / max(expected, 1) < rounding_rel


def test_bench_train_smoke():
    result = _run("train")
    assert result["unit"] == "samples/sec/chip"
    assert result["value"] > 0
    assert result["detail"]["with_bert_forward_samples_per_sec"] > 0


def test_bench_report_smoke():
    result = _run("report")
    assert result["unit"] == "ms"
    assert result["value"] > 0
    assert result["detail"]["stepwise_9_roundtrips_ms"] > 0
