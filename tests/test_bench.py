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
    "BENCH_SERVE_TINY": "1",
    "BENCH_SERVE_CLIENTS": "4",
    "BENCH_SERVE_REQS": "4",
    "BENCH_TINY": "1",
    "BENCH_NATIVE_SIZE": "96x80",
    "BENCH_CANVAS": "32",
}


def _run(mode, extra_env=None):
    env = dict(os.environ)
    env.update(TINY_ENV)
    env["BENCH_MODE"] = mode
    env.update(extra_env or {})
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
        "compute_only_img_per_sec", "h2d_true_img_per_sec",
        "h2d_pipeline_img_per_sec", "h2d_method",
        "flops_per_image_g", "analytic_flops_per_image_g",
        "matmul_roofline_tflops", "mfu_vs_matmul_roofline",
        "bound", "binding_img_per_sec", "overlap_efficiency",
        "int8_compute_only_img_per_sec", "int8_max_feature_rel_err",
        "int8_min_feature_cosine",
        "fused_compute_only_img_per_sec", "fused_max_feature_rel_err",
        "fused_tanh_compute_only_img_per_sec", "e2e_tower",
        "v5e_fused_tanh_projected_img_per_sec",
        "headline_compute_only_img_per_sec",
        "v5e_sol_img_per_sec", "v5e_projected_img_per_sec",
        "v5e_int8_projected_img_per_sec", "v5e_per_stage",
        "v5e_fused_projected_img_per_sec", "v5e_fused_int8_projected_img_per_sec",
        "v5e_fused_per_stage", "pass_medians_img_per_sec",
    ):
        assert key in detail
    # headline = MEDIAN double-buffered window (not the flattering tail)
    assert result["value"] == detail["median_img_per_sec"]
    assert result["value"] <= detail["best_window_img_per_sec"] + 1e-6
    # arithmetically consistent bound claim (VERDICT r2 weak #1): the
    # claimed binding resource is really min(compute, h2d_true) — with
    # compute priced at the HEADLINE tower (fused when it lowered, which
    # is what the e2e loop ran) — and overlap_efficiency re-derives from
    # the rounded fields
    headline_compute = detail["headline_compute_only_img_per_sec"]
    assert detail["e2e_tower"] in ("fused", "unfused")
    if detail["e2e_tower"] == "unfused":
        assert headline_compute == detail["compute_only_img_per_sec"]
    assert detail["binding_img_per_sec"] == pytest.approx(
        max(
            min(headline_compute, detail["h2d_pipeline_img_per_sec"]),
            detail["median_img_per_sec"],  # noise-slow ceilings floor at achieved
        ),
        rel=0.02,  # detail rates round to 0.1 img/s
    )
    assert detail["overlap_efficiency"] == pytest.approx(
        detail["median_img_per_sec"] / detail["binding_img_per_sec"],
        abs=0.02,  # re-derived from 0.1-rounded rates
    )
    assert detail["overlap_efficiency"] <= 1.0001
    expected_bound = "h2d" if (
        detail["h2d_pipeline_img_per_sec"] < headline_compute
    ) else "compute"
    assert detail["bound"] == expected_bound
    # the pipeline ceiling includes dispatch overhead: never above link rate
    assert detail["h2d_pipeline_img_per_sec"] <= detail["h2d_true_img_per_sec"] * 1.001
    # MFU is floored against the achieved rate — can never exceed 1
    assert detail["mfu_vs_matmul_roofline"] <= 1.0001
    # consistency: the pipelined loop cannot beat its claimed binding rate
    assert detail["median_img_per_sec"] <= detail["binding_img_per_sec"] * 1.001
    # per-layer projection sanity: derated <= speed-of-light; int8 raises
    # the matmul ceiling so its SoL cannot be below bf16's
    assert detail["v5e_projected_img_per_sec"] <= detail["v5e_sol_img_per_sec"]
    for group in detail["v5e_per_stage"].values():
        assert group["bound"] in ("mxu", "vpu", "hbm")
    assert detail["v5e_int8_sol_img_per_sec"] >= detail["v5e_sol_img_per_sec"]
    assert 0 <= detail["int8_max_feature_rel_err"] < 1.0
    assert detail["int8_min_feature_cosine"] > 0.9
    assert set(detail["v5e_per_stage"]) >= {"stem", "stage0", "stage3", "down1"}
    # fused-block projection: removing the per-block HBM round trips can
    # only raise the speed-of-light; the CPU run's fused path (lax
    # fallback) must still agree with the unfused tower
    assert detail["v5e_fused_sol_img_per_sec"] >= detail["v5e_sol_img_per_sec"]
    assert detail["v5e_fused_projected_img_per_sec"] <= detail["v5e_fused_sol_img_per_sec"]
    assert detail["fused_max_feature_rel_err"] < 0.05
    assert set(detail["v5e_fused_per_stage"]) >= {"stem", "stage0", "stage3"}
    # the cross-run headline is the median of the pass medians
    import numpy as np

    assert result["value"] == pytest.approx(
        float(np.median(detail["pass_medians_img_per_sec"])), rel=0.01
    )


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


def test_bench_text_smoke():
    result = _run("text")
    assert result["unit"] == "texts/sec/chip"
    assert result["value"] > 0
    detail = result["detail"]
    for key in (
        "flash_prompts", "xla_prompts", "flash_full", "xla_full",
        "flash_trimmed", "xla_trimmed",
        "flash_speedup_prompts", "flash_speedup_full",
        "trim_speedup_vs_padded", "trimmed_seq",
        "prompt_len_min", "prompt_len_median", "prompt_len_max",
    ):
        assert key in detail
    # real prompt-bank sentences: short, well under the padded sequence
    assert 2 <= detail["prompt_len_min"] <= detail["prompt_len_max"]
    assert detail["prompt_len_max"] <= detail["seq"]
    # the trim bucket covers the longest prompt and stays a 32-multiple
    assert detail["prompt_len_max"] <= detail["trimmed_seq"] <= detail["seq"]
    assert detail["trimmed_seq"] % 32 == 0
    assert result["value"] == max(detail["flash_trimmed"], detail["xla_trimmed"])


def test_bench_serve_smoke():
    result = _run("serve")
    assert result["unit"] == "requests/sec"
    assert result["value"] > 0
    detail = result["detail"]
    for key in (
        "concurrent_req_per_sec", "sequential_req_per_sec",
        "microbatch_speedup", "sequential_p50_ms", "sequential_p95_ms",
        "concurrent_p50_ms", "concurrent_p95_ms", "report_p50_ms",
    ):
        assert key in detail and detail[key] > 0
    assert detail["tiny"] is True  # the smoke env requested tiny towers
    assert detail["sequential_p50_ms"] <= detail["sequential_p95_ms"]
    assert result["vs_baseline"] == detail["microbatch_speedup"]


def test_fused_projection_prices_banded_kernel_at_native_res():
    """The fused cost model must price the kernel the gate actually picks:
    whole-image (1 read of x) at 256, row-banded (~3 reads) at native-res
    512 where the whole-image working set exceeds VMEM."""
    import bench

    def stage0_mm_bytes(size):
        rows = bench._convnext_layer_costs(size, batch=128, fused=True)
        (row,) = [r for r in rows if r[0] == "stage0_fused_mm"]
        return row[3]

    hw256, hw512 = (256 // 4) ** 2, (512 // 4) ** 2
    c, dt, depth = 96, 2, 3
    wamort = ((49 * c + 7 * c) * dt + 8 * c * c * dt) // 128 * depth
    # 256: whole-image kernel -> 1 read + 1 write of x
    assert stage0_mm_bytes(256) == 2 * hw256 * c * dt * depth + wamort
    # 512: banded kernel -> 3 reads + 1 write of x
    assert stage0_mm_bytes(512) == 4 * hw512 * c * dt * depth + wamort


def test_bench_ingest_smoke():
    result = _run("ingest")
    assert result["unit"] == "images/sec/chip"
    assert result["value"] > 0
    assert result["vs_baseline"] == pytest.approx(
        result["value"] / 5000.0, abs=1e-4)  # vs_baseline rounds to 4 places
    detail = result["detail"]
    for key in ("chain_compute_img_per_sec", "resize_only_img_per_sec",
                "flops_per_image_g", "native_bytes_per_image_mb",
                "resample", "v5e_projection", "fidelity_note"):
        assert key in detail
    assert detail["tiny"] is True
    proj = detail["v5e_projection"]
    for key in ("compute_img_per_sec", "tower_term_img_per_sec",
                "pcie_ceiling_img_per_sec", "e2e_img_per_sec",
                "bound", "meets_north_star", "basis"):
        assert key in proj
    # the e2e projection is min(compute, pcie) by construction
    assert proj["e2e_img_per_sec"] == pytest.approx(
        min(proj["compute_img_per_sec"], proj["pcie_ceiling_img_per_sec"]))
    assert proj["bound"] in ("pcie", "compute")
    # resize cannot be slower than the full chain through the tower
    assert detail["resize_only_img_per_sec"] >= detail["chain_compute_img_per_sec"] * 0.5
    rs = detail["resample"]
    assert rs["method"] == "area" and len(rs["valid_hw"]) == 2


def test_parse_hw_and_rect_cost_model():
    """BENCH_IMAGE_SIZE accepts HxW; the cost model handles rectangles and
    odd (ceil-padded) sizes without dropping rows."""
    import bench

    assert bench._parse_hw("256") == (256, 256)
    assert bench._parse_hw("2294x1914") == (2294, 1914)
    assert bench._parse_hw((64, 48)) == (64, 48)
    assert bench._parse_hw(None, default=128) == (128, 128)

    sq = bench._convnext_layer_costs(256, batch=128)
    rect = bench._convnext_layer_costs((256, 128), batch=128)
    assert len(sq) == len(rect)
    # a half-width image halves every spatial term (flops monotonicity)
    total = lambda rows: sum(mf + vf for _n, mf, vf, _b, _q in rows)  # noqa: E731
    assert total(rect) < total(sq)
    # odd native shape survives the ceil chain (573 -> 287 -> 144 -> 72)
    bench._convnext_layer_costs((2294, 1914), batch=16)


def test_per_stage_time_frac_sums_to_one():
    """The glue itemization (VERDICT r4 next #8): per-group time_frac over
    speed-of-light time must account for ~the whole projected image."""
    import bench

    _sol, _der, summary = bench._v5e_per_layer_projection(
        256, 0.86, fused=True, batch=128, gelu_flops=8)
    fracs = {g: v["time_frac"] for g, v in summary.items()}
    assert all(0 <= f <= 1 for f in fracs.values())
    assert sum(fracs.values()) == pytest.approx(1.0, abs=0.02)
    # the fused blocks dominate; the unfused glue share is the stated gap
    glue = sum(f for g, f in fracs.items() if g.startswith(("stem", "down")))
    assert 0 < glue < 0.5

def test_bench_ingest_prepool_smoke():
    """BENCH_HOST_PREPOOL: block sums cross the link — bytes/image shrink
    ~k^2/2 for uint8 sources and the pricing reflects the block grid."""
    plain = _run("ingest")
    pre = _run("ingest", {"BENCH_HOST_PREPOOL": "4"})
    assert pre["detail"]["resample"]["host_prepool"] == 4
    ratio = (plain["detail"]["native_bytes_per_image_mb"]
             / pre["detail"]["native_bytes_per_image_mb"])
    assert 7.0 < ratio <= 8.0  # 2 bytes per 16 px vs 1 byte per px (+ceil)
    assert (pre["detail"]["v5e_projection"]["pcie_ceiling_img_per_sec"]
            > plain["detail"]["v5e_projection"]["pcie_ceiling_img_per_sec"])
    assert pre["value"] > 0
