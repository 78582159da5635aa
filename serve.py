"""Inference server: JSONL request/response over stdin/stdout.

Loads a trained experiment once and serves encode / classify / report
requests with everything (towers, prompt banks, jitted programs) warm.
New capability relative to the reference, which had no serving path.

Protocol (one JSON object per line):
  {"op": "encode",   "paths": ["/path/a.png", ...]}
  {"op": "classify", "paths": [...] | "features": [[...]], "class_list": [...]}
  {"op": "report",   "paths": [...] | "exam_dir": "/path/st02", "seed": 42}
  {"op": "ping"}

Responses mirror the request id (if given) and carry "result" or "error".

Usage:
  python serve.py --experiment_path yyyy-mm-dd/XX-XX-XX [--once '<json>']
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from mmgclip_tpu.serving import InferenceEngine
from mmgclip_tpu.utils.logging import logger


def handle(engine: InferenceEngine, request: dict) -> dict:
    op = request.get("op")
    if op == "ping":
        return {"ok": True}
    if op == "encode":
        feats = engine.encode_paths(request["paths"])
        return {"features": feats.tolist()}
    if op == "classify":
        if "features" in request:
            feats = np.asarray(request["features"], np.float32)
        else:
            feats = engine.encode_paths(request["paths"])
        return engine.classify(feats, request["class_list"])
    if op == "report":
        if "exam_dir" in request:
            feats = engine.encode_exam(request["exam_dir"])
        elif "features" in request:
            feats = np.asarray(request["features"], np.float32)
        else:
            feats = engine.encode_paths(request["paths"])
        reports = engine.generate_reports(
            feats,
            seed=int(request.get("seed", 42)),
            bug_compat=bool(request.get("bug_compat", True)),
        )
        return {"reports": reports}
    raise ValueError(f"Unknown op {op!r}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_path", type=str, required=True,
                        help="Run folder inside outputs/ ('yyyy-mm-dd/XX-XX-XX').")
    parser.add_argument("--once", type=str, default=None,
                        help="Handle a single JSON request and exit.")
    args = parser.parse_args()

    experiment_path = args.experiment_path
    if not os.path.isdir(experiment_path):
        experiment_path = os.path.join("outputs", experiment_path)
    engine = InferenceEngine.from_experiment(experiment_path)
    logger.info("Inference engine ready.")

    def respond(request):
        rid = request.get("id")
        try:
            result = handle(engine, request)
            out = {"id": rid, "result": result}
        except Exception as exc:  # noqa: BLE001 - protocol boundary
            out = {"id": rid, "error": str(exc)}
        sys.stdout.write(json.dumps(out) + "\n")
        sys.stdout.flush()

    if args.once:
        respond(json.loads(args.once))
        return
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        respond(json.loads(line))


if __name__ == "__main__":
    main()
