"""Inference server: JSONL request/response over stdin/stdout or a socket.

Loads a trained experiment once and serves encode / classify / report
requests with everything (towers, prompt banks, jitted programs) warm.
New capability relative to the reference, which had no serving path.

Protocol (one JSON object per line):
  {"op": "encode",   "paths": ["/path/a.png", ...]}
  {"op": "classify", "paths": [...] | "features": [[...]], "class_list": [...]}
  {"op": "report",   "paths": [...] | "exam_dir": "/path/st02", "seed": 42}
  {"op": "ping"}

Responses mirror the request id (if given) and carry "result" or "error".

Front-ends (same protocol on each):
  stdin/stdout (default)          python serve.py --experiment_path ...
  one-shot                        ... --once '{"op": "ping"}'
  TCP socket, concurrent clients  ... --socket 127.0.0.1:8787
  unix domain socket              ... --unix /tmp/mmgclip.sock

Connections are handled concurrently (asyncio); device work is serialized
through a single executor thread — one accelerator stream, no interleaved
jit dispatch.
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


async def serve_socket(engine: InferenceEngine, host=None, port=None, unix_path=None,
                       ready_event=None, limit=64 * 1024 * 1024):
    """JSONL protocol over TCP / unix sockets, one task per connection.

    Device work runs on a single executor thread: clients interleave freely
    at the protocol layer while jit dispatch stays single-stream."""
    import asyncio
    from concurrent.futures import ThreadPoolExecutor

    loop = asyncio.get_running_loop()
    executor = ThreadPoolExecutor(max_workers=1)

    async def client(reader, writer):
        while True:
            rid = None
            desynced = False
            try:
                try:
                    line = await reader.readline()
                except (ValueError, asyncio.LimitOverrunError) as exc:
                    # over-limit line: the reader buffer still holds the
                    # partial line, so further reads would parse its
                    # remainder as garbage requests — respond, then close
                    desynced = True
                    raise RuntimeError(f"line too long: {exc}") from exc
                if not line:
                    break
                line = line.strip()
                if not line:
                    continue
                request = json.loads(line)
                rid = request.get("id")
                result = await loop.run_in_executor(executor, handle, engine, request)
                out = {"id": rid, "result": result}
            except (asyncio.IncompleteReadError, ConnectionResetError):
                break
            except Exception as exc:  # noqa: BLE001 - protocol boundary
                out = {"id": rid, "error": str(exc)}
            writer.write((json.dumps(out) + "\n").encode())
            await writer.drain()
            if desynced:
                break
        writer.close()
        await writer.wait_closed()

    # inline-features requests are legitimately large (768 floats/image as
    # JSON); asyncio's default 64 KiB readline limit would kill them — the
    # default limit is 64 MiB
    if unix_path:
        server = await asyncio.start_unix_server(client, path=unix_path, limit=limit)
    else:
        server = await asyncio.start_server(client, host, port, limit=limit)
    addr = unix_path or f"{host}:{port}"
    logger.info(f"Serving JSONL protocol on {addr}.")
    if ready_event is not None:
        ready_event.set()
    async with server:
        await server.serve_forever()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_path", type=str, required=True,
                        help="Run folder inside outputs/ ('yyyy-mm-dd/XX-XX-XX').")
    parser.add_argument("--once", type=str, default=None,
                        help="Handle a single JSON request and exit.")
    parser.add_argument("--socket", type=str, default=None,
                        help="Serve over TCP: host:port.")
    parser.add_argument("--unix", type=str, default=None,
                        help="Serve over a unix domain socket at this path.")
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
    if args.socket or args.unix:
        import asyncio

        if args.socket:
            host, _, port = args.socket.rpartition(":")
            asyncio.run(serve_socket(engine, host=host or "127.0.0.1", port=int(port)))
        else:
            asyncio.run(serve_socket(engine, unix_path=args.unix))
        return
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            request = json.loads(line)
        except json.JSONDecodeError as exc:
            # malformed input must not kill the long-running server
            sys.stdout.write(json.dumps({"id": None, "error": f"bad json: {exc}"}) + "\n")
            sys.stdout.flush()
            continue
        respond(request)


if __name__ == "__main__":
    main()
