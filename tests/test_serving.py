"""Serving engine + JSONL protocol on a trained fixture experiment."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mmgclip_tpu.config import Config, compose, save_snapshot
from mmgclip_tpu.serving import InferenceEngine
from fixtures import build_image_label_tree, make_image_id

pytestmark = pytest.mark.slow  # heavy jit/e2e tier; fast tier: -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")

TINY_TEXT = {
    "config": {
        "vocab_size": 4096, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 128, "max_position_embeddings": 64,
    }
}


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """Train a tiny model and return (run_dir, image paths)."""
    import train

    root = tmp_path_factory.mktemp("serve")
    base, annotated, lists_dir, features_dir = build_image_label_tree(
        str(root), n_benign=8, n_malignant=8, image_size=32
    )
    run_dir = root / "run"
    run_dir.mkdir()
    cfg = compose(CONFIG_DIR, "train_binary_class_clf", run_dir=str(run_dir))
    cfg.dataset.config.base_dataset_path = base
    cfg.dataset.config.annotated_dataset_path = annotated
    cfg.dataset.config.lists_dataset_path = lists_dir
    cfg.base.features_export_dir = features_dir
    cfg.base.export_dir = str(run_dir)
    cfg.base.results_export_dir = str(run_dir / "results")
    cfg.base.tensorboard_export_dir = str(run_dir / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(run_dir / "checkpoints")
    cfg.tokenizer.config.sequence_length = 32
    cfg.networks.text_encoder = Config({"name": "BertEncoder", **TINY_TEXT})
    cfg.networks.image_encoder.config = Config({"micro": True, "in_channels": 1})
    cfg.scheduler.config.epochs = 2
    cfg.dataloader.train.batch_size = 4
    cfg.dataloader.valid.batch_size = 2
    cfg.dataset.eval.enum_classes = []
    save_snapshot(cfg, str(run_dir))
    train.run(cfg)

    image_id = make_image_id(2000000, 2, "cl")
    png = os.path.join(base, "02", "02000000", "st02", f"{image_id}.png")
    exam_dir = os.path.join(base, "02", "02000000", "st02")
    return str(run_dir), png, exam_dir


def test_engine_encode_classify_report(experiment):
    run_dir, png, exam_dir = experiment
    engine = InferenceEngine.from_experiment(run_dir)

    feats = engine.encode_paths([png, png])
    assert feats.shape == (2, 768)
    np.testing.assert_allclose(feats[0], feats[1])

    result = engine.classify(feats, ["Mammogram revealed a mass.", "No findings are present."])
    probs = np.asarray(result["classes_similarities"])
    assert probs.shape == (2, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)

    exam_feats = engine.encode_exam(exam_dir)
    assert exam_feats.shape[-1] == 768

    reports = engine.generate_reports(feats[:1], seed=7)
    assert len(reports) == 1 and len(reports[0]) > 10
    # deterministic per seed
    assert reports == engine.generate_reports(feats[:1], seed=7)


def test_engine_encode_applies_ingest_knobs(experiment, tmp_path):
    """A run configured with encode_resize/encode_window must serve features
    from the SAME ingest chain that built its feature store: online encodes
    (serving, generate_report) silently skipping the windowed-resized chain
    is the failure mode — features from a different input distribution than
    training, with no error (ingest/encode.py::parse_ingest_knobs)."""
    import pandas as pd

    from mmgclip_tpu.config import recompose
    from mmgclip_tpu.ingest import ImageFeatureExtractor

    run_dir, png, _exam_dir = experiment
    cfg = recompose(run_dir)
    cfg.checkpoints.checkpoints_export_dir = os.path.join(run_dir, "checkpoints")
    cfg.dataset.config.encode_resize = [24, 24]
    cfg.dataset.config.encode_window = [16383.75, 49151.25]
    cfg.base.features_export_dir = str(tmp_path / "store")

    extractor = ImageFeatureExtractor(
        config=cfg, dataset=pd.DataFrame({"image_path": [png]}), batch_size=2
    )
    assert extractor.extract() == 1
    stored_files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(str(tmp_path / "store"))
        for f in fs
        if f.endswith(".npy")
    ]
    assert len(stored_files) == 1
    stored = np.load(stored_files[0])

    engine = InferenceEngine(cfg)
    served = engine.encode_paths([png])
    np.testing.assert_allclose(served[0], stored.reshape(-1), atol=1e-5)


def test_serve_cli_once(experiment):
    run_dir, png, _ = experiment
    request = json.dumps({"op": "classify", "paths": [png],
                          "class_list": ["benign", "malignant"], "id": 1})
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "--experiment_path", run_dir, "--once", request],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    response = json.loads(out.stdout.strip().splitlines()[-1])
    assert response["id"] == 1
    assert "result" in response
    assert response["result"]["class_list"] == ["benign", "malignant"]


def test_serve_cli_stdin_loop(experiment):
    """The JSONL loop handles multiple requests and bad input gracefully."""
    run_dir, png, _ = experiment
    requests = "\n".join(
        [
            json.dumps({"op": "ping", "id": 1}),
            json.dumps({"op": "nope", "id": 2}),  # unknown op -> error response
            json.dumps({"op": "classify", "paths": [png], "class_list": ["a", "b"], "id": 3}),
        ]
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "serve.py"), "--experiment_path", run_dir],
        input=requests, capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    responses = [json.loads(l) for l in out.stdout.strip().splitlines()]
    by_id = {r["id"]: r for r in responses}
    assert by_id[1]["result"] == {"ok": True}
    assert "error" in by_id[2] and "nope" in by_id[2]["error"]
    assert by_id[3]["result"]["similarities_argmax"][0] in (0, 1)


def test_serve_socket_concurrent_clients(experiment, tmp_path):
    """Unix-socket front-end: concurrent clients, interleaved requests, every
    response routed back on the right connection with the right id."""
    import asyncio
    import socket
    import threading

    from serve import serve_socket

    run_dir, png, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)
    sock_path = str(tmp_path / "mmg.sock")
    ready = threading.Event()

    def run_server():
        asyncio.run(serve_socket(engine, unix_path=sock_path, ready_event=ready))

    threading.Thread(target=run_server, daemon=True).start()
    assert ready.wait(timeout=30)

    def client(client_idx, results):
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(sock_path)
        fh = conn.makefile("rw")
        requests = [
            {"op": "ping", "id": f"{client_idx}-ping"},
            {"op": "classify", "paths": [png], "class_list": ["benign", "malignant"],
             "id": f"{client_idx}-clf"},
            {"op": "nope", "id": f"{client_idx}-bad"},
        ]
        for request in requests:  # pipelined: all written before any read
            fh.write(json.dumps(request) + "\n")
        fh.flush()
        for _ in requests:
            response = json.loads(fh.readline())
            results[response["id"]] = response
        conn.close()

    results = {}
    threads = [threading.Thread(target=client, args=(i, results)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    assert len(results) == 9
    for i in range(3):
        assert results[f"{i}-ping"]["result"] == {"ok": True}
        assert results[f"{i}-clf"]["result"]["class_list"] == ["benign", "malignant"]
        assert "nope" in results[f"{i}-bad"]["error"]


def test_serve_socket_overlimit_line_closes_connection(experiment, tmp_path):
    """An over-limit line desyncs the stream mid-line: the server must send
    one error response and CLOSE the connection instead of parsing the
    buffered remainder as garbage requests.  Fresh connections still work."""
    import asyncio
    import socket
    import threading

    from serve import serve_socket

    run_dir, _, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)
    sock_path = str(tmp_path / "mmg.sock")
    ready = threading.Event()

    def run_server():
        asyncio.run(serve_socket(engine, unix_path=sock_path, ready_event=ready,
                                 limit=1024))

    threading.Thread(target=run_server, daemon=True).start()
    assert ready.wait(timeout=30)

    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    conn.connect(sock_path)
    fh = conn.makefile("rw")
    # one oversized line whose remainder contains a would-be valid request
    oversized = json.dumps({"op": "ping", "pad": "x" * 4096}) + "\n"
    fh.write(oversized)
    fh.write(json.dumps({"op": "ping", "id": "after"}) + "\n")
    fh.flush()
    first = json.loads(fh.readline())
    assert "error" in first
    # connection must now be closed: no further responses (not even for the
    # trailing valid request — the server cannot trust its framing)
    assert fh.readline() == ""
    conn.close()

    # the server itself is healthy: a new connection round-trips
    conn2 = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    conn2.connect(sock_path)
    fh2 = conn2.makefile("rw")
    fh2.write(json.dumps({"op": "ping", "id": 1}) + "\n")
    fh2.flush()
    assert json.loads(fh2.readline())["result"] == {"ok": True}
    conn2.close()


def test_serve_socket_microbatches_concurrent_classify(experiment, tmp_path):
    """Coalescible classify requests that queue while the device is busy
    merge into ONE forward (dispatcher micro-batching): fewer engine calls
    than requests, every response still correct and per-request."""
    import asyncio
    import socket
    import threading
    import time

    from serve import serve_socket

    run_dir, _, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)

    calls = []
    orig_classify = engine.classify

    def slow_classify(features, class_list):
        calls.append(np.asarray(features).shape[0])
        time.sleep(0.3)  # hold the device so later requests queue up
        return orig_classify(features, class_list)

    engine.classify = slow_classify
    sock_path = str(tmp_path / "mmg.sock")
    ready = threading.Event()

    def run_server():
        asyncio.run(serve_socket(engine, unix_path=sock_path, ready_event=ready))

    threading.Thread(target=run_server, daemon=True).start()
    assert ready.wait(timeout=30)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8, 768)).astype(np.float32)
    results = {}

    def client(i):
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(sock_path)
        fh = conn.makefile("rw")
        fh.write(json.dumps({
            "op": "classify", "id": i, "features": [feats[i].tolist()],
            "class_list": ["benign", "malignant"],
        }) + "\n")
        fh.flush()
        results[i] = json.loads(fh.readline())
        conn.close()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    assert len(results) == 8
    for i in range(8):
        res = results[i]["result"]
        assert len(res["classes_similarities"]) == 1  # per-request split
        assert res["similarities_argmax"][0] in (0, 1)
        assert res["class_list"] == ["benign", "malignant"]
    # batching happened: 8 requests, strictly fewer device calls, at least
    # one call carried a merged batch.  Merged batches pad to power-of-two
    # buckets (jit shape stability), so row counts may exceed the request
    # count — bounded by 2x (the pow-2 ceiling), which still catches any
    # duplicate enqueue/merge of a request's rows
    assert 8 <= sum(calls) <= 16
    assert len(calls) < 8
    assert max(calls) >= 2


def test_handle_group_splits_match_individual_results(experiment):
    """handle_group == per-request handle, row for row (reports too)."""
    from serve import handle, handle_group

    run_dir, _, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)
    rng = np.random.default_rng(1)
    requests = [
        {"op": "classify", "features": [rng.normal(size=768).tolist()],
         "class_list": ["benign", "malignant"]}
        for _ in range(3)
    ]
    grouped = handle_group(engine, requests)
    for request, group_result in zip(requests, grouped):
        single = handle(engine, request)
        np.testing.assert_allclose(
            group_result["classes_similarities"], single["classes_similarities"], rtol=1e-5
        )
        assert group_result["similarities_argmax"] == single["similarities_argmax"]

    report_requests = [
        {"op": "report", "features": [rng.normal(size=768).tolist()], "seed": 7}
        for _ in range(2)
    ]
    grouped = handle_group(engine, report_requests)
    for request, group_result in zip(report_requests, grouped):
        assert group_result["reports"] == handle(engine, request)["reports"]


def test_batch_key_rules():
    """Malformed fields never raise (the dispatcher calls this), and
    exam_dir-bearing reports are excluded (handle() precedence)."""
    from serve import _batch_key

    assert _batch_key({"op": "classify", "features": [[1.0]], "class_list": ["a"]}) is not None
    assert _batch_key({"op": "report", "features": [[1.0]]}) is not None
    # exam_dir takes precedence in handle(): must not coalesce on features
    assert _batch_key({"op": "report", "features": [[1.0]], "exam_dir": "/x"}) is None
    # malformed seed / unhashable class_list: non-batchable, not an exception
    assert _batch_key({"op": "report", "features": [[1.0]], "seed": "abc"}) is None
    assert _batch_key({"op": "classify", "features": [[1.0]], "class_list": [["a"]]}) is None
    assert _batch_key({"op": "ping"}) is None


def test_features_b64_form(experiment):
    """The compact inline-features form: identical answers to the JSON list
    form, coalescible (same batch key), mixable within one merged group, and
    loud on a payload that is not a multiple of the feature dim."""
    import base64

    from serve import _batch_key, handle, handle_group

    run_dir, _, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, 768)).astype(np.float32)
    b64 = base64.b64encode(feats.astype("<f4").tobytes()).decode()
    class_list = ["benign", "malignant"]

    via_list = handle(engine, {"op": "classify", "features": feats.tolist(),
                               "class_list": class_list})
    via_b64 = handle(engine, {"op": "classify", "features_b64": b64,
                              "class_list": class_list})
    np.testing.assert_allclose(
        via_b64["classes_similarities"], via_list["classes_similarities"], rtol=1e-5
    )
    assert via_b64["similarities_argmax"] == via_list["similarities_argmax"]

    # coalescible, and the two forms share a key (they merge together)
    key_b64 = _batch_key({"op": "classify", "features_b64": b64, "class_list": class_list})
    key_list = _batch_key({"op": "classify", "features": [[1.0]], "class_list": class_list})
    assert key_b64 is not None and key_b64 == key_list
    assert _batch_key({"op": "report", "features_b64": b64}) is not None

    mixed = [
        {"op": "classify", "features": feats[:1].tolist(), "class_list": class_list},
        {"op": "classify",
         "features_b64": base64.b64encode(feats[1:].astype("<f4").tobytes()).decode(),
         "class_list": class_list},
    ]
    grouped = handle_group(engine, mixed)
    np.testing.assert_allclose(
        grouped[0]["classes_similarities"] + grouped[1]["classes_similarities"],
        via_list["classes_similarities"], rtol=1e-5,
    )

    with pytest.raises(ValueError, match="multiple of"):
        handle(engine, {"op": "classify",
                        "features_b64": base64.b64encode(b"\x00" * 12).decode(),
                        "class_list": class_list})


def test_malformed_request_does_not_kill_dispatcher(experiment, tmp_path):
    """A request whose batch key WOULD have raised must produce a per-client
    error while the server keeps serving (review fix: a dead dispatcher task
    would hang every future request forever)."""
    import asyncio
    import socket
    import threading

    from serve import serve_socket

    run_dir, _, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)
    sock_path = str(tmp_path / "mmg.sock")
    ready = threading.Event()

    def run_server():
        asyncio.run(serve_socket(engine, unix_path=sock_path, ready_event=ready))

    threading.Thread(target=run_server, daemon=True).start()
    assert ready.wait(timeout=30)

    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    conn.connect(sock_path)
    fh = conn.makefile("rw")
    fh.write(json.dumps({"op": "report", "features": [[0.0] * 768],
                         "seed": "abc", "id": 1}) + "\n")
    fh.write(json.dumps({"op": "ping", "id": 2}) + "\n")
    fh.flush()
    first = json.loads(fh.readline())
    assert first["id"] == 1 and "error" in first
    second = json.loads(fh.readline())
    assert second["id"] == 2 and second["result"] == {"ok": True}
    conn.close()


def test_serve_socket_soak_mixed_ops(experiment, tmp_path):
    """Soak: pipelined mixed-op traffic from several connections — every
    request gets exactly one response with the right id, batchable and
    non-batchable ops interleaved, no deadlock, order preserved per
    connection."""
    import asyncio
    import socket
    import threading

    from serve import serve_socket

    run_dir, png, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)
    sock_path = str(tmp_path / "mmg.sock")
    ready = threading.Event()

    def run_server():
        asyncio.run(serve_socket(engine, unix_path=sock_path, ready_event=ready))

    threading.Thread(target=run_server, daemon=True).start()
    assert ready.wait(timeout=30)

    rng = np.random.default_rng(3)
    per_conn = 12

    def make_request(cid, i):
        kind = (cid + i) % 4
        rid = f"{cid}-{i}"
        if kind == 0:
            return {"op": "ping", "id": rid}
        if kind == 1:
            return {"op": "classify", "id": rid,
                    "features": [rng.normal(size=768).tolist()],
                    "class_list": ["benign", "malignant"]}
        if kind == 2:
            return {"op": "report", "id": rid,
                    "features": [rng.normal(size=768).tolist()], "seed": 5}
        return {"op": "bogus", "id": rid}  # error path interleaved

    results = {}

    def client(cid):
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(sock_path)
        fh = conn.makefile("rw")
        for i in range(per_conn):  # fully pipelined
            fh.write(json.dumps(make_request(cid, i)) + "\n")
        fh.flush()
        order = []
        for _ in range(per_conn):
            response = json.loads(fh.readline())
            order.append(response["id"])
            results[response["id"]] = response
        conn.close()
        # responses come back in request order on each connection
        assert order == [f"{cid}-{i}" for i in range(per_conn)], order

    threads = [threading.Thread(target=client, args=(c,)) for c in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)

    assert len(results) == 4 * per_conn
    for cid in range(4):
        for i in range(per_conn):
            response = results[f"{cid}-{i}"]
            kind = (cid + i) % 4
            if kind == 0:
                assert response["result"] == {"ok": True}
            elif kind == 1:
                assert response["result"]["similarities_argmax"][0] in (0, 1)
            elif kind == 2:
                assert len(response["result"]["reports"]) == 1
            else:
                assert "bogus" in response["error"]


def test_shutdown_resolves_pending_futures(experiment, tmp_path, monkeypatch):
    """Server shutdown mid-work must FAIL queued/in-flight futures so clients
    awaiting responses get an error instead of hanging forever (advisor r3):
    the dispatcher fails its in-flight batch on CancelledError and the server
    drains the queue after cancelling the dispatcher."""
    import asyncio
    import time

    import serve as serve_mod
    from serve import serve_socket

    run_dir, _png, _ = experiment
    engine = InferenceEngine.from_experiment(run_dir)
    sock_path = str(tmp_path / "shutdown.sock")

    real_handle = serve_mod.handle

    def slow_handle(engine, request):
        if request.get("op") == "slowping":
            time.sleep(1.5)  # keeps the dispatcher busy so later requests queue
            return {"ok": True}
        return real_handle(engine, request)

    monkeypatch.setattr(serve_mod, "handle", slow_handle)

    async def orchestrate():
        import threading

        ready = threading.Event()
        server_task = asyncio.ensure_future(
            serve_socket(engine, unix_path=sock_path, ready_event=ready)
        )
        for _ in range(2000):  # bounded: surface a server crash, never spin
            if ready.is_set():
                break
            if server_task.done():
                server_task.result()  # raises the server's startup error
            await asyncio.sleep(0.01)
        else:
            raise RuntimeError("server never became ready")
        reader, writer = await asyncio.open_unix_connection(sock_path)
        for rid, op in [(1, "slowping"), (2, "slowping"), (3, "slowping")]:
            writer.write((json.dumps({"op": op, "id": rid}) + "\n").encode())
        await writer.drain()
        await asyncio.sleep(0.4)  # request 1 in-flight, 2-3 queued
        server_task.cancel()
        try:
            await server_task
        except (asyncio.CancelledError, Exception):
            pass
        # every pending request resolves as an ERROR response (no hang)
        responses = []
        for _ in range(3):
            line = await asyncio.wait_for(reader.readline(), timeout=10)
            assert line, "connection dropped without responses"
            responses.append(json.loads(line))
        writer.close()
        return responses

    responses = asyncio.run(orchestrate())
    by_id = {r["id"]: r for r in responses}
    assert set(by_id) == {1, 2, 3}
    for rid in (1, 2, 3):
        assert "shutting down" in by_id[rid]["error"]

def test_engine_encode_applies_prepool(experiment, tmp_path):
    """encode_host_prepool is part of the ingest chain contract: a feature
    store built from host block sums must be served from the SAME prepooled
    program, byte-close — and the engine must accept the knob end to end."""
    import pandas as pd

    from mmgclip_tpu.config import recompose
    from mmgclip_tpu.ingest import ImageFeatureExtractor

    run_dir, png, _exam_dir = experiment
    cfg = recompose(run_dir)
    cfg.checkpoints.checkpoints_export_dir = os.path.join(run_dir, "checkpoints")
    cfg.dataset.config.encode_resize = [8, 8]
    cfg.dataset.config.encode_host_prepool = 2
    cfg.base.features_export_dir = str(tmp_path / "store_pp")

    extractor = ImageFeatureExtractor(
        config=cfg, dataset=pd.DataFrame({"image_path": [png]}), batch_size=2
    )
    assert extractor.extract() == 1
    stored_files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(str(tmp_path / "store_pp"))
        for f in fs
        if f.endswith(".npy")
    ]
    assert len(stored_files) == 1
    stored = np.load(stored_files[0])

    engine = InferenceEngine(cfg)
    served = engine.encode_paths([png])
    np.testing.assert_allclose(served[0], stored.reshape(-1), atol=1e-5)
