"""Collective wrappers + the Pallas ring all-gather on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec

from mmgclip_tpu.parallel import create_mesh
from mmgclip_tpu.parallel.collectives import (
    all_gather,
    pmean,
    ppermute,
    psum,
    reduce_scatter,
    ring_all_gather,
)

P = PartitionSpec


def _mesh():
    return create_mesh(data=8, model=1)


def _run(fn, *arrays, out_spec=P()):
    mesh = _mesh()
    return shard_map(
        fn, mesh=mesh, in_specs=tuple(P("data") for _ in arrays), out_specs=out_spec
    )(*arrays)


def test_psum_and_pmean():
    x = jnp.arange(8.0).reshape(8, 1)
    total = _run(lambda v: psum(v.sum()), x)
    np.testing.assert_allclose(float(total), 28.0)
    mean = _run(lambda v: pmean(v.sum()), x)
    np.testing.assert_allclose(float(mean), 3.5)


def test_all_gather_tiled():
    x = jnp.arange(16.0).reshape(16, 1)
    gathered = _run(lambda v: all_gather(v), x, out_spec=P("data", None))
    # every shard holds the full array; output respec'd back over data
    assert gathered.shape == (128, 1)


def test_ppermute_ring_shift():
    x = jnp.arange(8.0).reshape(8, 1)
    perm = [(i, (i + 1) % 8) for i in range(8)]
    shifted = _run(lambda v: ppermute(v, perm), x, out_spec=P("data", None))
    np.testing.assert_allclose(np.asarray(shifted)[:, 0], np.roll(np.arange(8.0), 1))


def test_reduce_scatter():
    x = jnp.ones((8, 8))
    out = _run(lambda v: reduce_scatter(v.reshape(8)), x, out_spec=P("data"))
    np.testing.assert_allclose(np.asarray(out), np.full(8, 8.0))


def test_ring_all_gather_matches_xla():
    from jax.sharding import Mesh

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)  # 8 rows/device

    # pallas remote DMA with LOGICAL ids needs a single-axis mesh
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    expected = shard_map(
        lambda v: jax.lax.all_gather(v, "data", tiled=True),
        mesh=mesh, in_specs=(P("data"),), out_specs=P("data", None),
    )(x)

    out = jax.shard_map(
        lambda v: ring_all_gather(v, "data", interpret=True),
        mesh=mesh, in_specs=(P("data"),), out_specs=P("data", None),
        check_vma=False,  # interpret-mode pallas + varying axis ids trip the vma checker
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_ring_all_gather_fallback_on_ragged_shapes():
    # 3 columns can't tile onto 128 lanes -> falls back to XLA all_gather
    x = jnp.arange(24.0).reshape(8, 3)
    mesh = _mesh()
    out = shard_map(
        lambda v: ring_all_gather(v, "data"),
        mesh=mesh, in_specs=(P("data"),), out_specs=P("data", None),
    )(x)
    assert out.shape == (64, 3)


def test_collective_ids_distinct_within_trace_stable_across_traces():
    """Ids from one call site: distinct for multiple gathers traced into ONE
    program (same trace), identical across retraces (cache stability), and
    consistent for plain eager operands (advisor r2 finding + review fix)."""
    from mmgclip_tpu.parallel.collectives import _site_collective_id

    class FakeTrace:
        pass

    class FakeTracer:
        def __init__(self, trace):
            self._trace = trace

    def fake_ring(x):  # stands in for ring_all_gather's stack frame
        return _site_collective_id(x, (8, 128), "float32", "data")

    def ids_for(operands):
        # ONE source line below = one call site, like a single
        # ring_all_gather statement traced repeatedly
        return [fake_ring(x) for x in operands]

    trace_a = FakeTrace()
    ids_a = ids_for([FakeTracer(trace_a) for _ in range(3)])
    assert len(set(ids_a)) == 3  # same program -> distinct ids

    trace_b = FakeTrace()  # a retrace: fresh trace object
    ids_b = ids_for([FakeTracer(trace_b) for _ in range(3)])
    assert ids_a == ids_b  # identical program lowers identically

    eager = object.__new__(FakeTracer)  # no _trace attribute at all
    assert ids_for([eager]) == [ids_a[0]]
    assert ids_for([eager]) == [ids_a[0]]  # eager calls are sequential: stable id

    too_many = FakeTrace()
    with pytest.raises(RuntimeError, match="explicit"):
        ids_for([FakeTracer(too_many) for _ in range(16)])


def _collect_pallas_compiler_params(obj, out, depth=0):
    """Walk a (closed) jaxpr tree collecting every pallas_call's params."""
    if depth > 20:
        return
    if hasattr(obj, "eqns"):
        for eqn in obj.eqns:
            if eqn.primitive.name == "pallas_call":
                out.append(eqn.params.get("compiler_params"))
            for v in eqn.params.values():
                _collect_pallas_compiler_params(v, out, depth + 1)
    elif hasattr(obj, "jaxpr"):
        _collect_pallas_compiler_params(obj.jaxpr, out, depth + 1)
    elif isinstance(obj, (list, tuple)):
        for u in obj:
            _collect_pallas_compiler_params(u, out, depth + 1)
    elif isinstance(obj, dict):
        for u in obj.values():
            _collect_pallas_compiler_params(u, out, depth + 1)


def test_ring_gather_ids_distinct_in_real_contrastive_trace():
    """The REAL training path: tracing global_clip_loss(use_ring_gather=True)
    under grad must give the image and text gathers DIFFERENT collective ids.
    Advisor r3: ids resolved inside the custom_vjp wrapper collapsed to one id
    (each custom_vjp invocation is a fresh trace, resetting the per-trace slot
    at gather's shared file:line) — two concurrent rings sharing one id share
    barrier/semaphore state, a deadlock hazard.  Ids are now resolved at the
    ring_all_gather_diff call site, outside the wrapper."""
    from jax.sharding import Mesh

    from mmgclip_tpu.parallel.contrastive import global_clip_loss

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(8 * n_dev, 128)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(8 * n_dev, 128)), jnp.float32)
    scale = jnp.float32(14.0)

    def fn(i, t):
        return jax.shard_map(
            lambda a, b: global_clip_loss(a, b, scale, axis_name="data",
                                          use_ring_gather=True)[0],
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )(i, t)

    jaxpr = jax.make_jaxpr(jax.grad(fn))(img, txt)
    params = []
    _collect_pallas_compiler_params(jaxpr.jaxpr, params)
    ids = [cp["mosaic_tpu"].collective_id for cp in params if cp is not None]
    assert len(ids) == 2, f"expected 2 ring gathers in the trace, found {len(ids)}"
    assert ids[0] != ids[1], f"image and text gathers share collective_id {ids[0]}"


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs the real TPU backend")
def test_ring_all_gather_lowers_on_real_tpu():
    """Non-interpret Mosaic lowering smoke test (advisor r3): collective_id
    without a custom barrier is REJECTED by Mosaic on the real TPU backend —
    the interpret-mode suite can never catch that.  Compiling here exercises
    the barrier-semaphore prologue + collective_id combination for real."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("data",))
    n_dev = len(devices)
    x = jnp.zeros((8 * n_dev, 128), jnp.float32)

    fn = jax.jit(
        jax.shard_map(
            lambda v: ring_all_gather(v, "data", interpret=False),
            mesh=mesh, in_specs=(P("data"),), out_specs=P("data", None),
            check_vma=False,
        )
    )
    fn.lower(x).compile()  # Mosaic rejects barrier-less collective_id here


def test_ring_gather_ids_distinct_in_mmgclip_trace():
    """global_mmgclip_loss(use_ring_gather=True) routes ALL FOUR gathers
    (CLIP image/text + t2t text/text2) through the ring, each with its own
    collective id — without the passthrough the flag silently applied to
    the CLIP half only (review r4), and id collisions between concurrent
    rings are the advisor-r3 deadlock hazard."""
    from jax.sharding import Mesh

    from mmgclip_tpu.parallel.contrastive import global_mmgclip_loss

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    n_dev = len(jax.devices())
    rng = np.random.default_rng(1)
    mk = lambda: jnp.asarray(rng.normal(size=(8 * n_dev, 128)), jnp.float32)  # noqa: E731
    img, txt, txt2 = mk(), mk(), mk()
    scale = jnp.float32(14.0)

    def fn(i, t, t2):
        return jax.shard_map(
            lambda a, b, c: global_mmgclip_loss(a, b, c, scale, axis_name="data",
                                                use_ring_gather=True)[0],
            mesh=mesh, in_specs=(P("data"),) * 3, out_specs=P(),
            check_vma=False,
        )(i, t, t2)

    jaxpr = jax.make_jaxpr(jax.grad(fn))(img, txt, txt2)
    params = []
    _collect_pallas_compiler_params(jaxpr.jaxpr, params)
    ids = [cp["mosaic_tpu"].collective_id for cp in params if cp is not None]
    assert len(ids) == 4, f"expected 4 ring gathers in the trace, found {len(ids)}"
    assert len(set(ids)) == 4, f"concurrent rings share collective ids: {ids}"


def test_ring_gather_contrastive_loss_and_grads_match_xla():
    """global_clip_loss(use_ring_gather=True): the differentiable Pallas
    ring gather produces the same loss AND gradients as the XLA all_gather
    path (the custom VJP's psum_scatter is all_gather's transpose)."""
    import jax.numpy as jnp

    from mmgclip_tpu.parallel.contrastive import global_clip_loss

    from jax.sharding import Mesh

    n_dev = len(jax.devices())
    # pallas remote DMA with LOGICAL ids needs a single-axis mesh
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rng = np.random.default_rng(0)
    local, d = 8, 128  # tiles onto (8, 128) lanes -> the Pallas kernel runs
    img = jnp.asarray(rng.normal(size=(local * n_dev, d)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(local * n_dev, d)), jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.asarray(1 / 0.07, jnp.float32)
    spec = PartitionSpec("data")

    def loss_with(use_ring):
        def fn(img, txt):
            return jax.shard_map(
                lambda i, t: global_clip_loss(i, t, scale, axis_name="data",
                                              use_ring_gather=use_ring)[0],
                mesh=mesh, in_specs=(spec, spec), out_specs=PartitionSpec(),
                check_vma=False,  # interpret-mode pallas trips the vma checker
            )(img, txt)

        loss, grads = jax.value_and_grad(lambda a, b: fn(a, b), argnums=(0, 1))(img, txt)
        return loss, grads

    xla_loss, xla_grads = loss_with(False)
    ring_loss, ring_grads = loss_with(True)
    np.testing.assert_allclose(float(ring_loss), float(xla_loss), rtol=1e-6)
    for rg, xg in zip(ring_grads, xla_grads):
        np.testing.assert_allclose(np.asarray(rg), np.asarray(xg), atol=1e-6)
