"""Multi-process (multi-host) execution path (parallel/multihost.py):
2 fresh processes x 2 virtual CPU devices each, jax.distributed over a
localhost coordinator, per-process batch shards assembled with
make_array_from_process_local_data — one global contrastive training step
must equal the single-process oracle (VERDICT r3 missing #1; SURVEY §2.4
per-host data loading)."""

import pytest

from mmgclip_tpu.parallel.multihost import run_multihost_dryrun

pytestmark = pytest.mark.slow


def test_two_process_global_step_matches_single_process_oracle():
    # no explicit port: exercise the shipped OS-assigned-port path (a pinned
    # port reintroduces the stale-listener collision _free_port exists for)
    err = run_multihost_dryrun(n_processes=2, n_devices=4)
    assert err < 1e-5


def test_put_global_assembles_every_spec_family_multi_process():
    """put_global on a 2-process mesh must assemble replicated, batch-over-
    data, LEADING-model-axis (expert-stacked restore leaves), dim>0 data
    (ZeRO-1 moments), and combined ('data','model') specs — each process
    checks every addressable shard against the oracle block."""
    from mmgclip_tpu.parallel.multihost import run_put_global_dryrun

    err = run_put_global_dryrun(n_processes=2, n_devices=4)
    assert err == 0.0


def test_two_process_real_experiment_matches_single_process():
    """The PRODUCT training path pod-shaped (VERDICT r4 missing #2): a real
    ClassifierExperiment epoch — donated-buffer jitted step, scan-based
    fused epoch, put_global bank/batch placement — run as 2 distributed
    processes x 2 devices equals the single-process run on the same global
    mesh (loss and every parameter)."""
    from mmgclip_tpu.parallel.multihost import run_multihost_experiment_dryrun

    err = run_multihost_experiment_dryrun(n_processes=2, n_devices=4)
    assert err < 1e-4, f"pod-shaped experiment diverges: {err}"


@pytest.mark.parametrize("name,overrides", [
    # EP + TP: MoE expert weights shard over the model axis (leading-axis
    # expert specs through put_global), BERT tower TP-sharded for the bank
    # encode — the placements VERDICT r4 flagged as un-rehearsed pod-side
    ("ep_tp", {
        "parallel": {"model_axis": 2, "pipeline_stages": 1},
        "projection.config.projection_name": "MoEProjectionHead",
        "projection.config.n_experts": 4,
        "projection.config.capacity_factor": 2.0,
    }),
    # ZeRO-1: optimizer moments shard over `data` — the spec family where
    # the data axis can land at dim > 0 (put_global target-array mode)
    ("zero1", {"optimizer.config.zero_sharding": True}),
])
def test_two_process_parallel_layouts_match_single_process(name, overrides):
    """The NON-default layouts run pod-shaped too: one real
    ClassifierExperiment epoch as 2 distributed processes equals the
    single-process run under the same overrides (worker-side asserts pin
    that the layout was actually active, not silently defaulted)."""
    from mmgclip_tpu.parallel.multihost import run_multihost_experiment_dryrun

    err = run_multihost_experiment_dryrun(n_processes=2, n_devices=4,
                                          overrides=overrides)
    assert err < 1e-4, f"pod-shaped {name} experiment diverges: {err}"
