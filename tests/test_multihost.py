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
