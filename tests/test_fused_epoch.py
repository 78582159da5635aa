"""The fused-epoch fast path must produce the same training results as the
per-batch loop (same math, different host involvement)."""

import json
import pytest
import os

import numpy as np

from test_training import _experiment

pytestmark = pytest.mark.slow  # heavy jit/e2e tier; fast tier: -m 'not slow'


def _train_losses(cfg):
    scalars = open(os.path.join(cfg.base.tensorboard_export_dir, "scalars.jsonl")).read()
    lines = [json.loads(l) for l in scalars.strip().splitlines()]
    return [l["value"] for l in lines if l["tag"] == "loss/train"]


def test_fused_epoch_matches_per_batch_loop(tmp_path):
    # fused path (default)
    exp_fused, cfg_fused = _experiment(tmp_path / "fused", epochs=3)
    assert exp_fused._fused
    exp_fused.run()
    fused_losses = _train_losses(cfg_fused)

    # per-batch path
    exp_loop, cfg_loop = _experiment(tmp_path / "loop", epochs=3)
    exp_loop.config.base.fused_epoch = False
    exp_loop._fused = False
    exp_loop.run()
    loop_losses = _train_losses(cfg_loop)

    assert len(fused_losses) == len(loop_losses) == 3
    # same objective magnitude; exact trajectories differ only through the
    # shuffle order RNG, so compare the untrained epoch-0 loss exactly-ish
    np.testing.assert_allclose(fused_losses[0], loop_losses[0], rtol=0.2)
    assert all(np.isfinite(v) for v in fused_losses)


def test_fused_epoch_with_percentage_subset(tmp_path):
    """Subset-of-subset index chains resolve correctly."""
    from mmgclip_tpu.config import Config
    from mmgclip_tpu.data import dataloader_percentage

    exp, cfg = _experiment(tmp_path, epochs=2)
    cfg.dataset.percentage = Config({"name": "50percent", "config": {"percentage": 0.5}})
    smaller = dataloader_percentage(exp.train_dataloader, cfg)
    exp.train_dataloader = smaller
    exp._feats_bank = None  # force rebuild
    loss = exp._fused_epoch()
    assert np.isfinite(loss)
    assert len(exp._train_indices) == len(smaller.dataset)


def test_epoch_order_tail_handling():
    """_epoch_order (review r4): with drop_last=False the tail batch is
    completed by wrap-around so every sample trains each epoch; with
    drop_last=True the tail drops; no in-batch duplicates when n >= bs."""
    import numpy as np

    from mmgclip_tpu.training.experiment import _epoch_order

    rng = np.random.default_rng(0)
    # tail completed: every index present, length a multiple of bs
    order = _epoch_order(10, 4, False, rng)
    assert len(order) == 12 and set(order) == set(range(10))
    for s in range(0, 12, 4):  # no duplicate inside any single batch
        batch = order[s : s + 4]
        assert len(set(batch.tolist())) == len(batch)
    # exact multiple: untouched
    assert len(_epoch_order(8, 4, False, rng)) == 8
    # drop_last: tail dropped
    assert len(_epoch_order(10, 4, True, rng)) == 8
    # tiny dataset (n < bs): tiled up to one full batch
    order = _epoch_order(3, 8, False, rng)
    assert len(order) == 8 and set(order) == set(range(3))
