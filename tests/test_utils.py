import io
import os
import sys

import numpy as np

from mmgclip_tpu.utils import StepTimer, Table, maybe_trace
from mmgclip_tpu.utils.count_report_len import report_length_stats
from mmgclip_tpu.utils.plot import plot_dataloader_batch, plot_logits_tensorboard, pprint


def test_table_formatting():
    t = Table(["Class", "AUROC"])
    t.add_row(["benign", 0.931])
    t.add_row(["malignant", 0.5])
    out = str(t)
    assert "Class" in out and "benign" in out and "0.931" in out
    assert out.count("+") >= 6  # has separators


def test_report_length_stats():
    lines = ['"One two three. Four."', '"Five."']
    words, sents = report_length_stats(lines)
    assert words == [4, 1]
    assert sents == [2, 1]


def test_step_timer():
    timer = StepTimer()
    timer.start()
    elapsed = timer.stop()
    assert elapsed >= 0
    assert timer.mean == elapsed


def test_maybe_trace_disabled_is_noop(tmp_path):
    with maybe_trace(False, str(tmp_path)):
        pass  # must not start a profiler


def test_plot_helpers_produce_figures(tmp_path):
    batch = {
        "image_features": np.random.default_rng(0).normal(size=(4, 16, 16)),
        "image_description": ["a", "b", "c", "d"],
    }
    path = str(tmp_path / "grid.png")
    plot_dataloader_batch(batch, n=4, save_path=path)
    assert os.path.isfile(path)

    logits = np.random.default_rng(1).normal(size=(8, 8))
    plot_logits_tensorboard(logits, logits.T)


def test_pprint_smoke(capsys):
    pprint({"a": 1})
    assert "a" in capsys.readouterr().out
