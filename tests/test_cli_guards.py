"""CLI argument/footgun guards added in review: clear errors instead of
late crashes."""

import subprocess
import sys

import numpy as np
import pytest


def _run_train(extra, cwd="/root/repo"):
    return subprocess.run(
        [sys.executable, "keras_train.py", "--train_set", "synth",
         "--model_def", "yolo_mobilev1", "--depth_multiplier", "0.75",
         "--max_nrof_epochs", "1", "--log_dir", "/tmp/cli_guard"] + extra,
        capture_output=True, text=True, cwd=cwd, timeout=300)


@pytest.mark.slow
def test_mesh_flag_with_too_many_axes_errors_clearly():
    r = _run_train(["--mesh", "2,2,1,1", "--batch_size", "8"])
    assert r.returncode != 0
    assert "dp,mp[,sp]" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_batch_larger_than_dataset_errors_clearly():
    # synth set has 24 images; batch 256 -> zero steps per epoch
    r = _run_train(["--batch_size", "256"])
    assert r.returncode != 0
    assert "batch_size" in (r.stderr + r.stdout)


def test_single_dim_mesh_parses():
    """'--mesh 8' (pure DP) must not crash the safe_dw_grad gate."""
    sys.path.insert(0, "/root/repo")
    import keras_train

    a = keras_train.parse_args(["--mesh", "8"])
    dims = [int(x) for x in a.mesh.split(",")]
    assert dims == [8]
