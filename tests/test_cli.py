"""CLI entry-point smoke tests: every script parses --help in a fresh
interpreter. The loop tests call train() directly, so the argparse shims
and their module-level imports (the layer the reference exposes to users,
SURVEY.md §1) were otherwise unexercised."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = ["pretrain.py", "train_joint.py", "train_finetune.py",
           "cl_deeplab.py", "create_split.py", "fit_synthetic.py",
           "exp_synthetic_cl.py"]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help(script):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), "--help"],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower()


@pytest.mark.parametrize("script", ["scannet2transform.py",
                                    "scannet2nerf.py"])
def test_preprocessing_cli_help(script):
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "preprocessing_scripts", script), "--help"],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "usage" in r.stdout.lower()
