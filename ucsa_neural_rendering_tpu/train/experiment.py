"""Experiment folder + logger setup shared by all entry points
(ref: scripts/pretrain.py:18-56, scripts/train_joint.py:52-78)."""

import os
import shutil

import numpy as np

from ..config import flatten_dict
from ..utils import MetricsLogger


def seed_everything(seed: int):
    import random
    random.seed(seed)
    np.random.seed(seed)


def setup_experiment(exp: dict, env: dict, exp_cfg_path: str | None,
                     env_cfg_path: str | None, project_name: str):
    """Create the run folder, copy configs for provenance, build the logger.
    Returns (model_path, logger). Mutates exp['general']['name'] to the run
    folder like the reference does."""
    model_path = os.path.join(env["results"], exp["general"]["name"])
    # a resuming run must keep the folder: it holds the `last_ckpt` resume
    # anchor the run is about to restore (the reference pairs
    # clean_up_folder_if_exists with resume_from_checkpoint the same way —
    # resume wins, ref scripts/pretrain.py:97-101)
    resuming = bool(exp.get("trainer", {}).get("resume_from_checkpoint"))
    if exp["general"].get("clean_up_folder_if_exists", False) and not resuming:
        shutil.rmtree(model_path, ignore_errors=True)
    os.makedirs(model_path, exist_ok=True)

    for p in (exp_cfg_path, env_cfg_path):
        if p and os.path.isfile(p):
            shutil.copy(p, os.path.join(model_path, os.path.split(p)[-1]))

    exp["general"]["name"] = model_path
    logger = MetricsLogger(model_path, project_name=project_name)
    logger.log_hyperparams(flatten_dict(exp))
    return model_path, logger
