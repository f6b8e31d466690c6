"""Two-layer YAML config system.

Mirrors the reference's config surface (ref: nr4seg/utils/loading.py:14-17,
cfg/env/env.yml, cfg/exp/**.yml): an environment YAML holding machine paths
(results / scannet / scannet_frames_25k) plus a per-experiment YAML with
model / optimizer / trainer / data_module / visualizer / scenes / cl blocks.
Field names are kept config-compatible with the reference so its experiment
YAMLs drop in unchanged.
"""

import os

import yaml


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def load_env(root_dir: str, env_name: str | None = None) -> dict:
    """Load cfg/env/<ENV_WORKSTATION_NAME>.yml (ref: scripts/*.py env loading)."""
    if env_name is None:
        env_name = os.environ.get("ENV_WORKSTATION_NAME", "env")
    return load_yaml(os.path.join(root_dir, "cfg", "env", env_name + ".yml"))


def load_exp_and_env(root_dir: str, exp_rel_path: str,
                     env_name: str | None = None) -> tuple[dict, dict, str, str]:
    """Returns (exp, env, exp_cfg_path, env_cfg_path)."""
    exp_cfg_path = os.path.join(root_dir, exp_rel_path)
    exp = load_yaml(exp_cfg_path)
    if env_name is None:
        env_name = os.environ.get("ENV_WORKSTATION_NAME", "env")
    env_cfg_path = os.path.join(root_dir, "cfg", "env", env_name + ".yml")
    env = load_yaml(env_cfg_path)
    return exp, env, exp_cfg_path, env_cfg_path
