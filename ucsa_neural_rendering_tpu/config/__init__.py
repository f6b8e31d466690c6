from .loading import load_yaml, load_env, load_exp_and_env
from .flatten_dict import flatten_dict
from .key_audit import audit_exp_keys, ignored_reason
from .shipped import (SHIPPED_NERF_ENC, SHIPPED_NERF_SFWD, SHIPPED_PROPOSAL,
                      SHIPPED_TRAIN_BUDGET, shipped_enc_str, shipped_sfwd_env)

__all__ = ["load_yaml", "load_env", "load_exp_and_env", "flatten_dict",
           "audit_exp_keys", "ignored_reason", "SHIPPED_NERF_ENC",
           "SHIPPED_NERF_SFWD", "SHIPPED_TRAIN_BUDGET", "SHIPPED_PROPOSAL",
           "shipped_enc_str",
           "shipped_sfwd_env"]
