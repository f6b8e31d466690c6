from .loading import load_yaml, load_env, load_exp_and_env
from .flatten_dict import flatten_dict
from .key_audit import audit_exp_keys, ignored_reason

__all__ = ["load_yaml", "load_env", "load_exp_and_env", "flatten_dict",
           "audit_exp_keys", "ignored_reason"]
