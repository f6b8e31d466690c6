from .loading import load_yaml, load_env, load_exp_and_env
from .flatten_dict import flatten_dict

__all__ = ["load_yaml", "load_env", "load_exp_and_env", "flatten_dict"]
