"""ucsa_neural_rendering_tpu — TPU-native framework for unsupervised continual
semantic adaptation through neural rendering.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the CVPR 2023
reference `ethz-asl/ucsa_neural_rendering` (nr4seg): a Semantic-NeRF
(multi-resolution hash-grid encoding + fused MLPs + volumetric rendering with
RGB/depth/semantics heads) trained jointly with a DeepLabV3-ResNet101
segmentation network for per-scene continual adaptation on ScanNet.

Layout (TPU-first, not a port):
  config/    YAML two-layer config system           (ref: nr4seg/utils/loading.py, cfg/)
  data/      host-side datasets, rays, label decode (ref: nr4seg/dataset/)
  models/    hash encoding, MLPs, NeRF, DeepLabV3   (ref: nr4seg/nerf/, nr4seg/network/)
  ops/       sampling, compositing, renderer, occupancy grid
                                                     (ref: nr4seg/nerf/renderer_semantics.py,
                                                      nr4seg/nerf/raymarching/)
  parallel/  device mesh + sharding helpers          (ref: Lightning DDP usage)
  train/     jitted train/eval/render steps + loops  (ref: nr4seg/lightning/, scripts/)
  metrics/   device-side confusion-matrix meter      (ref: nr4seg/utils/metrics.py)
  viz/       palettes + PNG dumps                    (ref: nr4seg/visualizer/)
  utils/     logging, flatten_dict
"""

import os

ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA compilation cache: TPU train-step compiles run minutes on
# this toolchain; caching them across processes makes the CLI entry points
# usable. Opt out with UCSA_NO_COMPILATION_CACHE=1.
#
# The cache dir is keyed by a HOST fingerprint (arch + CPU-flags hash):
# XLA:CPU AOT entries on this toolchain are not keyed by machine features,
# so a cache written on one machine and read on another loads code compiled
# for the wrong CPU — the loader itself warns "could lead to execution
# errors such as SIGILL", and intermittent segfaults/LLVM OOMs were traced
# to exactly this when ~/.cache travels across hosts (e.g. VM snapshots).


def _host_cache_fingerprint() -> str:
    import hashlib
    import platform
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    sig += "-" + hashlib.sha256(
                        line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    return sig


if not os.environ.get("UCSA_NO_COMPILATION_CACHE"):
    try:
        import jax
        _base = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/ucsa_jax_cache"))
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(_base, _host_cache_fingerprint()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

# Default env-config name, mirroring the reference's ENV_WORKSTATION_NAME
# convention (ref: nr4seg/__init__.py:3-6).
if "ENV_WORKSTATION_NAME" not in os.environ:
    os.environ["ENV_WORKSTATION_NAME"] = "env"

__version__ = "0.1.0"
