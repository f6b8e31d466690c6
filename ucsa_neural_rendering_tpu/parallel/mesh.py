"""Device mesh and sharding helpers.

TPU-native replacement for the reference's only distribution mechanism —
PyTorch-Lightning DDP over NCCL (ref: scripts/pretrain.py:103-109,
nr4seg/lightning/semantics_lightning_net.py:76-78). Instead of one process
per device with implicit gradient all-reduce, we build a single
`jax.sharding.Mesh` with a `data` axis and express data parallelism with
`NamedSharding` + jit: parameters replicated, batch sharded on `data`, XLA
inserting the psum gradient all-reduce over ICI. The metric all_gather of
pixel tensors becomes a psum of the 40x40 confusion matrix (see
metrics/meter.py). The mesh is 1-D by default but the helpers accept any
axis layout so a DCN data axis is a config change, not a rewrite.
"""

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=None)
def get_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard leading (batch/ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_device_count() -> int:
    return jax.local_device_count()


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host pytree so each leaf's leading axis is sharded on the mesh.

    Leading dims must be divisible by mesh size (static shapes; pad upstream).
    """
    sh = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def unshard(x):
    """Fetch a (possibly sharded) array fully to host."""
    return np.asarray(jax.device_get(x))
