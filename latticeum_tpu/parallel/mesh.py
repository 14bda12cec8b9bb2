"""Device-mesh sharding for the folding prover.

Parallelism axes (the analogs of DP/TP for this workload, SURVEY §2.9):
  * "rows"  — the sum-check hypercube / witness rows / Ajtai columns.
    Sharding MLEs over rows makes each round's reduction a psum over ICI.
  * "slots" — the 24 F_q NTT coordinates (ring/tensor axis).

The kernels themselves are plain jnp; GSPMD propagates the NamedShardings
and inserts all_reduce/all_gather as needed — no hand-written collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    # factor n into (rows, slots) with slots in {1,2,4} dividing 24's tiling
    slots = 2 if n % 2 == 0 and n > 2 else 1
    rows = n // slots
    dev_array = np.array(devices).reshape(rows, slots)
    return Mesh(dev_array, ("rows", "slots"))


def shard_mles(mesh: Mesh, mles):
    """(k, n, 24) limbs: shard hypercube axis over "rows"."""
    s = NamedSharding(mesh, P(None, "rows", None))
    return tuple(jax.device_put(x, s) for x in mles)


def shard_matrix(mesh: Mesh, matrix):
    """Ajtai (kappa, n, 24): shard the contraction axis over "rows"."""
    s = NamedSharding(mesh, P(None, "rows", None))
    return tuple(jax.device_put(x, s) for x in matrix)


def shard_vector(mesh: Mesh, f):
    """(n, 24): shard over "rows"."""
    s = NamedSharding(mesh, P("rows", None))
    return tuple(jax.device_put(x, s) for x in f)


def replicate(mesh: Mesh, x):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), x)
