"""Device mesh + sharding helpers (the distributed layer the reference lacks).

The reference's only multi-device mechanism is torch DataParallel
(loader.py:124-141).  Here the first-class design is a jax.sharding Mesh
with named axes:

  * ``data``  — batch-parallel axis (DCN across hosts, ICI within);
  * ``edge``  — edge-partition axis for the E-dimension tensors of the
    Hodge stack (GSPMD path: parallel/dp.py; explicit ring collectives:
    parallel/ring.py; K/cell-axis sharding: parallel/kaxis.py).

All training/sampling functions are ordinary jitted functions; placing
sharded inputs (NamedSharding) makes XLA insert the psum/all-gather
collectives automatically (GSPMD).  The Langevin corrector's batch-coupled
norms (solver.py:695-699) therefore match single-device semantics exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n devices (default: all).

    Devices are ordered process-major so that in multi-controller mode the
    'data' axis spans hosts contiguously (each host's batch shard lands on
    its own chips; gradient psums ride DCN between hosts).
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], *arrays, specs=None):
    """Device-put arrays with batch sharding (no-op without a mesh).

    Multi-process (multi-controller) mode: each process passes its own rows
    of the global batch (the host-sharded ArrayDataset yields exactly those)
    and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the DCN path that replaces
    the reference's single-process DataParallel scatter.

    Single-process: batches whose leading dim does not divide the 'data'
    axis (e.g. a ragged final batch) are placed replicated instead —
    correctness over speed for the stragglers.

    ``specs`` optionally gives a PartitionSpec per array (e.g. the rank-2
    tensor over ('data', 'edge', 'cell') on a multi-axis train.mesh); any
    dimension that does not divide its mesh axis falls back to the default
    batch sharding for that array.
    """
    import jax.numpy as jnp

    if jax.process_count() > 1:
        from ccsd_tpu.parallel.multihost import shard_host_batch

        assert mesh is not None
        return shard_host_batch(mesh, *arrays)
    if mesh is None or mesh.size == 1:
        return tuple(jnp.asarray(a) for a in arrays)
    n_data = mesh.shape.get("data", mesh.size)
    if specs is None:
        specs = [None] * len(arrays)
    out = []
    for a, spec in zip(arrays, specs):
        if np.shape(a)[0] % n_data != 0:
            out.append(jax.device_put(jnp.asarray(a), replicated(mesh)))
            continue
        if spec is not None and all(
            ax is None or np.shape(a)[d] % mesh.shape[ax] == 0
            for d, ax in enumerate(spec)
        ):
            out.append(jax.device_put(a, NamedSharding(mesh, spec)))
        else:
            out.append(jax.device_put(a, data_sharding(mesh, np.ndim(a))))
    return tuple(out)


def replicate_tree(mesh: Optional[Mesh], tree):
    import jax.numpy as jnp

    if mesh is None or mesh.size == 1:
        return jax.tree.map(jnp.asarray, tree)
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)
