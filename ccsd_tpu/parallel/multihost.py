"""Multi-host (multi-controller) distributed layer: DCN x ICI meshes.

The reference has NO multi-process mechanism at all (its only multi-device
path is single-process ``torch.nn.DataParallel``,
ccsd/src/utils/loader.py:124-141).  This module is the TPU-native design the
rebuild was chartered to invent (SURVEY.md §2.11, §5.8): one JAX mesh
spanning every chip of every host, with

  * the ``data`` (batch-parallel) axis laid out ACROSS processes — gradient
    psums ride DCN between hosts and ICI within a host;
  * the ``edge`` (E-partition) axis laid out WITHIN a process — the
    all-gather / ppermute traffic of the E-sharded Hodge ops stays on ICI.

Entry contract: every process runs the same program; call
:func:`initialize` first (wraps ``jax.distributed.initialize``), build the
mesh with :func:`global_mesh`, and feed per-host batch shards through
:func:`shard_host_batch` (``jax.make_array_from_process_local_data``).  The
Trainer does all of this automatically when ``jax.process_count() > 1``.

Host-sharded data loading: :class:`ArrayDataset` (data/loader.py) takes
``process_index``/``process_count`` and yields only this host's rows of each
global batch, using one shared permutation seed so the assembled global
batch is bit-identical to the single-process run — asserted by the
2-process x 4-device CPU equivalence test (tests/parallel/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Start the JAX distributed runtime (idempotent).

    Arguments default to the environment (``CCSD_COORDINATOR``,
    ``CCSD_NUM_PROCESSES``, ``CCSD_PROCESS_ID``), falling back to JAX's own
    auto-detection on managed TPU pods (where all three may be None).
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "CCSD_COORDINATOR")
    if num_processes is None and os.environ.get("CCSD_NUM_PROCESSES"):
        num_processes = int(os.environ["CCSD_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CCSD_PROCESS_ID"):
        process_id = int(os.environ["CCSD_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def should_initialize() -> bool:
    """True when the env asks for multi-process mode (CCSD_NUM_PROCESSES>1)."""
    return int(os.environ.get("CCSD_NUM_PROCESSES", "1")) > 1


def global_mesh(
    axis_names: Sequence[str] = ("data", "edge"),
    edge_size: int = 1,
):
    """Mesh over ALL processes' devices, process-major on the 'data' axis.

    ``edge_size`` chips of each host form the 'edge' axis (must divide the
    local device count) so edge-partition collectives never leave ICI; the
    remaining parallelism is 'data'.  With one process this reduces to an
    ordinary single-host mesh.
    """
    import jax
    from jax.sharding import Mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    local = jax.local_device_count()
    if local % edge_size != 0:
        raise ValueError(
            f"edge_size {edge_size} must divide local device count {local}"
        )
    arr = np.array(devices).reshape(len(devices) // edge_size, edge_size)
    if len(axis_names) == 1:
        arr = arr.reshape(-1)
    return Mesh(arr, tuple(axis_names))


def shard_host_batch(mesh, *local_arrays) -> Tuple:
    """Assemble global device arrays from per-host batch shards.

    Every process passes its own rows (1/process_count of the global batch,
    in process order); returns jax.Arrays sharded P('data', ...) whose
    global value equals the concatenation over processes.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    nproc = jax.process_count()
    out = []
    for a in local_arrays:
        a = np.asarray(a)
        sharding = NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        gshape = (a.shape[0] * nproc,) + a.shape[1:]
        out.append(
            jax.make_array_from_process_local_data(sharding, a, gshape)
        )
    return tuple(out)


def process_local_rows(global_rows: np.ndarray) -> np.ndarray:
    """This process's contiguous block of a global batch's row indices."""
    import jax

    nproc = jax.process_count()
    pid = jax.process_index()
    per = len(global_rows) // nproc
    return global_rows[pid * per:(pid + 1) * per]
