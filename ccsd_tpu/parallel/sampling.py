"""Sharded sampling: the PC/S4 reverse diffusion over a device mesh.

The charter's north-star metric is SAMPLER edges/s at 1 chip / 1 host /
N hosts, but the reference sampler is strictly single-device
(ccsd/src/sampler.py:92-366 — its only batch mechanism is the sequential
`divide_batch` sub-batching, sampler.py:132).  This module is the new
distributed design: the scanned sampler is a pure function of
(init_flags, key), so jitting it with NamedShardings over a Mesh makes
GSPMD shard the whole reverse diffusion —

  * batch axis over 'data' (multi-host: each process feeds its local rows,
    parallel/multihost.shard_host_batch);
  * the rank-2 E axis over 'edge' when the mesh has one (the (B, E, K)
    carry, its noise, and the Hodge matmuls partition; XLA inserts the
    all-gathers/psums on ICI);
  * the Langevin corrector's batch-coupled grad/noise norms
    (solver.py:695-699) lower to psums over 'data', preserving exact
    single-device semantics (verified in tests/parallel/test_sharding.py).

Used by sampling/sampler.py + sampling/mol_sampler.py via the
``sample.mesh`` config key (e.g. ``mesh: {data: 4, edge: 2}``) and by
__graft_entry__.dryrun_multichip's sampling leg.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccsd_tpu.diffusion.solvers import SamplerOutput


def mesh_from_config(sample_cfg) -> Optional[Mesh]:
    """Build a Mesh from ``sample.mesh`` ({axis: size}) if configured.

    ``sample.mesh: auto`` uses all visible devices on one 'data' axis.
    Returns None when unconfigured or the resulting mesh would be trivial.
    """
    from ccsd_tpu.parallel.mesh import make_mesh

    spec = sample_cfg.get("mesh") if hasattr(sample_cfg, "get") else None
    if not spec:
        return None
    if spec == "auto":
        n = len(jax.devices())
        return make_mesh(n, ("data",)) if n > 1 else None
    axes = tuple(str(a) for a in spec.keys())
    shape = tuple(int(v) for v in spec.values())
    n = int(np.prod(shape))
    if n <= 1:
        return None
    if n > len(jax.devices()):
        raise ValueError(
            f"sample.mesh asks for {n} devices, only {len(jax.devices())} visible"
        )
    return make_mesh(n, axes, shape)


def jit_sharded_sampling(
    mesh: Mesh,
    sampling_fn: Callable,
    score_fns: Sequence[Callable],
    is_cc: bool,
) -> Callable:
    """Jit ``sampling_fn(*score_fns, flags, key)`` with mesh shardings.

    flags arrive batch-sharded over 'data'; outputs leave batch-sharded
    (and the rank-2 tensor edge-sharded when the mesh has an 'edge' axis),
    so a host fetching results pulls each shard over its own ICI/PCI link.

    Caveat (jax semantics): the edge-sharded OUTPUT array only
    materializes when E is divisible by the 'edge' axis size; otherwise
    GSPMD still pads-and-shards the interior scan but gathers the final
    array to edge-replicated layout.  Pick an 'edge' size dividing
    E = N(N-1)/2 (verified at ego_small_CC's real E=153 with edge=3 in
    tests/parallel/test_sharded_sampling.py).
    """
    repl = NamedSharding(mesh, P())
    data2 = NamedSharding(mesh, P("data", None))
    data3 = NamedSharding(mesh, P("data", None, None))
    has_edge = "edge" in mesh.axis_names
    rank2_sh = NamedSharding(mesh, P("data", "edge" if has_edge else None, None))

    def fn(flags, key):
        out = sampling_fn(*score_fns, flags, key)
        # constrain the big tensors' layouts; GSPMD propagates backward
        # through the scan so the carry itself is sharded the same way
        x = jax.lax.with_sharding_constraint(out.x, data3)
        adj = jax.lax.with_sharding_constraint(out.adj, data3)
        rank2 = out.rank2
        if is_cc and rank2 is not None:
            rank2 = jax.lax.with_sharding_constraint(rank2, rank2_sh)
        return SamplerOutput(x, adj, rank2, out.n_model_evals, out.trajectory)

    return jax.jit(fn, in_shardings=(data2, repl))


def shard_sampling_flags(mesh: Optional[Mesh], flags):
    """Place an init-flags batch on the mesh (multi-host aware).

    Single-process: device_put with batch sharding.  Multi-controller:
    every process builds the same GLOBAL flags array (same seed), passes
    it here, and only its local rows are used to assemble the global
    sharded array over DCN.
    """
    import jax.numpy as jnp

    if mesh is None:
        return jnp.asarray(flags)
    if jax.process_count() > 1:
        from ccsd_tpu.parallel.multihost import shard_host_batch

        per = flags.shape[0] // jax.process_count()
        lo = jax.process_index() * per
        (out,) = shard_host_batch(mesh, np.asarray(flags)[lo:lo + per])
        return out
    from ccsd_tpu.parallel.mesh import shard_batch

    (out,) = shard_batch(mesh, flags)
    return out
