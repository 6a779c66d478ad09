#!/usr/bin/env python
"""Ring vs GSPMD edge-partitioned Hodge attention at real scale.

VERDICT round-1 item 5: exercise parallel/ring.py at E in {703, 1176}
(ZINC250k's N=38 and grid's N=49 edge counts) on the virtual 8-device CPU
mesh, assert equivalence against the dense single-device path, time all
three, and inspect the optimized HLO of the ring program for async
collective-permute scheduling (start/done separation with the block matmul
in between = the compiler can overlap the hop with compute).

The hardware caveat is recorded with the results: with one physical chip,
true ICI overlap cannot be profiled; the CPU-mesh run proves correctness
at scale, and the HLO inspection only *suggests* whether overlap is
possible (textual heuristics over the optimized module, not the final
schedule).  The ring body is 1-deep software-pipelined by construction:
the ppermute of the resident block is issued BEFORE the block matmul that
consumes it (ring.py:51-59) — but the CPU backend emits NO async
collective-permute start/done pairs at all (measured round 2: 0/0 at both
shapes), i.e. XLA:CPU serializes the hop.  Whether XLA:TPU schedules the
async pair around the dot is checked separately by AOT-compiling for a
multi-chip TPU topology (see --tpu-hlo).

Run:  python tools/ring_bench.py            (forces 8-device CPU mesh)
"""

from __future__ import annotations

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ccsd_tpu.models.hodge_nn import HodgeAttention
from ccsd_tpu.parallel.ring import hodge_attention_sharded

P_EDGE = 8
NUM_HEADS, ATTN = 4, 16


def count_async_permutes(hlo: str):
    """Count async collective-permute op DEFINITIONS.

    Definitions carry an argument list ("collective-permute-start(%op)");
    operand references inside -done lines and get-tuple-element users are
    bare names ("%collective-permute-start.5") with no open paren, so
    counting the paren form counts definitions exactly (round-2 ADVICE fix:
    plain substring count inflated starts via operand references).
    """
    return (hlo.count("collective-permute-start("),
            hlo.count("collective-permute-done("))


def tpu_hlo_check(B: int = 4, E: int = 704, K: int = 466):
    """AOT-compile the ring program for an 8-chip TPU v5e topology (no
    devices needed) and report whether XLA:TPU emits async collective-permute
    start/done pairs with compute scheduled between them.

    Measured result (round 3, jax 0.9.0, v5e:2x4): 7 async start/done pairs
    (3 ring_gather_matmuls + 4 per-head ring_scores), each with 2
    dots/fusions between the start and its done in the optimized module —
    the XLA:CPU 0/0 observation was a backend artifact, not a property of
    the ring program.
    """
    import re

    import jax.numpy as jnp
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    mesh = Mesh(np.array(topo.devices).reshape(P_EDGE), ("edge",))
    attn = HodgeAttention(K, ATTN, K, num_heads=NUM_HEADS, conv="HCN")
    params = jax.eval_shape(lambda: attn.init(jax.random.PRNGKey(0)))
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), params)
    sh = NamedSharding(mesh, P(None, "edge", None))
    hs = jax.ShapeDtypeStruct((B, E, E), jnp.float32, sharding=sh)
    rs = jax.ShapeDtypeStruct((B, E, K), jnp.float32, sharding=sh)
    ring = jax.jit(
        jax.shard_map(
            lambda p, h, r: hodge_attention_sharded(
                p, h, r, "edge", NUM_HEADS, ATTN, K),
            mesh=mesh,
            in_specs=(P(), P(None, "edge", None), P(None, "edge", None)),
            out_specs=(P(None, "edge", None), P(None, "edge", None)),
            check_vma=False,
        )
    )
    hlo = ring.lower(params, hs, rs).compile().as_text()
    starts, dones = count_async_permutes(hlo)
    lines = hlo.splitlines()
    si = [i for i, l in enumerate(lines) if "collective-permute-start(" in l]
    di = [i for i, l in enumerate(lines) if "collective-permute-done(" in l]
    between = []
    for s in si:
        d = min([x for x in di if x > s], default=None)
        if d is not None:
            between.append(sum(1 for l in lines[s + 1:d]
                               if " dot(" in l or "fusion" in l))
    print(f"TPU v5e:2x4 AOT HLO: async permute start/done {starts}/{dones}; "
          f"dots/fusions between each start..done pair: {between}")
    return starts, dones, between


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_shape(B: int, E: int, K: int):
    # pad E to a multiple of the mesh so every shard is equal (the model
    # wrapper pads the same way; zero rows are masked downstream)
    E_pad = ((E + P_EDGE - 1) // P_EDGE) * P_EDGE
    mesh = Mesh(np.array(jax.devices()).reshape(P_EDGE), ("edge",))
    key = jax.random.PRNGKey(0)
    attn = HodgeAttention(K, ATTN, K, num_heads=NUM_HEADS, conv="HCN")
    params = attn.init(key)
    hodge = jax.random.normal(jax.random.PRNGKey(1), (B, E_pad, E_pad))
    hodge = (hodge + jnp.swapaxes(hodge, -1, -2)) / 2
    rank2 = jax.random.normal(jax.random.PRNGKey(2), (B, E_pad, K))

    dense = jax.jit(lambda h, r: attn.apply(params, h, r, None))
    t_dense = timeit(dense, hodge, rank2)
    v_ref, a_ref = dense(hodge, rank2)

    # GSPMD: same dense program, inputs sharded on E rows; XLA inserts
    # the all-gathers
    sh = NamedSharding(mesh, P(None, "edge", None))
    gspmd = jax.jit(
        lambda h, r: attn.apply(params, h, r, None),
        in_shardings=(sh, sh), out_shardings=(sh, sh),
    )
    h_s, r_s = jax.device_put(hodge, sh), jax.device_put(rank2, sh)
    t_gspmd = timeit(gspmd, h_s, r_s)
    v_g, a_g = gspmd(h_s, r_s)

    ring = jax.jit(
        jax.shard_map(
            lambda h, r: hodge_attention_sharded(
                params, h, r, "edge", NUM_HEADS, ATTN, K),
            mesh=mesh,
            in_specs=(P(None, "edge", None), P(None, "edge", None)),
            out_specs=(P(None, "edge", None), P(None, "edge", None)),
            check_vma=False,
        )
    )
    t_ring = timeit(ring, h_s, r_s)
    v_r, a_r = ring(h_s, r_s)

    for name, got in (("gspmd", (v_g, a_g)), ("ring", (v_r, a_r))):
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(v_ref), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(a_ref), rtol=2e-4, atol=2e-4)

    # per-device resident bytes (the memory story: ring never holds E_full
    # on the K-sized tensors; the (E_loc, E_full) dual rows dominate)
    loc = E_pad // P_EDGE
    ring_bytes = 4 * B * (loc * E_pad + loc * K)
    dense_bytes = 4 * B * (E_pad * E_pad + E_pad * K)

    hlo = ring.lower(h_s, r_s).compile().as_text()
    starts, dones = count_async_permutes(hlo)
    print(f"E={E} (pad {E_pad}) K={K} B={B}: dense {t_dense*1e3:.0f} ms | "
          f"gspmd {t_gspmd*1e3:.0f} ms | ring {t_ring*1e3:.0f} ms | "
          f"equivalence OK | per-dev input bytes ring {ring_bytes/1e6:.1f} MB"
          f" vs dense {dense_bytes/1e6:.1f} MB | "
          f"HLO async permute start/done: {starts}/{dones}")
    return hlo


def main():
    if "--tpu-hlo" in sys.argv:
        tpu_hlo_check()
        return
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")
    bench_shape(B=4, E=703, K=466)
    hlo = bench_shape(B=2, E=1176, K=467)
    # structural check, heuristic only: a dot between a permute-start and its
    # -done in HLO text order SUGGESTS the scheduler may overlap the hop with
    # the block matmul; text order is not the final schedule, so this cannot
    # prove overlap (use profiler traces on real multi-chip hardware for that)
    lines = hlo.splitlines()
    start_idx = [i for i, l in enumerate(lines)
                 if "collective-permute-start" in l]
    if start_idx:
        i = start_idx[0]
        window = lines[i:i + 12]
        has_dot = any(" dot(" in l or " = dot" in l for l in window)
        print("ops within 12 HLO lines after first permute-start include a "
              f"dot (heuristic, not proof of overlap): {has_dot}")


if __name__ == "__main__":
    main()
