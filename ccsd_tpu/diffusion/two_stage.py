"""Two-stage open-universe CC sampling: (X, A) first, then F | A.

The reference (and our joint CC sampler) diffuses F over a FIXED global cell
universe of K = sum_k C(N, k) columns — intractable for ZINC-scale configs
(K ~ 1e11, config/zinc250k_CC.yaml; SURVEY.md §2.6 "scale cliff") and, in the
active-cell variant, restricted to cells observed in training.  This module
implements the factorization p(X, A, F) = p(X, A) · p(F | A):

  stage 1  sample (X, A) with the standard graph PC sampler
           (ccsd/src/solver.py:856-1176 semantics);
  bridge   quantize A on host and enumerate each sample's CANDIDATE rank-2
           cells from its own adjacency with the dataset's lifting procedure
           (cycles / path-based — ccsd/src/utils/cc_utils.py:1644-1754), then
           pad to a static K_max slot budget;
  stage 2  reverse-diffuse F over only those per-sample candidate columns,
           with per-sample membership masks (ops/masks.py
           mask_rank2_dynamic) replacing the global spec masks.

The F-score network (ScoreNetworkF) conditions on A only through the
candidate universe — exactly as in the joint model, where it ignores
(x, adj) entirely (ccsd/src/models/ScoreNetwork_F.py:120-147).

No reference counterpart: this is new TPU-era design (DESIGN_NOTES.md
"Open problem: ZINC-scale rank-2 representation", option 2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import networkx as nx
import numpy as np

import jax
import jax.numpy as jnp

from ccsd_tpu.diffusion.sde import SDE, _bcast, reverse_discretize, reverse_sde
from ccsd_tpu.diffusion.solvers import _batch_norm_mean
from ccsd_tpu.ops.cells import ComplexSpec
from ccsd_tpu.ops.masks import (
    gen_noise_rank2_dynamic,
    mask_rank2_dynamic,
    quantize,
)


@dataclass(frozen=True)
class DynamicCells:
    """Per-sample candidate-cell universe, padded to a static slot budget.

    member: (B, K_max, N) float32 0/1 — slot k of sample b contains node n.
    valid:  (B, K_max) float32 0/1 — slot is a real candidate (not padding).
    cell_lists: optional per-sample tuples of node tuples (slot order) —
    host-side metadata used to decode generated incidences back into CCs.
    """

    member: jnp.ndarray
    valid: jnp.ndarray
    cell_lists: Optional[tuple] = None

    @property
    def k_max(self) -> int:
        return self.member.shape[1]


# --------------------------------------------------------------- bridge -----

def candidate_cells_from_graph(
    g: nx.Graph,
    d_min: int,
    d_max: int,
    lifting_procedure: str = "cycles",
    path_source_nodes: Optional[Sequence[int]] = None,
    path_length: Optional[int] = None,
) -> List[Tuple[int, ...]]:
    """Candidate rank-2 cells of one generated graph, per lifting procedure.

    `cycles`: cycle-basis cycles with d_min <= |cycle| <= d_max (the
    molecule/community lifting); `path_based`: simple paths of
    `path_length` nodes from `path_source_nodes` (default: all nodes),
    filtered to [d_min, d_max] (cc_utils.py:1692-1724 semantics).
    """
    cells: set = set()
    if lifting_procedure == "cycles":
        for cyc in nx.cycle_basis(g):
            if d_min <= len(cyc) <= d_max:
                cells.add(tuple(sorted(cyc)))
    elif lifting_procedure == "path_based":
        from collections import defaultdict

        from ccsd_tpu.data.lifts import get_all_paths_from_nodes

        adj_list = defaultdict(list)
        for u, v in g.edges:
            adj_list[u].append(v)
            adj_list[v].append(u)
        sources = (
            list(path_source_nodes)
            if path_source_nodes is not None
            else list(g.nodes)
        )
        length = path_length if path_length is not None else d_max
        for path in get_all_paths_from_nodes(sources, adj_list, length):
            if d_min <= len(path) <= d_max:
                cells.add(tuple(sorted(path)))
    else:
        raise NotImplementedError(
            f"Lifting procedure {lifting_procedure} not supported."
        )
    return sorted(cells, key=lambda c: (len(c), c))


def dynamic_cells_from_adjs(
    adjs: np.ndarray,
    d_min: int,
    d_max: int,
    k_max: Optional[int] = None,
    lifting_procedure: str = "cycles",
    **lift_kwargs,
) -> DynamicCells:
    """Host bridge: quantized adjacencies -> per-sample candidate universes.

    adjs: (B, N, N) 0/1.  Slots beyond a sample's candidate count are
    zero/invalid; candidates beyond `k_max` are dropped (largest-first
    enumeration order is deterministic).  Returns device-ready arrays.
    """
    adjs = np.asarray(adjs)
    B, N, _ = adjs.shape
    per_sample: List[List[Tuple[int, ...]]] = []
    for b in range(B):
        g = nx.from_numpy_array(adjs[b])
        g.remove_nodes_from(list(nx.isolates(g)))
        per_sample.append(
            candidate_cells_from_graph(
                g, d_min, d_max, lifting_procedure, **lift_kwargs
            )
        )
    return _pack_cells(per_sample, N, k_max)


def _pack_cells(
    per_sample: List[List[Tuple[int, ...]]], N: int, k_max: Optional[int]
) -> DynamicCells:
    B = len(per_sample)
    K = max(max((len(c) for c in per_sample), default=1), 1)
    if k_max is not None:
        K = max(1, min(K, k_max))
    member = np.zeros((B, K, N), dtype=np.float32)
    valid = np.zeros((B, K), dtype=np.float32)
    kept = []
    for b, cells in enumerate(per_sample):
        kept.append(tuple(cells[:K]))
        for j, cell in enumerate(cells[:K]):
            member[b, j, list(cell)] = 1.0
            valid[b, j] = 1.0
    return DynamicCells(
        member=jnp.asarray(member), valid=jnp.asarray(valid),
        cell_lists=tuple(kept),
    )


def dynamic_batch_from_ccs(
    ccs,
    spec: ComplexSpec,
    d_min: int,
    d_max: int,
    k_max: Optional[int] = None,
    lifting_procedure: str = "cycles",
    **lift_kwargs,
) -> Tuple[jnp.ndarray, DynamicCells]:
    """Training batch for the stage-2 model from a CC dataset.

    For each CC: universe = candidate cells enumerated from ITS OWN graph
    adjacency (the exact bridge used at sampling time); target F = 1 on the
    edges of candidates that are ACTUAL rank-2 cells of the CC, 0 for
    candidate-but-absent cells.
    Returns (adjs (B, N, N), rank2_target (B, E, K_max), dyn).
    """
    N = spec.N
    adjs = np.zeros((len(ccs), N, N), np.float32)
    actual: List[set] = []
    for b, cc in enumerate(ccs):
        for e in cc.cells.hyperedge_dict.get(1, {}):
            u, v = tuple(e)
            adjs[b, u, v] = adjs[b, v, u] = 1.0
        actual.append({
            tuple(sorted(c)) for c in cc.cells.hyperedge_dict.get(2, {})
        })
    per_sample = []
    for b in range(len(ccs)):
        g = nx.from_numpy_array(adjs[b])
        g.remove_nodes_from(list(nx.isolates(g)))
        per_sample.append(candidate_cells_from_graph(
            g, d_min, d_max, lifting_procedure, **lift_kwargs
        ))
    dyn = _pack_cells(per_sample, N, k_max)
    # zero the valid-but-absent columns of the all-candidates incidence
    F_all = incidence_from_dynamic(jnp.asarray(adjs), spec, dyn)
    present = np.zeros(dyn.valid.shape, np.float32)
    for b, cells in enumerate(dyn.cell_lists):
        for j, cell in enumerate(cells):
            if cell in actual[b]:
                present[b, j] = 1.0
    rank2 = F_all * jnp.asarray(present)[:, None, :]
    return jnp.asarray(adjs), rank2, dyn


def incidence_from_dynamic(
    adjs: jnp.ndarray, spec: ComplexSpec, dyn: DynamicCells
) -> jnp.ndarray:
    """Clean F for (adjs, universe): F[b, e, k] = 1 iff edge e exists in
    adjs[b] and both endpoints are members of candidate cell k.

    Vectorized form of create_incidence_1_2 (cc_utils.py:99-153) over a
    per-sample universe.
    """
    u = jnp.asarray(spec.edge_u)
    v = jnp.asarray(spec.edge_v)
    edge_present = adjs[:, u, v]  # (B, E)
    # edge e = (u, v) lies inside cell k iff both endpoints are members
    in_cell = dyn.member[:, :, u] * dyn.member[:, :, v]  # (B, K, E)
    return (
        edge_present[:, :, None]
        * jnp.swapaxes(in_cell, 1, 2)
        * dyn.valid[:, None, :]
    )


def ccs_from_two_stage(
    x: np.ndarray,
    adj_q: np.ndarray,
    rank2_q: np.ndarray,
    dyn: DynamicCells,
    spec: ComplexSpec,
    is_molecule: bool = False,
):
    """Decode generated (x, A, F-over-candidates) into CombinatorialComplexes.

    Per-sample analogue of cc_from_incidence (cc_utils.py:156-265): rank-2
    columns are looked up in the sample's own candidate list.  With
    ``is_molecule`` the cells carry the molecule attribute schema the CC
    evaluators expect (cc_from_incidence is_molecule semantics): rank-0
    ``symbol`` = atomic number of the argmax atom type, rank-1 ``bond_type``
    = the quantized bond order in adj_q.
    """
    from ccsd_tpu.data.complex import CombinatorialComplex

    if is_molecule:
        from ccsd_tpu.data.cc_codec import DIC_MOL_CONV, SYMBOL_TO_AN

    assert dyn.cell_lists is not None, "bridge must keep cell_lists"
    u, v = np.asarray(spec.edge_u), np.asarray(spec.edge_v)
    out = []
    for b in range(adj_q.shape[0]):
        cc = CombinatorialComplex()
        A = np.asarray(adj_q[b])
        # rank-0 cells for the contiguous active prefix (samplers mask the
        # node suffix, so ids 0..n_max-1 keep the eval codecs' convention
        # of contiguous node numbering)
        active = np.nonzero(A.any(axis=0))[0]
        n_max = int(active[-1]) + 1 if active.size else 0
        for n in range(n_max):
            if is_molecule:
                an = SYMBOL_TO_AN[DIC_MOL_CONV[int(np.argmax(x[b, n]))]]
                cc.add_cell((n,), rank=0, symbol=an)
            else:
                cc.add_cell((n,), rank=0, weight=1)
        for i in np.nonzero(A[u, v])[0]:
            edge = (int(u[i]), int(v[i]))
            if is_molecule:
                cc.add_cell(edge, rank=1, bond_type=float(A[u[i], v[i]]))
            else:
                cc.add_cell(edge, rank=1, weight=1)
        for j, cell in enumerate(dyn.cell_lists[b]):
            if np.asarray(rank2_q[b, :, j]).any():
                cc.add_cell(tuple(int(n) for n in cell), rank=2, weight=1)
        out.append(cc)
    return out


# --------------------------------------------------------- stage-2 sampler --

def get_rank2_sampler(
    sde_rank2: SDE,
    spec: ComplexSpec,
    predictor: str = "Euler",
    corrector: str = "Langevin",
    snr: float = 0.1,
    scale_eps: float = 1.0,
    n_steps: int = 1,
    probability_flow: bool = False,
    denoise: bool = True,
    eps: float = 1e-3,
) -> Callable:
    """Scanned reverse diffusion over F alone, with per-sample cell masks.

    Returns ``sampler(score_fn, dyn, init_flags, key, shape)`` where
    ``score_fn(rank2, flags, t)`` is the stage-2 score (the F-model closure
    with the dynamic universe folded in).
    """
    diff_steps = sde_rank2.N
    timesteps = jnp.linspace(sde_rank2.T, eps, diff_steps)
    rev_sde = reverse_sde(sde_rank2, probability_flow)
    rev_disc = reverse_discretize(sde_rank2, probability_flow)

    def sampler(score_fn, dyn: DynamicCells, init_flags, key, shape):
        flags = init_flags
        kp, kscan = jax.random.split(key)
        noise = lambda k, v: gen_noise_rank2_dynamic(
            k, v, spec, dyn.member, dyn.valid, flags
        )
        v = mask_rank2_dynamic(
            sde_rank2.prior_sampling(kp, tuple(shape)),
            spec, dyn.member, dyn.valid, flags,
        )

        def step(carry, it):
            v, _ = carry
            i, t = it
            vec_t = jnp.full((shape[0],), t)
            k = jax.random.fold_in(kscan, i)
            ks = jax.random.split(k, n_steps + 1)

            # corrector (Langevin, solver.py:600-807 semantics)
            if corrector == "Langevin":
                for s in range(n_steps):
                    score = score_fn(v, flags, vec_t)
                    z = noise(jax.random.fold_in(ks[s], 1), v)
                    alpha = sde_rank2.alpha_of_t(vec_t)
                    # guard: a batch whose candidate universes are all empty
                    # has zero score AND noise norms — the step collapses to
                    # 0 instead of NaN (the noise is masked identically)
                    grad_norm = jnp.maximum(_batch_norm_mean(score), 1e-12)
                    step_size = (
                        (snr * _batch_norm_mean(z) / grad_norm)
                        ** 2 * 2 * alpha
                    )
                    v_mean = v + _bcast(step_size, v) * score
                    v = v_mean + _bcast(
                        jnp.sqrt(step_size * 2), v
                    ) * z * scale_eps
            elif corrector != "None":
                raise NotImplementedError(
                    f"Corrector {corrector} not supported."
                )

            # predictor
            score = score_fn(v, flags, vec_t)
            z = noise(ks[-1], v)
            if predictor == "Euler":
                dt = -1.0 / diff_steps
                drift, diffusion = rev_sde(v, vec_t, score)
                v_mean = v + drift * dt
                v = v_mean + _bcast(diffusion, v) * (-dt) ** 0.5 * z
            elif predictor == "Reverse":
                f, G = rev_disc(v, vec_t, score)
                v_mean = v - f
                v = v_mean + _bcast(G, v) * z
            else:
                raise NotImplementedError(
                    f"Predictor {predictor} not supported."
                )
            return (v, v_mean), None

        init = (v, jnp.zeros_like(v))
        (v, v_mean), _ = jax.lax.scan(
            step, init, (jnp.arange(diff_steps), timesteps)
        )
        return v_mean if denoise else v

    return sampler


# ------------------------------------------------------------ orchestrator --

def two_stage_sample(
    graph_sampler: Callable,
    score_fn_x: Callable,
    score_fn_adj: Callable,
    rank2_sampler: Callable,
    f_model,
    f_params,
    sde_rank2: SDE,
    spec: ComplexSpec,
    init_flags: jnp.ndarray,
    key: jax.Array,
    d_min: int,
    d_max: int,
    k_max: Optional[int] = None,
    lifting_procedure: str = "cycles",
    quantize_thr: float = 0.5,
    **lift_kwargs,
):
    """Full two-stage generation.  Returns (x, adj, rank2, dyn).

    graph_sampler: a jitted graph-mode PC sampler (get_pc_sampler output);
    rank2_sampler: get_rank2_sampler output.  The bridge (quantize +
    candidate enumeration) runs on host between the two device programs —
    inherently data-dependent, like the reference's host-side lifting.
    """
    from ccsd_tpu.diffusion.losses import get_score_fn_rank2_dynamic

    k1, k2 = jax.random.split(key)
    out = graph_sampler(score_fn_x, score_fn_adj, init_flags, k1)
    adj_q = quantize(out.adj, quantize_thr)

    dyn = dynamic_cells_from_adjs(
        np.asarray(adj_q), d_min, d_max, k_max, lifting_procedure,
        **lift_kwargs,
    )
    B = adj_q.shape[0]
    shape = (B, spec.num_edges, dyn.k_max)
    score_fn = get_score_fn_rank2_dynamic(sde_rank2, f_model, f_params, dyn)
    rank2 = rank2_sampler(score_fn, dyn, init_flags, k2, shape)
    return out.x, adj_q, rank2, dyn
