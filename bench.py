#!/usr/bin/env python
"""Headline benchmark: PC-sampler throughput, one chip.

Prints ONE JSON line.  Primary metric (driver contract):
  {"metric": "sampler_edges_per_s_per_chip", "value": N, "unit": "edges/s",
   "vs_baseline": N / REF_BASELINE_EDGES_PER_S, ...}
The same object carries the CC-sampler hot loop (community_small_CC shapes,
3 models, E=190, K=1140) and the measured model-FLOP utilisation (MFU) of
both loops so BENCH_r* tracks every throughput surface (VERDICT round 1,
"harden the bench contract").

Protocol (matches the reference's sampling hot loop, SURVEY.md section 3.2):
graph loop = ScoreNetworkX + ScoreNetworkA at gdss_community_small
checkpoint shapes (N=20 nodes, F=10 features), batch 128, 1000
reverse-diffusion steps with Euler predictor + 1-step Langevin corrector
=> 4 model evals per step, exactly like the reference.  CC loop =
ScoreNetworkX + ScoreNetworkA_CC + ScoreNetworkF at ccsd_community_small_CC
shapes => 6 evals per step.  edges/s = B * C(N,2) * steps / time.

Baselines: the reference PyTorch samplers (ccsd/src/solver.py pc_sampler)
run from the shipped checkpoints on this host's CPU — the only hardware the
single-process reference supports here — measured at 1.86 steps/s (graph,
537 ms/step) and 0.0454 steps/s (CC, 22.04 s/step), batch 128 (BASELINE.md).

Staleness contract: if the TPU tunnel wedges, the watchdog emits
value=null + stale=true and keeps the last good measurement under
"stale_record" (with its "measured_at" timestamp) — a driver scanning only
"value" can never mistake a cached number for a fresh one.
"""

from __future__ import annotations

import datetime
import json
import os
import threading
import time

REF_BASELINE_EDGES_PER_S = 45_290.0  # reference torch CPU, graph loop
REF_BASELINE_CC_STEPS_PER_S = 1.0 / 22.04  # reference torch CPU, CC loop

B, N, F = 128, 20, 10
STEPS = 1000
# CCSD_BENCH_SMOKE=1: tiny-shape flow validation on CPU (2 steps, small
# batches) — numbers are meaningless, only the plumbing is checked
_SMOKE = os.environ.get("CCSD_BENCH_SMOKE") == "1"
if _SMOKE:
    B, STEPS = 4, 2
REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "bench_cache.json")

# MXU peak for MFU.  Models run fp32; on TPU v5e the MXU executes fp32
# matmuls via bf16x3 passes, so the honest dense-math ceiling for this
# workload is the bf16 peak (197 TFLOP/s) — MFU reported against that is
# conservative (a pure-bf16 port could only look better).
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12}
# HBM peak for the bandwidth speed-of-light accounting (round-4 verdict
# next #4): v5e has 819 GB/s per chip.  Memory-bound legs are judged by
# achieved-GB/s / this, not by FLOP-MFU.
PEAK_HBM = {"TPU v5 lite": 819e9, "TPU v5e": 819e9}


def _watchdog(seconds: float) -> None:
    """The axon TPU tunnel can wedge indefinitely (DESIGN_NOTES.md); if the
    measurement exceeds the deadline, emit value=null (never a number) and
    attach the last good measurement as stale_record."""

    def fire():
        time.sleep(seconds)
        record = {
            "metric": "sampler_edges_per_s_per_chip",
            "value": None,
            "unit": "edges/s",
            "vs_baseline": None,
            "stale": True,
            "error": "TPU unavailable at bench time",
        }
        if os.path.exists(CACHE):
            try:
                with open(CACHE) as f:
                    cached = json.load(f)
                record["stale_record"] = cached
                record["stale_value"] = cached.get("value")
                record["note"] = (
                    "last good measurement attached as stale_record "
                    f"(measured_at {cached.get('measured_at')})"
                )
            except (OSError, ValueError):
                pass
        print(json.dumps(record), flush=True)
        os._exit(0)

    t = threading.Thread(target=fire, daemon=True)
    t.start()


def _compiled_flops(fn, *args):
    """Analytic FLOPs of one call, via XLA cost analysis.

    NOTE: cost analysis counts a lax.scan/while body ONCE regardless of trip
    count, so callers must analyze a single model eval and multiply by
    (evals per step) * (diffusion steps) — never analyze the scanned sampler
    directly.
    """
    import jax

    try:
        if id(fn) not in _COST_CACHE:
            ca = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            _COST_CACHE[id(fn)] = ca
            _COST_KEEPALIVE.append(fn)
        return float(_COST_CACHE[id(fn)]["flops"])
    except Exception:
        return None


_COST_CACHE = {}
# keep analyzed fns alive so a gc'd closure's id can't be reused by a
# later leg's different fn (id() is only unique among live objects)
_COST_KEEPALIVE = []


def _compiled_bytes(fn, *args):
    """XLA cost-analysis 'bytes accessed' of one call — the compiler's own
    post-fusion estimate of HBM traffic (operands + outputs of every fused
    computation).  Same scan caveat as _compiled_flops: analyze ONE model
    eval, never the scanned sampler.  Shares one compile with
    _compiled_flops via _COST_CACHE (keyed on the score-fn object — at
    grid shapes each standalone compile is minutes over the tunnel)."""
    import jax

    try:
        if id(fn) not in _COST_CACHE:
            ca = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            _COST_CACHE[id(fn)] = ca
            _COST_KEEPALIVE.append(fn)
        return float(_COST_CACHE[id(fn)]["bytes accessed"])
    except Exception:
        return None


def _stream_bytes_per_step(eval_bytes, tensors, evals_per_model=2):
    """Total HBM bytes touched per diffusion step.

    = score-network traffic (cost-analysis bytes per eval, which already
      covers param reads + carry-tensor reads + score writes)
    + carry-update traffic: per tensor, corrector AND predictor each read
      the tensor + its score + fresh noise and write the updated tensor
      (~4 tensor-sized accesses per phase, 8 per step) — the (B,E,K)
      streams DESIGN_NOTES calls 'HBM-stream-bound'.

    This is an ESTIMATE (XLA may keep small tensors in VMEM across fused
    regions), good to tens of percent — enough to state fraction-of-peak.
    """
    model_traffic = sum(b for b in eval_bytes if b) * evals_per_model
    carry_traffic = 8.0 * sum(t.size * t.dtype.itemsize for t in tensors)
    return model_traffic + carry_traffic


def _time_best_of(fn, reps=3):
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn(i)
        times.append(time.perf_counter() - t0)
    return min(times)


def _bench_graph(jax, jnp):
    from ccsd_tpu.diffusion.losses import get_score_fn
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model

    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=F, depth=3,
                         nhid=32, use_bn=False, is_cc=False))
    # fused=True: channel-folded attention fast path — identical params and
    # semantics (CPU parity ~1e-6, tests/models/test_fused_attention.py);
    # measured 1.67x over the unrolled path on TPU v5e (DESIGN_NOTES.md).
    # scores_impl/final_impl: the with_fused(fast=True) sampling defaults
    # (cleared by the multi-seed MMD sweep, BASELINE.md "Graph fast-lowering
    # clearance") — bench measures the path users actually get
    ma = load_model(dict(model_type="ScoreNetworkA", max_feat_num=F,
                         max_node_num=N, nhid=32, num_layers=5, num_linears=2,
                         c_init=2, c_hid=8, c_final=4, adim=32, num_heads=4,
                         conv="GCN", use_bn=False, is_cc=False, fused=True,
                         scores_impl="mulreduce_h_bf16",
                         final_impl="blocksum"))
    # useful-FLOP oracle: the UNFUSED (reference-parity) formulation of the
    # same models — its cost analysis carries none of the fused path's
    # block-diagonal padding FLOPs, so flops_unfused / elapsed_fused / peak
    # is the honest useful-work MFU (VERDICT r2 weak #1)
    ma_ref = load_model({**dict(model_type="ScoreNetworkA", max_feat_num=F,
                                max_node_num=N, nhid=32, num_layers=5,
                                num_linears=2, c_init=2, c_hid=8, c_final=4,
                                adim=32, num_heads=4, conv="GCN",
                                use_bn=False, is_cc=False), "fused": False})
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    sde_x = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    sde_adj = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
    sampler = get_pc_sampler(
        sde_x, sde_adj, (B, N, F), (B, N, N), predictor="Euler",
        corrector="Langevin", snr=0.05, scale_eps=0.7, n_steps=1,
        denoise=True, eps=1e-4,
    )
    sfx = get_score_fn(sde_x, mx, px)
    sfa = get_score_fn(sde_adj, ma, pa)
    jitted = jax.jit(lambda fl, k: sampler(sfx, sfa, fl, k))
    flags = jnp.ones((B, N))

    jitted(flags, jax.random.PRNGKey(2)).adj.block_until_ready()  # compile
    elapsed = _time_best_of(
        lambda i: jitted(flags, jax.random.PRNGKey(3 + i)).adj.block_until_ready()
    )
    # FLOPs: one eval per model, x (corrector + predictor) = 2 evals per
    # model per step (Langevin n_steps=1).
    x0 = jnp.zeros((B, N, F))
    a0 = jnp.zeros((B, N, N))
    t0 = jnp.zeros((B,))
    fx = _compiled_flops(sfx, x0, a0, flags, t0)
    fa = _compiled_flops(sfa, x0, a0, flags, t0)
    flops = (fx + fa) * 2 * STEPS if (fx and fa) else None
    sfa_ref = get_score_fn(sde_adj, ma_ref, pa)
    fa_ref = _compiled_flops(sfa_ref, x0, a0, flags, t0)
    useful = (fx + fa_ref) * 2 * STEPS if (fx and fa_ref) else None
    bx = _compiled_bytes(sfx, x0, a0, flags, t0)
    ba = _compiled_bytes(sfa, x0, a0, flags, t0)
    bytes_step = _stream_bytes_per_step([bx, ba], [x0, a0])
    return elapsed, flops, useful, bytes_step


def _bench_cc(jax, jnp):
    from ccsd_tpu.diffusion.losses import get_score_fn_cc
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model, load_model_params, with_fused
    from ccsd_tpu.ops.cells import ComplexSpec
    from ccsd_tpu.utils.config import get_config

    cfg = get_config("community_small_CC", seed=0, folder=REPO)
    Fcc = cfg.data.max_feat_num  # 11
    defs_ref = dict(
        zip(("x", "adj", "rank2"), load_model_params(cfg, is_cc=True)))
    defs = with_fused(dict(defs_ref))
    models = {n: load_model(d) for n, d in defs.items()}
    # unfused (reference-parity) twins for the useful-FLOP count; same params
    models_ref = {n: load_model(d) for n, d in defs_ref.items()}
    key = jax.random.PRNGKey(0)
    params = {n: m.init(jax.random.fold_in(key, i))
              for i, (n, m) in enumerate(models.items())}
    spec = ComplexSpec(N=cfg.data.max_node_num, d_min=cfg.data.d_min,
                       d_max=cfg.data.d_max)
    E, K = spec.num_edges, spec.num_cells
    sdes = {n: VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)
            for n in ("x", "adj", "rank2")}
    sampler = get_pc_sampler(
        sdes["x"], sdes["adj"], (B, N, Fcc), (B, N, N), predictor="Euler",
        corrector="Langevin", snr=cfg.sampler.snr,
        scale_eps=cfg.sampler.scale_eps, n_steps=1, denoise=True, eps=1e-4,
        is_cc=True, sde_rank2=sdes["rank2"], shape_rank2=(B, E, K), spec=spec,
    )
    # selective-precision bf16 score networks: the PRODUCTION CC-sampling
    # default since round 4 (3-seed MMD clearance, BASELINE.md) — bench
    # measures the path users actually get, like the graph leg's fast
    # lowerings.  Carry/noise/norms stay f32.
    sfx = get_score_fn_cc(sdes["x"], models["x"], params["x"],
                          compute_dtype=jnp.bfloat16)
    sfa = get_score_fn_cc(sdes["adj"], models["adj"], params["adj"],
                          compute_dtype=jnp.bfloat16)
    sfr = get_score_fn_cc(sdes["rank2"], models["rank2"], params["rank2"],
                          compute_dtype=jnp.bfloat16)
    jitted = jax.jit(lambda fl, k: sampler(sfx, sfa, sfr, fl, k))
    flags = jnp.ones((B, N))

    jitted(flags, jax.random.PRNGKey(2)).adj.block_until_ready()  # compile
    elapsed = _time_best_of(
        lambda i: jitted(flags, jax.random.PRNGKey(3 + i)).adj.block_until_ready()
    )
    x0 = jnp.zeros((B, N, Fcc))
    a0 = jnp.zeros((B, N, N))
    r0 = jnp.zeros((B, E, K))
    t0 = jnp.zeros((B,))
    per_eval = [
        _compiled_flops(sf, x0, a0, r0, flags, t0) for sf in (sfx, sfa, sfr)
    ]
    flops = (sum(per_eval) * 2 * STEPS) if all(per_eval) else None
    ref_fns = [
        get_score_fn_cc(sdes[n], models_ref[n], params[n])
        for n in ("x", "adj", "rank2")
    ]
    per_eval_ref = [
        _compiled_flops(sf, x0, a0, r0, flags, t0) for sf in ref_fns
    ]
    useful = (sum(per_eval_ref) * 2 * STEPS) if all(per_eval_ref) else None
    per_eval_bytes = [
        _compiled_bytes(sf, x0, a0, r0, flags, t0) for sf in (sfx, sfa, sfr)
    ]
    bytes_step = _stream_bytes_per_step(per_eval_bytes, [x0, a0, r0])
    return elapsed, flops, useful, E, K, bytes_step


def _bench_zinc(jax, jnp):
    """Large-E accounting (VERDICT r3 missing #4): the two-stage pipeline's
    three components at ZINC shapes (B=256, N=38, E=703), each timed
    separately with its own MFU — stage-1 graph reverse diffusion, stage-2
    dynamic-universe F diffusion, and the host universe bridge.  Model dims
    = tools/zinc_shape_smoke.py's TPU row (round 3) so the numbers explain
    that row's conflated 31.1 steps/s.  Ref hot loop being replaced:
    solver.py:856-1176 at zinc250k_CC.yaml shapes."""
    import numpy as np

    from ccsd_tpu.diffusion.losses import (
        get_score_fn,
        get_score_fn_rank2_dynamic,
    )
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.diffusion.two_stage import (
        DynamicCells,
        dynamic_cells_from_adjs,
        get_rank2_sampler,
    )
    from ccsd_tpu.models.registry import load_model
    from ccsd_tpu.ops.cells import ComplexSpec
    from ccsd_tpu.ops.masks import quantize

    Bz, Nz, Fz, KMAX = (4, 38, 9, 5) if _SMOKE else (256, 38, 9, 5)
    spec = ComplexSpec(N=Nz, d_min=3, d_max=3)  # only num_edges used: E=703
    E = spec.num_edges
    mx = load_model(dict(model_type="ScoreNetworkX", max_feat_num=Fz, depth=2,
                         nhid=8, use_bn=False, is_cc=False))
    ma_kw = dict(model_type="ScoreNetworkA", max_feat_num=Fz, max_node_num=Nz,
                 nhid=8, num_layers=3, num_linears=3, c_init=2, c_hid=4,
                 c_final=4, adim=8, num_heads=4, conv="GCN", use_bn=False,
                 is_cc=False)
    ma = load_model({**ma_kw, "fused": True})
    ma_ref = load_model(ma_kw)
    mf = load_model(dict(model_type="ScoreNetworkF", num_layers_mlp=1,
                         num_layers=2, num_linears=1, nhid=2, c_hid=2,
                         c_final=2, cnum=1, max_node_num=Nz, d_min=3, d_max=24,
                         use_hodge_mask=True, use_bn=False, is_cc=True))
    px = mx.init(jax.random.PRNGKey(0))
    pa = ma.init(jax.random.PRNGKey(1))
    pf = mf.init(jax.random.PRNGKey(2))
    sde = VPSDE(N=STEPS, beta_min=0.1, beta_max=1.0)

    # --- stage 1: graph reverse diffusion at (256, 38, 38)
    sampler1 = get_pc_sampler(
        sde, sde, (Bz, Nz, Fz), (Bz, Nz, Nz), predictor="Reverse",
        corrector="Langevin", snr=0.2, scale_eps=0.7, n_steps=1,
        denoise=True, eps=1e-4)
    sfx = get_score_fn(sde, mx, px)
    sfa = get_score_fn(sde, ma, pa)
    jitted1 = jax.jit(lambda fl, k: sampler1(sfx, sfa, fl, k))
    flags = jnp.ones((Bz, Nz))
    out = jitted1(flags, jax.random.PRNGKey(3))
    out.adj.block_until_ready()
    t1 = _time_best_of(
        lambda i: jitted1(flags, jax.random.PRNGKey(4 + i)).adj
        .block_until_ready())
    x0, a0, t0v = jnp.zeros((Bz, Nz, Fz)), jnp.zeros((Bz, Nz, Nz)), jnp.zeros((Bz,))
    fx = _compiled_flops(sfx, x0, a0, flags, t0v)
    fa = _compiled_flops(sfa, x0, a0, flags, t0v)
    fa_ref = _compiled_flops(get_score_fn(sde, ma_ref, pa), x0, a0, flags, t0v)
    s1_flops = (fx + fa) * 2 * STEPS if (fx and fa) else None
    s1_useful = (fx + fa_ref) * 2 * STEPS if (fx and fa_ref) else None

    # --- host bridge: quantized adjs -> per-sample ring universes
    adj_q = np.asarray(quantize(out.adj))
    tb0 = time.perf_counter()
    dyn_real = dynamic_cells_from_adjs(adj_q, 3, 24, KMAX, "cycles")
    t_bridge = time.perf_counter() - tb0

    # --- stage 2: F diffusion over (256, 703, k_max) with the real universes
    dyn = DynamicCells(member=dyn_real.member, valid=dyn_real.valid,
                       cell_lists=None)
    sampler2 = get_rank2_sampler(sde, spec, predictor="Reverse",
                                 corrector="Langevin", snr=0.2,
                                 scale_eps=0.7, n_steps=1, denoise=True,
                                 eps=1e-4)
    sff = get_score_fn_rank2_dynamic(sde, mf, pf, dyn)
    km = int(dyn.member.shape[1])
    jitted2 = jax.jit(
        lambda fl, k: sampler2(sff, dyn, fl, k, (Bz, E, km)))
    jitted2(flags, jax.random.PRNGKey(7)).block_until_ready()
    t2 = _time_best_of(
        lambda i: jitted2(flags, jax.random.PRNGKey(8 + i))
        .block_until_ready())
    ff = _compiled_flops(sff, jnp.zeros((Bz, E, km)), flags, t0v)
    s2_flops = ff * 2 * STEPS if ff else None
    bx = _compiled_bytes(sfx, x0, a0, flags, t0v)
    ba = _compiled_bytes(sfa, x0, a0, flags, t0v)
    s1_bytes = _stream_bytes_per_step([bx, ba], [x0, a0])
    bf = _compiled_bytes(sff, jnp.zeros((Bz, E, km)), flags, t0v)
    s2_bytes = _stream_bytes_per_step([bf], [jnp.zeros((Bz, E, km))])
    return dict(t1=t1, t2=t2, t_bridge=t_bridge, s1_flops=s1_flops,
                s1_useful=s1_useful, s2_flops=s2_flops, E=E, B=Bz,
                k_max=km, s1_bytes=s1_bytes, s2_bytes=s2_bytes)


def _bench_grid_cc(jax, jnp):
    """Dense-CC leg at grid_small_CC's REAL shapes — N=49, E=1176, K=18,424
    (round-4 verdict missing #1: the one regime where the E x E Hodge-dual
    attention hands the MXU real tiles had zero perf accounting).  B=4 and
    100 steps: per-step cost is what matters, and the (B,E,K) f32 carry is
    347 MB.  Score networks run f32 — grid has no bf16 quality clearance
    (sampler.BF16_SCORE_CLEARED), so this measures the production default.
    Ref hot loop being replaced: solver.py:1123-1147 driving
    ScoreNetwork_F.py:24-217 + ScoreNetwork_A_CC.py:275-332 at
    config/grid_small_CC.yaml shapes."""
    from ccsd_tpu.diffusion.losses import get_score_fn_cc
    from ccsd_tpu.diffusion.sde import VPSDE
    from ccsd_tpu.diffusion.solvers import get_pc_sampler
    from ccsd_tpu.models.registry import load_model, load_model_params, with_fused
    from ccsd_tpu.ops.cells import ComplexSpec
    from ccsd_tpu.utils.config import get_config

    Bg, STEPS_G = (1, 2) if _SMOKE else (4, 100)
    cfg = get_config("grid_small_CC", seed=0, folder=REPO)
    Ng, Fg = cfg.data.max_node_num, cfg.data.max_feat_num  # 49, 5
    defs_ref = dict(
        zip(("x", "adj", "rank2"), load_model_params(cfg, is_cc=True)))
    defs = with_fused(dict(defs_ref))
    models = {n: load_model(d) for n, d in defs.items()}
    models_ref = {n: load_model(d) for n, d in defs_ref.items()}
    key = jax.random.PRNGKey(0)
    params = {n: m.init(jax.random.fold_in(key, i))
              for i, (n, m) in enumerate(models.items())}
    spec = ComplexSpec(N=Ng, d_min=cfg.data.d_min, d_max=cfg.data.d_max)
    E, K = spec.num_edges, spec.num_cells
    sdes = {n: VPSDE(N=STEPS_G, beta_min=0.1, beta_max=1.0)
            for n in ("x", "adj", "rank2")}
    sampler = get_pc_sampler(
        sdes["x"], sdes["adj"], (Bg, Ng, Fg), (Bg, Ng, Ng),
        predictor="Reverse", corrector="Langevin", snr=cfg.sampler.snr,
        scale_eps=cfg.sampler.scale_eps, n_steps=1, denoise=True, eps=1e-4,
        is_cc=True, sde_rank2=sdes["rank2"], shape_rank2=(Bg, E, K),
        spec=spec,
    )
    fns = [get_score_fn_cc(sdes[n], models[n], params[n])
           for n in ("x", "adj", "rank2")]
    jitted = jax.jit(lambda fl, k: sampler(*fns, fl, k))
    flags = jnp.ones((Bg, Ng))
    jitted(flags, jax.random.PRNGKey(2)).adj.block_until_ready()  # compile
    elapsed = _time_best_of(
        lambda i: jitted(flags, jax.random.PRNGKey(3 + i)).adj
        .block_until_ready(), reps=2)
    x0 = jnp.zeros((Bg, Ng, Fg))
    a0 = jnp.zeros((Bg, Ng, Ng))
    r0 = jnp.zeros((Bg, E, K))
    t0 = jnp.zeros((Bg,))
    per_eval = [_compiled_flops(sf, x0, a0, r0, flags, t0) for sf in fns]
    flops = (sum(per_eval) * 2 * STEPS_G) if all(per_eval) else None
    ref_fns = [get_score_fn_cc(sdes[n], models_ref[n], params[n])
               for n in ("x", "adj", "rank2")]
    per_ref = [_compiled_flops(sf, x0, a0, r0, flags, t0) for sf in ref_fns]
    useful = (sum(per_ref) * 2 * STEPS_G) if all(per_ref) else None
    per_bytes = [_compiled_bytes(sf, x0, a0, r0, flags, t0) for sf in fns]
    bytes_step = _stream_bytes_per_step(per_bytes, [x0, a0, r0])
    return dict(elapsed=elapsed, flops=flops, useful=useful, E=E, K=K,
                B=Bg, steps=STEPS_G, bytes_step=bytes_step)


def main() -> None:
    # three legs (graph, CC, zinc per-stage) at tonight's axon compile
    # latency can approach 15 min of pure compilation; the watchdog bounds
    # a WEDGED tunnel, not slow-but-progressing compiles
    # four legs (graph, CC, grid-CC, zinc per-stage); compile latency alone
    # can approach 20 min over the axon tunnel — the watchdog bounds a
    # WEDGED tunnel, not slow-but-progressing compiles
    _watchdog(float(os.environ.get("CCSD_BENCH_TIMEOUT", "3000")))
    import jax
    import jax.numpy as jnp

    device = jax.devices()[0]
    peak = PEAK_FLOPS.get(getattr(device, "device_kind", ""), None)
    peak_bw = PEAK_HBM.get(getattr(device, "device_kind", ""), None)

    def _bw_fields(holder, prefix, bytes_step, steps, elapsed):
        """achieved GB/s + fraction of HBM peak for one leg (verdict r4
        next #4: memory-bound loops are judged by bandwidth, not FLOP-MFU)."""
        if not (bytes_step and peak_bw and elapsed):
            return
        gbps = bytes_step * steps / elapsed / 1e9
        holder[f"{prefix}_hbm_gbps"] = round(gbps, 1)
        holder[f"{prefix}_hbm_frac"] = round(gbps * 1e9 / peak_bw, 4)

    g_elapsed, g_flops, g_useful, g_bytes = _bench_graph(jax, jnp)
    edges = B * (N * (N - 1) // 2)
    edges_per_s = edges * STEPS / g_elapsed
    record = {
        "metric": "sampler_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / REF_BASELINE_EDGES_PER_S, 2),
        "steps_per_s": round(STEPS / g_elapsed, 2),
        "batch": B,
        "diffusion_steps": STEPS,
        "wall_s": round(g_elapsed, 3),
        "device": str(device),
        "stale": False,
        "measured_at": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
    }
    if g_flops and peak:
        record["graph_mfu"] = round(g_flops / g_elapsed / peak, 4)
        record["graph_tflops_per_s"] = round(g_flops / g_elapsed / 1e12, 3)
    if g_useful and peak:
        # useful-FLOP MFU: reference-formulation FLOPs (no block-diag
        # padding) over OUR wall time — the padding-proof figure
        record["graph_useful_mfu"] = round(g_useful / g_elapsed / peak, 5)
    _bw_fields(record, "graph", g_bytes, STEPS, g_elapsed)

    try:
        cc_elapsed, cc_flops, cc_useful, E, K, cc_bytes = _bench_cc(jax, jnp)
        cc_steps_per_s = STEPS / cc_elapsed
        record.update({
            "cc_sampler_steps_per_s": round(cc_steps_per_s, 2),
            "cc_sampler_edges_per_s": round(B * E * STEPS / cc_elapsed, 1),
            "cc_vs_baseline": round(cc_steps_per_s / REF_BASELINE_CC_STEPS_PER_S, 1),
            "cc_wall_s": round(cc_elapsed, 3),
            "cc_shape": {"E": E, "K": K},
        })
        if cc_flops and peak:
            record["cc_mfu"] = round(cc_flops / cc_elapsed / peak, 4)
            record["cc_tflops_per_s"] = round(cc_flops / cc_elapsed / 1e12, 3)
        if cc_useful and peak:
            record["cc_useful_mfu"] = round(cc_useful / cc_elapsed / peak, 5)
        _bw_fields(record, "cc", cc_bytes, STEPS, cc_elapsed)
    except Exception as e:  # CC leg must never lose the primary metric
        record["cc_error"] = f"{type(e).__name__}: {e}"

    try:
        g = _bench_grid_cc(jax, jnp)
        grid_rec = {
            "shape": {"B": g["B"], "E": g["E"], "K": g["K"]},
            "steps_per_s": round(g["steps"] / g["elapsed"], 2),
            "edges_per_s": round(
                g["B"] * g["E"] * g["steps"] / g["elapsed"], 1),
            "wall_s": round(g["elapsed"], 3),
            "bench_steps": g["steps"],
        }
        if g["flops"] and peak:
            grid_rec["mfu"] = round(g["flops"] / g["elapsed"] / peak, 4)
            grid_rec["tflops_per_s"] = round(
                g["flops"] / g["elapsed"] / 1e12, 3)
        if g["useful"] and peak:
            grid_rec["useful_mfu"] = round(
                g["useful"] / g["elapsed"] / peak, 5)
        _bw_fields(grid_rec, "grid", g["bytes_step"], g["steps"],
                   g["elapsed"])
        record["grid_cc"] = grid_rec
    except Exception as e:
        record["grid_cc_error"] = f"{type(e).__name__}: {e}"

    try:
        z = _bench_zinc(jax, jnp)
        pipeline_wall = z["t1"] + z["t_bridge"] + z["t2"]
        record["zinc"] = {
            "shape": {"B": z["B"], "N": 38, "E": z["E"], "k_max": z["k_max"]},
            "stage1_steps_per_s": round(STEPS / z["t1"], 2),
            "stage1_edges_per_s": round(z["B"] * z["E"] * STEPS / z["t1"], 1),
            "stage2_steps_per_s": round(STEPS / z["t2"], 2),
            "bridge_s": round(z["t_bridge"], 3),
            "pipeline_steps_per_s": round(STEPS / pipeline_wall, 2),
            "pipeline_edges_per_s": round(
                z["B"] * z["E"] * STEPS / pipeline_wall, 1),
        }
        if peak:
            if z["s1_flops"]:
                record["zinc"]["stage1_mfu"] = round(
                    z["s1_flops"] / z["t1"] / peak, 4)
            if z["s1_useful"]:
                record["zinc"]["stage1_useful_mfu"] = round(
                    z["s1_useful"] / z["t1"] / peak, 5)
            if z["s2_flops"]:
                record["zinc"]["stage2_mfu"] = round(
                    z["s2_flops"] / z["t2"] / peak, 4)
        _bw_fields(record["zinc"], "stage1", z["s1_bytes"], STEPS, z["t1"])
        _bw_fields(record["zinc"], "stage2", z["s2_bytes"], STEPS, z["t2"])
    except Exception as e:
        record["zinc_error"] = f"{type(e).__name__}: {e}"

    # units-bug guard (VERDICT r2 weak #8: a cost-analysis multiplier once
    # understated MFU by exactly 1000x): every *_mfu field must be a
    # physical fraction.  Drop-and-flag rather than ship an absurd number.
    for holder in (record, record.get("zinc") or {},
                   record.get("grid_cc") or {}):
        for k in [k for k in holder if k.endswith("_mfu")]:
            v = holder[k]
            if v is not None and not (1e-4 <= v <= 1.0):
                holder[f"{k}_INSANE"] = v
                holder[k] = None
        # bandwidth fractions are physical too: >1.3x peak means the byte
        # model (or the peak constant) is wrong — flag, don't ship
        for k in [k for k in holder if k.endswith("_hbm_frac")]:
            v = holder[k]
            if v is not None and not (1e-4 <= v <= 1.3):
                holder[f"{k}_INSANE"] = v
                holder[k] = None

    try:
        with open(CACHE, "w") as f:
            json.dump(record, f)
    except OSError:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
