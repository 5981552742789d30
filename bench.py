"""Headline benchmarks: assembly + CG time-to-solution and topo-opt rate.

The default invocation runs the five headline configs and prints one
JSON line per config (2D plane stress + accuracy mode, 3D hex8,
brick20 p-multigrid, fused GMG-Newton nonlinear, topology
optimization):
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 5.0/seconds}
``--config 2d|3d|quadratic|newton|topo`` runs a single config.

The baseline (BASELINE.md) is the driver-set target of < 5 s on a single
TPU v5e chip for assembly + CG solve at ~1e6 dofs, with the solution
matching the host scipy reference.

Pipeline (all on device, one jit program per timed step):
    nodal rho -> RAMP material -> element stiffness (Lame-form einsums)
    -> DIA (stencil) assembly of the full geometric-multigrid hierarchy
    -> Dirichlet mask BCs -> V-cycle-preconditioned CG on the
    shifted-slice DIA SpMV.

``--precond jacobi`` falls back to plain Jacobi-PCG (the pre-GMG path).
"""

import argparse
import json
import sys
import time

import numpy as np


def _cheb_kw(args):
    """Optional Chebyshev-interval overrides (assembler defaults else)."""
    kw = {}
    if getattr(args, "cheb_lam", None) is not None:
        kw["cheb_lam"] = args.cheb_lam
    if getattr(args, "cheb_frac", None) is not None:
        kw["cheb_frac"] = args.cheb_frac
    return kw


def run_3d(args, log):
    """hex8 3D elasticity GMG-PCG at ~0.8M dof (SciTech hex-sweep role)."""
    import jax
    import jax.numpy as jnp
    import pyfem_gpu_testflight_tpu as fem
    from pyfem_gpu_testflight_tpu import multigrid
    from pyfem_gpu_testflight_tpu.ops.dia import (
        interleave_to_planar, planar_to_interleave,
    )

    n = args.n3d
    dtype = jnp.dtype(args.dtype)
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type="block")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("hex8", X, conn, dof_fixed, None,
                                 nodal_force, p=0.0, dtype=dtype)
    Lx, Ly, Lz = (float(X[:, k].max()) for k in range(3))
    log(f"3d: ndof={model.ndof} nelems={model.nelems} dtype={dtype}")
    sm_dtype = jnp.bfloat16 if args.smoother_dtype == "bfloat16" else None
    asm = multigrid.GMGAssembler3D(
        n, n, n, Lx, Ly, Lz, "elasticity", p=0.0, dtype=dtype,
        nu_pre=args.nu, nu_post=args.nu, smoother_dtype=sm_dtype,
        pallas_smooth=args.pallas_smooth, pallas_min=args.pallas_min,
        pallas_tz=args.pallas_tz, pallas_asm_min=args.pallas_asm_min,
        elem_path=args.elem_path,
        min_n=args.min_n3d, coarse_dense_max=args.coarse_max,
        **({} if args.omega is None else {"omega": args.omega}),
        **({} if args.pallas_sym is None
           else {"pallas_sym": args.pallas_sym}),
        **_cheb_kw(args),
    )
    log(f"3d gmg levels: {asm.sizes}")

    @jax.jit
    def step(rho, rhs, chain):
        rho = rho + 0.0 * chain[0]
        gmg, lv0 = asm.assemble(rho)
        b = jnp.where(
            lv0.mask, 0.0,
            interleave_to_planar(rhs, 3).reshape(3, n, n, n),
        )
        x, k, rn = multigrid.pcg_gmg(gmg, lv0, b, rtol=args.rtol,
                                     maxiter=args.maxiter,
                                     flexible=sm_dtype is not None)
        return planar_to_interleave(x.reshape(-1), 3), k, rn

    rho = jnp.ones((model.nnodes,), dtype)
    rhs = jnp.asarray(model.compute_rhs(), dtype)
    log("[3d] compiling...")
    t0 = time.time()
    u, k, rn = step(rho, rhs, rhs)
    u.block_until_ready()
    log(f"[3d] compile+first run: {time.time()-t0:.1f}s iters={int(k)} "
        f"resnorm={float(rn):.3e}")
    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        u, k, rn = step(rho, rhs, u)
        u.block_until_ready()
        times.append(time.time() - t0)
    single = float(np.median(times))
    pipeline = 8
    t0 = time.time()
    for _ in range(pipeline):
        u, k, rn = step(rho, rhs, u)
    u.block_until_ready()
    t_short = time.time() - t0
    t0 = time.time()
    for _ in range(4 * pipeline):
        u, k, rn = step(rho, rhs, u)
    u.block_until_ready()
    # steady-state marginal cost (removes the one-time sync round trip)
    elapsed = ((time.time() - t0) - t_short) / (3 * pipeline)
    log(f"[3d] single-shot={['%.3f' % t for t in times]} "
        f"pipelined={elapsed:.4f}s/solve")
    print(json.dumps({
        "metric": (
            f"3D hex8 elasticity assembly+CG time-to-solution "
            f"(single-shot), {model.ndof} dof, {args.dtype}, "
            f"rtol={args.rtol}, gmg-pcg"
        ),
        "value": round(single, 4),
        "unit": "s",
        "vs_baseline": round(5.0 / single, 3),
        "cg_iters": int(k),
        "resnorm": float(rn),
        "pipelined_s": round(elapsed, 4),
    }))


def run_quadratic(args, log):
    """brick20 p-multigrid elasticity at ~0.5M live dof.

    The reference's quadratic elements have no solver story past 9^3
    direct solves (test_elements.py; SciTech sweeps measure assembly
    only).  This config runs the matrix-free two-level p-multigrid
    (pmg.py): Chebyshev smoothing on the MXU-batched element operator +
    a hex8 GMG V-cycle on the linear corner sub-grid, as one compiled
    PCG program per solve.
    """
    import jax
    import jax.numpy as jnp
    import pyfem_gpu_testflight_tpu as fem

    n = args.n3d_quad
    dtype = jnp.dtype(args.dtype)
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                 element_type="brick20")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("brick20", X, conn, dof_fixed, None,
                                 nodal_force, p=0.0, dtype=dtype)
    model.attach_pmg(n, n, n)
    pmg = model._pmg
    live = int(np.sum(~np.asarray(pmg.mask_all)))
    log(f"quadratic: brick20 {n}^3 lattice, {model.nelems} elements, "
        f"{live} live dof ({model.ndof} lattice dof), dtype={dtype}")

    rho0 = jnp.ones((model.nnodes,), dtype)
    rtol = args.rtol
    log("[quadratic] compiling...")
    t0 = time.time()
    x, b, k, rn = pmg.solve(rho=rho0, rtol=rtol)
    jax.block_until_ready(x)
    log(f"[quadratic] compile+first run: {time.time()-t0:.1f}s "
        f"iters={int(k)} resnorm={float(rn):.3e}")

    def chained(x):
        # formal data dependence through rho so pipelined timing can't
        # be served from a result cache
        r = rho0 + 0.0 * x.reshape(-1)[0].astype(dtype)
        return pmg.solve(rho=r, rtol=rtol)[0]

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        x = jax.block_until_ready(chained(x))
        times.append(time.time() - t0)
    single = float(np.median(times))
    depth = 4
    t0 = time.time()
    for _ in range(depth):
        x = chained(x)
    jax.block_until_ready(x)
    t_short = time.time() - t0
    t0 = time.time()
    for _ in range(3 * depth):
        x = chained(x)
    jax.block_until_ready(x)
    elapsed = max(0.0, ((time.time() - t0) - t_short) / (2 * depth))
    log(f"[quadratic] single-shot={['%.3f' % t for t in times]} "
        f"pipelined={elapsed:.4f}s/solve")
    print(json.dumps({
        "metric": (
            f"brick20 p-multigrid elasticity assembly+PCG "
            f"time-to-solution (single-shot), {live} live dof "
            f"({n}^3 lattice), {args.dtype}, rtol={rtol}"
        ),
        "value": round(single, 4),
        "unit": "s",
        "vs_baseline": round(5.0 / max(single, 1e-9), 3),
        "pcg_iters": int(k),
        "resnorm": float(rn),
        "pipelined_s": round(elapsed, 4),
        "cheb_lam": pmg._cheb_lam,
    }))


def run_newton(args, log):
    """Fused GMG-Newton nonlinear solve at ~1M dof (new capability).

    The reference's nonlinear model (pyfem.py:1332-1664) is solved by a
    host Newton loop with *unpreconditioned* scipy gmres and has no
    scalable path.  This config runs the whole Newton solve of
    -div(h(x)(1+u^2) grad u) = g as ONE jitted lax.while_loop dispatch
    (models/nonlinear_poisson.solve_nonlinear_fused, method="gmg"):
    per Newton iteration — element tangent assembly, stencil assembly +
    BC elimination, a GMG hierarchy from the nodal coefficient field
    c = h(x)(1+u^2), and V-cycle-right-preconditioned GMRES.

    On ProblemCreator rasters the model uses the scatter-free uniform
    path: the flux is the coefficient stencil times u (measured with a
    double-float matvec so the convergence test sees the TRUE residual
    instead of f32 flux-load cancellation), and the tangent assembles
    through unit matrices with no per-element gather.  Measured on
    v5e: 1.41 s (einsum assembly) -> 0.086 s single-shot / 0.050
    pipelined at 1,050,625 dof.

    float32 floors: the TRUE-residual floor at 1025^2 is ~1.2e-2
    relative, set by the tangent GMRES's f32 recheck floor (~5.5e-3
    per solve) — hence tol=2e-2, lin_rtol=1e-2, and a hard
    inner-iteration cap (a floor-stalled GMRES would otherwise burn
    its full maxiter).  The f64 reference contract of 1e-10 is gated
    by the CPU test suite.
    """
    import jax
    import jax.numpy as jnp
    import pyfem_gpu_testflight_tpu as fem

    n = args.newton_n
    dtype = jnp.dtype(args.dtype)
    creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n)
    conn, X, dof_fixed = creator.create_poisson_problem()
    model = fem.NonlinearPoisson("quad4", X, conn, dof_fixed, dtype=dtype)
    model.attach_structured_grid(
        n, n,
        **({} if args.omega is None else {"omega": args.omega}),
        **_cheb_kw(args),
    )
    log(f"newton: ndof={model.ndof} nelems={model.nelems} dtype={dtype}")
    xdv = jnp.asarray(np.ones(10) / 10, dtype)
    tol, lin_rtol = args.newton_tol, args.newton_lin_rtol

    log("[newton] compiling...")
    t0 = time.time()
    u, k, rn = model.solve_nonlinear_fused(
        method="gmg", xdv=xdv, tol=tol, atol=0.0, lin_rtol=lin_rtol,
        lin_maxiter=40, max_iter=12, verbose=False,
    )
    jax.block_until_ready(u)
    log(f"[newton] compile+first run: {time.time()-t0:.1f}s "
        f"newton_iters={int(k)} resnorm={float(rn):.3e}")

    # timed: drive the cached program directly (the public wrapper does
    # a host fail-flag sync per call); chain data dependence through u0
    # so repeats can't be served from a result cache
    prog = model._fused_newton_cache[("gmg", 12, False, 40)]
    rdt = jnp.zeros((), dtype).real.dtype
    targs = (jnp.asarray(tol, rdt), jnp.asarray(0.0, rdt),
             jnp.asarray(lin_rtol, rdt))

    def step(u_prev):
        u0 = 0.0 * u_prev  # zeros, but data-dependent on the last solve
        return prog(xdv, u0, *targs)

    u, k, rn, fail = step(u)
    jax.block_until_ready(u)
    assert not bool(fail)
    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        u, k, rn, fail = step(u)
        jax.block_until_ready(u)
        times.append(time.time() - t0)
    single = float(np.median(times))
    depth = 4
    t0 = time.time()
    for _ in range(depth):
        u, k, rn, fail = step(u)
    jax.block_until_ready(u)
    t_short = time.time() - t0
    t0 = time.time()
    for _ in range(3 * depth):
        u, k, rn, fail = step(u)
    jax.block_until_ready(u)
    elapsed = max(0.0, ((time.time() - t0) - t_short) / (2 * depth))
    log(f"[newton] single-shot={['%.3f' % t for t in times]} "
        f"pipelined={elapsed:.4f}s/solve newton_iters={int(k)} "
        f"resnorm={float(rn):.3e}")
    print(json.dumps({
        "metric": (
            f"nonlinear Poisson fused GMG-Newton time-to-solution "
            f"(single-shot), {model.ndof} dof, {args.dtype}, "
            f"newton tol={tol} (relative)"
        ),
        "value": round(single, 4),
        "unit": "s",
        "vs_baseline": round(5.0 / max(single, 1e-9), 3),
        "newton_iters": int(k),
        "resnorm": float(rn),
        "pipelined_s": round(elapsed, 4),
    }))


def run_topo(args, log):
    """Topology optimization at >= 0.5M dof: s per MMA iteration.

    The reference's flagship workload (200 ParOpt-MMA iterations of
    Helmholtz-filtered RAMP compliance,
    examples/topology_optimization/topo.py:176-189).  Runs the fused
    device loop (opt.topo_device): one jitted program per iteration —
    filter PCG, GMG assembly, V-cycle-PCG state solve, adjoint einsum,
    filter^T PCG, device MMA update.
    """
    import jax
    import jax.numpy as jnp
    import pyfem_gpu_testflight_tpu as fem
    from pyfem_gpu_testflight_tpu.opt import DeviceTopo

    dtype = jnp.dtype(args.dtype)
    sm_dtype = jnp.bfloat16 if args.smoother_dtype == "bfloat16" else None
    pal = args.pallas_smooth and jax.default_backend() != "cpu"
    if args.topo_3d:
        # the reference's 3D block workload (topo.py:150-152, 64x32x32
        # nodes) at the GMG-friendly odd sizes
        n = args.n3d_topo
        nx, ny, nz = 2 * n - 1, n, n
        creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                     nnodes_z=nz, element_type="block")
        conn, X, dof_fixed, nodal_force = (
            creator.create_linear_elasticity_problem()
        )
        model = fem.LinearElasticity("hex8", X, conn, dof_fixed, None,
                                     nodal_force, p=3.0, dtype=dtype)
        log(f"topo3d: state ndof={model.ndof} design nvars={model.nnodes}")
        model.attach_structured_grid(
            nx, ny, nz, nu_pre=args.nu, nu_post=args.nu,
            min_n=args.min_n3d, smoother_dtype=sm_dtype,
            pallas_smooth=pal, pallas_tz=args.pallas_tz,
            **({} if args.omega is None else {"omega": args.omega}),
            **_cheb_kw(args),
        )
        filtr = fem.Helmholtz(args.r0, "hex8", np.asarray(X), conn,
                              dtype=dtype, rtol=1e-6)
        filtr.attach_structured_grid(nx, ny, nz)
    else:
        nx, ny = args.nx, args.ny
        creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                     element_type="quad")
        conn, X, dof_fixed, nodal_force = (
            creator.create_linear_elasticity_problem()
        )
        model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None,
                                     nodal_force, p=3.0, dtype=dtype)
        log(f"topo: state ndof={model.ndof} design nvars={model.nnodes}")
        model.attach_structured_grid(
            nx, ny, nu_pre=args.nu, nu_post=args.nu, min_n=args.min_n,
            smoother_dtype=sm_dtype, pallas_smooth=pal,
            pallas_ty=args.pallas_ty, pallas_min=args.pallas_min,
            **({} if args.omega is None else {"omega": args.omega}),
            **_cheb_kw(args),
        )
        filtr = fem.Helmholtz(args.r0, "quad4", np.asarray(X), conn,
                              dtype=dtype, rtol=1e-6)
        filtr.attach_structured_grid(nx, ny)
    dev = DeviceTopo(model, filtr, fixed_volume=0.4, rtol=args.rtol,
                     maxiter=args.maxiter)

    log("[topo] compiling (2-iteration warmup)...")
    t0 = time.time()
    dev.optimize(max_iterations=2, verbose=False, log_every=2)
    log(f"[topo] compile+warmup: {time.time()-t0:.1f}s")

    dev.history.clear()
    x, rho = dev.optimize(max_iterations=args.topo_iters, verbose=False,
                          log_every=max(1, args.topo_iters // 4))
    h0, h1 = dev.history[0], dev.history[-1]
    vol = float(model.volume(rho))
    log(f"[topo] {args.topo_iters} iters in {dev.elapsed:.2f}s "
        f"({dev.s_per_iter:.4f} s/iter, steady "
        f"{dev.steady_s_per_iter:.4f}); compliance "
        f"{h0['obj']:.4f} -> {h1['obj']:.4f}, volume {vol:.4f}")
    dim = "3D hex8" if args.topo_3d else "2D quad4"
    print(json.dumps({
        "metric": (
            f"SIMP topology optimization s/MMA-iteration (fused device "
            f"loop, {dim}), {model.ndof} state dof, {model.nnodes} "
            f"design vars, {args.dtype}, gmg-pcg rtol={args.rtol}"
        ),
        "value": round(dev.s_per_iter, 4),
        "unit": "s/iter",
        # SELF-RELATIVE baseline: this repo's round-1 host-bound loop
        # measured 8.6 s/iter (at 16k dof).  The reference publishes no
        # number for its ParOpt loop (BASELINE.md); the driver's 5-s
        # target is a time-to-solution bar, not a per-iteration one, so
        # the honest denominator here is our own first implementation.
        "vs_baseline": round(8.6 / dev.s_per_iter, 3),
        "vs_baseline_note": "self-relative (round-1 host loop, 8.6 "
                            "s/iter); reference publishes no number",
        "iters": args.topo_iters,
        "steady_s_per_iter": round(dev.steady_s_per_iter, 4),
        "compliance_first": h0["obj"],
        "compliance_last": h1["obj"],
        "volume": vol,
        "cg_iters_last": h1["cg_iters"],
    }))


_V5E_HBM_GBPS = 819.0  # TPU v5e HBM peak bandwidth (GB/s)


def _arr_bytes(*arrs):
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize
               for a in arrs if a is not None)


def run_profile(args, log):
    """Per-phase timings + dispatch/sync floor as a JSON artifact.

    Makes the NOTES.md relay-tax and roofline claims driver-reproducible
    (VERDICT r4 next #9).  Every phase program is a FULL jitted program
    from nodal rho (the proven run_2d timing pattern — no eager ops
    through the TPU relay, chained data dependence so nothing can be
    served from a result cache); phase costs are attributed by
    SUBTRACTING pipelined marginals of nested programs:

        assemble            = t(assemble)
        fine_smooth         = t(assemble+presmooth) - t(assemble)
        fine_matvec         = t(assemble+matvec)    - t(assemble)
        transfers           = t(assemble+presmooth+transfer)
                              - t(assemble+presmooth)
        vcycle              = t(assemble+vcycle)    - t(assemble)
        full_solve          = t(assemble+PCG)       [the headline]

    ``relay_floor_s`` is the measured dispatch+sync latency of a trivial
    chained program; on the tunneled chip it is ~26 ms and explains
    single_shot - pipelined on every phase.

    Approximate HBM columns: bytes_moved counts coefficient reads plus
    field reads/writes (formulas in-line); pct_hbm_peak divides by the
    v5e peak (819 GB/s).  Estimates — fusion can remove field traffic —
    but the coefficient terms are exact lower bounds.
    """
    import jax
    import jax.numpy as jnp
    import pyfem_gpu_testflight_tpu as fem
    from pyfem_gpu_testflight_tpu import multigrid
    from pyfem_gpu_testflight_tpu.ops.dia import (
        interleave_to_planar, planar_to_interleave,
    )

    log("[profile] setup...")
    dtype = jnp.dtype(args.dtype)
    sm_dtype = jnp.bfloat16 if args.smoother_dtype == "bfloat16" else None
    three_d = args.profile_dim == "3d"
    if three_d:
        n = args.n3d
        creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                     element_type="block")
        conn, X, dof_fixed, nodal_force = (
            creator.create_linear_elasticity_problem()
        )
        model = fem.LinearElasticity("hex8", X, conn, dof_fixed, None,
                                     nodal_force, p=0.0, dtype=dtype)
        Ls = tuple(float(X[:, k].max()) for k in range(3))
        asm = multigrid.GMGAssembler3D(
            n, n, n, *Ls, "elasticity", p=0.0, dtype=dtype,
            nu_pre=args.nu, nu_post=args.nu, smoother_dtype=sm_dtype,
            pallas_smooth=args.pallas_smooth, pallas_min=args.pallas_min,
            pallas_tz=args.pallas_tz, pallas_asm_min=args.pallas_asm_min,
            elem_path=args.elem_path, min_n=args.min_n3d,
            coarse_dense_max=args.coarse_max,
            **({} if args.omega is None else {"omega": args.omega}),
            **({} if args.pallas_sym is None
               else {"pallas_sym": args.pallas_sym}),
            **_cheb_kw(args),
        )
        nd, grid = 3, (n, n, n)
    else:
        nx, ny = args.nx, args.ny
        creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                     element_type="quad")
        conn, X, dof_fixed, nodal_force = (
            creator.create_linear_elasticity_problem()
        )
        model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None,
                                     nodal_force, p=0.0, dtype=dtype)
        Lx, Ly = float(X[:, 0].max()), float(X[:, 1].max())
        asm = multigrid.GMGAssembler(
            nx, ny, Lx, Ly, "elasticity", p=0.0, dtype=dtype,
            nu_pre=args.nu, nu_post=args.nu, min_n=args.min_n,
            coarse_dense_max=args.coarse_max, smoother_dtype=sm_dtype,
            pallas_smooth=args.pallas_smooth, pallas_ty=args.pallas_ty,
            pallas_min=args.pallas_min,
            **({} if args.omega is None else {"omega": args.omega}),
            **({} if args.pallas_sym is None
               else {"pallas_sym": args.pallas_sym}),
            **_cheb_kw(args),
        )
        nd, grid = 2, (ny, nx)
    log(f"profile({args.profile_dim}): ndof={model.ndof} "
        f"levels={asm.sizes}")

    rho = jnp.ones((model.nnodes,), dtype)
    rhs = jnp.asarray(model.compute_rhs(), dtype)
    field_shape = (nd,) + grid
    fbytes = int(np.prod(field_shape)) * dtype.itemsize
    nu = int(args.nu)

    def _leaf(chain):
        return jax.tree_util.tree_leaves(chain)[0].reshape(-1)[0]

    def _rho(chain):
        # formal data dependence: back-to-back chained calls can't be
        # served from any result cache
        return rho + 0.0 * _leaf(chain).astype(dtype)

    def _b(lv0, chain):
        rhs_g = interleave_to_planar(rhs, nd).reshape(field_shape)
        b = jnp.where(lv0.mask, 0.0, rhs_g)
        return b + 0.0 * _leaf(chain).astype(dtype)

    def _presmooth(gmg, lv0, b):
        """The V-cycle's fine pre-sweeps + residual (fused when the
        level runs the Pallas kernels — mirrors GMG._cycle k=0)."""
        oms = gmg._omegas(gmg.nu_pre)
        if getattr(lv0, "pallas", False):
            x, rr = lv0.presmooth_resid(b, gmg.nu_pre, oms)
            return x, rr
        if getattr(lv0, "pallas3", False) and lv0.can_fuse3d(
                gmg.nu_pre, True, True):
            x, rr = lv0.presmooth_resid3d(b, gmg.nu_pre, oms)
            return x, rr
        x = gmg._smooth(lv0, jnp.zeros_like(b), b, gmg.nu_pre,
                        x0_zero=True)
        rr = jnp.where(lv0.mask, 0.0, b - lv0.matvec_lp(x))
        return x, rr

    # phase programs (each one full jit from rho)
    def p_assemble(chain):
        # return every level's coefficient arrays so the coarse
        # hierarchy is not dead-code-eliminated
        gmg, lv0 = asm.assemble(_rho(chain))
        out = []
        for lv in gmg.levels:
            for c in (getattr(lv, "coeff_k", None), lv.coeff_e,
                      lv.dense_inv, lv.chol):
                if c is not None:
                    out.append(c[0] if isinstance(c, tuple) else c)
        return tuple(out)

    def p_asm_matvec(chain):
        gmg, lv0 = asm.assemble(_rho(chain))
        return lv0.matvec(_b(lv0, chain))

    def p_asm_smooth(chain):
        gmg, lv0 = asm.assemble(_rho(chain))
        x, rr = _presmooth(gmg, lv0, _b(lv0, chain))
        return rr

    def p_asm_smooth_transfer(chain):
        gmg, lv0 = asm.assemble(_rho(chain))
        x, rr = _presmooth(gmg, lv0, _b(lv0, chain))
        coarse = gmg.levels[1]
        bc = gmg.restrict_fn(rr, coarse.shape)
        bc = jnp.where(coarse.mask, 0.0, bc)
        return gmg.prolong_fn(bc, lv0.shape)

    def p_asm_vcycle(chain):
        gmg, lv0 = asm.assemble(_rho(chain))
        return gmg.apply(_b(lv0, chain))

    def p_full_solve(chain):
        gmg, lv0 = asm.assemble(_rho(chain))
        x, k, rn = multigrid.pcg_gmg(
            gmg, lv0, _b(lv0, chain), rtol=args.rtol,
            maxiter=args.maxiter, flexible=sm_dtype is not None,
        )
        return planar_to_interleave(x.reshape(-1), nd)

    def time_program(fn, label, reps=None):
        """(single_shot_s, pipelined_s): median serialized latency and
        steady-state marginal of the chained program (run_2d pattern)."""
        reps = reps or args.repeats
        f = jax.jit(fn)
        x = jax.block_until_ready(f(rhs))  # compile
        times = []
        for _ in range(reps):
            t0 = time.time()
            x = jax.block_until_ready(f(x))
            times.append(time.time() - t0)
        single = float(np.median(times))
        depth = 8
        t0 = time.time()
        for _ in range(depth):
            x = f(x)
        jax.block_until_ready(x)
        t_short = time.time() - t0
        t0 = time.time()
        for _ in range(4 * depth):
            x = f(x)
        jax.block_until_ready(x)
        pipelined = max(
            0.0, ((time.time() - t0) - t_short) / (3 * depth)
        )
        log(f"[profile:{label}] single={single:.4f}s "
            f"pipelined={pipelined:.4f}s")
        return single, pipelined

    # dispatch/sync floor: trivial chained program; its serialized
    # latency is pure relay round trip, its pipelined marginal ~0
    fl_s, fl_p = time_program(lambda c: c + 1.0, "relay_floor", reps=7)
    relay_floor = max(0.0, fl_s - fl_p)

    raw = {}
    for label, fn in (
        ("assemble", p_assemble),
        ("asm+matvec", p_asm_matvec),
        ("asm+smooth", p_asm_smooth),
        ("asm+smooth+transfer", p_asm_smooth_transfer),
        ("asm+vcycle", p_asm_vcycle),
        ("full_solve", p_full_solve),
    ):
        raw[label] = time_program(fn, label)

    # subtractive attribution on the pipelined marginals
    t_asm = raw["assemble"][1]
    derived = {
        "fine_matvec": raw["asm+matvec"][1] - t_asm,
        "fine_smooth": raw["asm+smooth"][1] - t_asm,
        "transfers": raw["asm+smooth+transfer"][1] - raw["asm+smooth"][1],
        "vcycle": raw["asm+vcycle"][1] - t_asm,
    }

    # byte estimates: coefficient traffic is sized from the packed
    # coefficient layout (nd*nd*9 [2D] / nd*nd*27 [3D] planes; sym
    # storage roughly halves it; bf16 smoother copies halve it again)
    taps = 9 if nd == 2 else 27
    npts = int(np.prod(grid))
    sym = args.pallas_sym if args.pallas_sym is not None else three_d
    coeff_bytes = nd * nd * taps * npts * dtype.itemsize
    if sym:
        coeff_bytes = coeff_bytes * 19 // 36 if nd == 2 else (
            coeff_bytes * 63 // 108)
    coeff_lp_bytes = (
        coeff_bytes // (dtype.itemsize // jnp.dtype(sm_dtype).itemsize)
        if sm_dtype else coeff_bytes
    )
    bytes_est = {
        # writes every level's coefficients (fine level dominates the
        # geometric series: x ~4/3 in 2D, ~8/7 in 3D)
        "assemble": int(coeff_bytes * (4 / 3 if nd == 2 else 8 / 7)),
        # coeff read + field in/out
        "fine_matvec": coeff_bytes + 2 * fbytes,
        # fused sweeps: one low-precision coefficient pass + 3 fields
        "fine_smooth": coeff_lp_bytes + 3 * fbytes,
        "transfers": int(2 * fbytes * 1.25),
        # pre+post coefficient passes over the level series
        "vcycle": int(2 * coeff_lp_bytes * (4 / 3 if nd == 2 else 8 / 7)),
    }

    phases = {"relay_floor": {"single_shot_s": round(fl_s, 5),
                              "pipelined_s": round(fl_p, 5)}}
    for label, (s, p) in raw.items():
        phases[label] = {"single_shot_s": round(s, 5),
                         "pipelined_s": round(p, 5)}
    for label, t in derived.items():
        t = max(t, 0.0)
        e = {"pipelined_s": round(t, 5), "derived": True}
        b = bytes_est.get(label)
        if b and t > 1e-6:
            e["bytes_moved"] = int(b)
            e["approx_gbps"] = round(b / t / 1e9, 1)
            e["pct_hbm_peak"] = round(100.0 * b / t / 1e9 / _V5E_HBM_GBPS,
                                      1)
        phases[label] = e
    b = bytes_est["assemble"]
    t = phases["assemble"]["pipelined_s"]
    if t > 1e-6:
        phases["assemble"].update(
            bytes_moved=int(b), approx_gbps=round(b / t / 1e9, 1),
            pct_hbm_peak=round(100.0 * b / t / 1e9 / _V5E_HBM_GBPS, 1))

    print(json.dumps({
        "metric": (
            f"GMG-PCG phase profile ({args.profile_dim}), {model.ndof} "
            f"dof, {args.dtype}, nu={nu}"
        ),
        "value": round(raw["full_solve"][1], 5),
        "unit": "s",
        "vs_baseline": round(5.0 / max(raw["full_solve"][1], 1e-9), 3),
        "relay_floor_s": round(relay_floor, 5),
        "hbm_peak_gbps": _V5E_HBM_GBPS,
        "phases": phases,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    choices=["all", "2d", "3d", "quadratic", "topo",
                             "newton", "profile"],
                    default="all",
                    help="'all' (default) runs the 2D, 3D, quadratic, "
                         "and topo headline configs, one JSON line "
                         "each; 'newton' runs the fused GMG-Newton "
                         "nonlinear solve; 'profile' emits per-phase "
                         "timings + the dispatch/sync floor as JSON")
    ap.add_argument("--profile-dim", dest="profile_dim",
                    choices=["2d", "3d"], default="2d",
                    help="which headline config the phase profile runs")
    ap.add_argument("--n3d-quad", dest="n3d_quad", type=int, default=65,
                    help="quadratic config: brick20 lattice nodes per "
                         "axis (65 -> ~0.42M live dof)")
    ap.add_argument("--n3d", type=int, default=65,
                    help="3D config: nodes per axis")
    ap.add_argument("--topo-iters", dest="topo_iters", type=int,
                    default=40, help="timed MMA iterations (topo config)")
    ap.add_argument("--newton-n", dest="newton_n", type=int, default=1025,
                    help="newton config: nodes per axis")
    ap.add_argument("--newton-tol", dest="newton_tol", type=float,
                    default=2e-2,
                    help="newton config: relative residual tolerance "
                         "(the TRUE-residual floor — double-float "
                         "flux measurement — is ~1.2e-2 at 1025^2 in "
                         "f32, set by the tangent GMRES recheck "
                         "floor; the f64 reference contract of 1e-10 "
                         "is gated by the CPU test suite)")
    ap.add_argument("--newton-lin-rtol", dest="newton_lin_rtol",
                    type=float, default=1e-2,
                    help="newton config: tangent GMRES rtol "
                         "(inexact-Newton forcing term)")
    ap.add_argument("--topo-3d", dest="topo_3d", action="store_true",
                    help="topo config on the 3D hex8 cantilever "
                         "(reference topo.py element_type='block')")
    ap.add_argument("--n3d-topo", dest="n3d_topo", type=int, default=33,
                    help="3D topo: nodes per y/z axis (x gets 2n-1)")
    ap.add_argument("--r0", type=float, default=0.01,
                    help="Helmholtz filter radius (topo config)")
    ap.add_argument("--nx", type=int, default=1025)
    ap.add_argument("--ny", type=int, default=513)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=200)
    ap.add_argument("--precond", choices=["gmg", "jacobi"], default="gmg")
    ap.add_argument("--accuracy-op", dest="accuracy_op",
                    choices=["df64", "xla64"], default="df64",
                    help="accuracy-mode fine operator: compensated "
                         "two-float32 stencil matvec (df64, default) "
                         "or XLA's software-f64 emulation (xla64)")
    ap.add_argument("--accuracy", action="store_true",
                    help="mixed precision: float64 fine operator + CG, "
                         "float32 GMG preconditioner (near-f64 solution)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--omega", type=lambda v: None if v == "default"
                    else (v if v == "cheby" else float(v)),
                    default="cheby",
                    help="smoother damping: a float (stationary "
                         "Jacobi), or 'cheby' (default) for per-sweep "
                         "Chebyshev-node factors — same cost per "
                         "sweep, ~25%% fewer PCG iterations; "
                         "'default' uses each assembler's tuned "
                         "stationary value")
    ap.add_argument("--nu", type=int, default=2,
                    help="GMG pre/post smoothing iterations")
    ap.add_argument("--cheb-lam", dest="cheb_lam", type=float,
                    default=None,
                    help="spectral-radius bound for the Chebyshev-node "
                         "smoother (default: each assembler's "
                         "physics-tuned value)")
    ap.add_argument("--cheb-frac", dest="cheb_frac", type=float,
                    default=None,
                    help="smoothing-interval lower bound lam/frac for "
                         "omega='cheby' (default 8)")
    ap.add_argument("--pallas-smooth", dest="pallas_smooth",
                    action="store_true", default=True,
                    help="fused Pallas Jacobi smoother in the V-cycle "
                         "(2D config; default on)")
    ap.add_argument("--no-pallas-smooth", dest="pallas_smooth",
                    action="store_false")
    ap.add_argument("--pallas-ty", dest="pallas_ty", type=int, default=32,
                    help="row-tile size of the fused smoother kernel")
    ap.add_argument("--pallas-min", dest="pallas_min", type=int, default=0,
                    help="smallest ny*nx level using the Pallas smoother")
    ap.add_argument("--elem-path", dest="elem_path",
                    choices=["uniform", "otf", "einsum"],
                    default="uniform",
                    help="3D operator route: assembled uniform "
                         "coefficients, on-the-fly (no coefficient "
                         "arrays), or per-element einsum")
    ap.add_argument("--pallas-asm-min", dest="pallas_asm_min", type=int,
                    default=0,
                    help="min nodes for the fused Pallas 3D assembly "
                         "(smaller levels assemble via XLA); 0 = every "
                         "level, the measured-fastest setting on chip")
    ap.add_argument("--pallas-tz", dest="pallas_tz", type=int, default=5,
                    help="z-slabs per program for the 3D fused kernels "
                         "(5 measured fastest at 65^3 on v5e: 0.0474 "
                         "single-shot / 0.0234 pipelined; 8 exceeds "
                         "the scoped-vmem stack)")
    ap.add_argument("--pallas-sym", dest="pallas_sym", default=None,
                    action="store_true",
                    help="half-stencil (symmetric) coefficient storage "
                         "(default: on for 3D, off for 2D)")
    ap.add_argument("--no-pallas-sym", dest="pallas_sym",
                    action="store_false")
    ap.add_argument("--smoother-dtype", dest="smoother_dtype",
                    choices=["none", "bfloat16"], default="bfloat16",
                    help="low-precision coefficient copy for the Pallas "
                         "smoother (flexible PCG; PCG operator stays "
                         "f32)")
    ap.add_argument("--min_n", type=int, default=5,
                    help="coarsest-grid size floor (2D)")
    ap.add_argument("--min_n3d", type=int, default=3,
                    help="coarsest-grid size floor (3D)")
    ap.add_argument("--coarse-max", dest="coarse_max", type=int,
                    default=4096,
                    help="largest coarse-level dof count solved by the "
                         "dense inverse (bigger truncates the level "
                         "tail earlier)")
    ap.add_argument("--no-accuracy-extra", dest="no_accuracy_extra",
                    action="store_true",
                    help="skip the mixed-precision accuracy-mode extra "
                         "(quick timing sweeps)")
    ap.add_argument("--check", action="store_true",
                    help="compare against host scipy direct solve")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    import jax

    # persistent compile cache: remote TPU compiles run minutes; repeat
    # bench invocations should not pay them again
    jax.config.update("jax_compilation_cache_dir", "/tmp/pyfem_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    log = (lambda *a: None) if args.quiet else (
        lambda *a: print(*a, file=sys.stderr, flush=True)
    )

    if args.config == "profile":
        run_profile(args, log)
        return
    if args.config == "3d":
        run_3d(args, log)
        return
    if args.config == "quadratic":
        run_quadratic(args, log)
        return
    if args.config == "topo":
        run_topo(args, log)
        return
    if args.config == "newton":
        run_newton(args, log)
        return
    if args.config == "2d":
        run_2d(args, log)
        return

    # default: all headline configs, one JSON line each; a failure in
    # one config must not lose the others' numbers (topo last — its
    # line is the one the driver parses)
    for name, fn in (("2d", run_2d), ("3d", run_3d),
                     ("quadratic", run_quadratic),
                     ("newton", run_newton), ("topo", run_topo)):
        try:
            fn(args, log)
        except Exception as e:  # noqa: BLE001 - keep remaining configs
            print(f"[bench] config {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)


def run_2d(args, log):
    """Plane-stress 1M-dof assembly+solve (the original headline)."""
    import jax
    import jax.numpy as jnp
    import pyfem_gpu_testflight_tpu as fem
    from pyfem_gpu_testflight_tpu import multigrid

    dtype = jnp.dtype(args.dtype)
    log(f"devices: {jax.devices()}")
    creator = fem.ProblemCreator(nnodes_x=args.nx, nnodes_y=args.ny,
                                 element_type="quad")
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity(
        "quad4", X, conn, dof_fixed, None, nodal_force, p=0.0, dtype=dtype
    )
    ndof = model.ndof
    Lx, Ly = float(X[:, 0].max()), float(X[:, 1].max())
    log(f"ndof={ndof} nelems={model.nelems} dtype={dtype} "
        f"precond={args.precond}")

    sm_dtype = jnp.bfloat16 if args.smoother_dtype == "bfloat16" else None
    asm = multigrid.GMGAssembler(
        args.nx, args.ny, Lx, Ly, "elasticity", p=0.0, dtype=dtype,
        nu_pre=args.nu, nu_post=args.nu, min_n=args.min_n,
        coarse_dense_max=args.coarse_max, smoother_dtype=sm_dtype,
        **({} if args.omega is None else {"omega": args.omega}),
        pallas_smooth=args.pallas_smooth, pallas_ty=args.pallas_ty,
        pallas_min=args.pallas_min,
        **({} if args.pallas_sym is None
           else {"pallas_sym": args.pallas_sym}),
        **_cheb_kw(args),
    )
    log(f"gmg levels: {asm.sizes}")
    maxiter, rtol = args.maxiter, args.rtol
    if args.precond == "jacobi" and args.maxiter == 200:
        maxiter = 30000

    from pyfem_gpu_testflight_tpu.ops.dia import (
        interleave_to_planar, planar_to_interleave,
    )

    # -- accuracy (mixed f64/f32) step ------------------------------------
    # float64 fine-level operator (uniform-geometry unit matrices — the
    # f64-safe, einsum-free route on TPU) + the *f32 Pallas* V-cycle
    # applied through casts under flexible PCG (the preconditioner only
    # steers the search direction; the f64 operator sets the accuracy)
    def make_accuracy_step():
        rtol64 = 1e-11 if args.rtol == 1e-6 else args.rtol
        st0 = asm.static_levels[0][0]
        mask0 = asm.static_levels[0][3]
        asm64 = multigrid.GMGAssembler(
            args.nx, args.ny, Lx, Ly, "elasticity", p=0.0,
            dtype=jnp.float64,
        )
        Kq64 = asm64.static_levels[0][5]
        df = args.accuracy_op == "df64"

        # Two jits: the f64 assembly program compiles separately from
        # the solve (one compiler OOM'd on the fused program)
        @jax.jit
        def assemble64(rho):
            rho_grid = rho.astype(jnp.float64).reshape(args.ny, args.nx)
            coeff64 = st0.assemble_uniform(
                asm64.material_planes(rho_grid), Kq64
            )
            if not df:
                return coeff64
            # double-float operator (ops/df64.py): BC-eliminated f64
            # coefficients split into an (hi, lo) f32 pair — the matvec
            # then runs compensated f32 vector arithmetic instead of
            # XLA's software-f64 emulation (the accuracy-mode tax,
            # VERDICT r4 weak #1)
            from pyfem_gpu_testflight_tpu.ops import df64 as dfmod

            return dfmod.df_split(st0.bc_eliminate(coeff64, mask0))

        def solve64(coeff64, rho, rhs, chain):
            from pyfem_gpu_testflight_tpu.ops import df64 as dfmod

            rho = rho + 0.0 * chain[0].astype(rho.dtype)
            gmg32, lv0 = asm.assemble(rho)  # f32 (Pallas) hierarchy
            mask = lv0.mask
            rhs_g = interleave_to_planar(rhs.astype(jnp.float64), 2).reshape(
                2, args.ny, args.nx
            )
            b = jnp.where(mask, 0.0, rhs_g)
            if df:
                # PCG entirely in double-float vector arithmetic:
                # XLA's software f64 is ~200x slower than f32 for the
                # O(n) axpy/dot loop (the real VERDICT-r4 weak-#1 tax —
                # the f64 matvec itself was only 0.5 ms)
                chi, clo = coeff64
                mv = lambda uh, ul: dfmod.stencil_matvec_df(
                    st0, chi, clo, uh, ul
                )
                pre32 = lambda r32: gmg32.apply(
                    jnp.where(mask, 0.0, r32)
                )
                x, k, rn = dfmod.pcg_df(mv, pre32, b, rtol=rtol64,
                                        maxiter=maxiter, flexible=True)
                return planar_to_interleave(x.reshape(-1), 2), k, rn

            matvec = lambda u: st0.bc_matvec(coeff64, mask, u)

            def precond(r):
                z = gmg32.apply(
                    jnp.where(mask, 0.0, r).astype(jnp.float32)
                )
                return z.astype(jnp.float64)

            x, k, rn = multigrid.pcg(matvec, precond, b, rtol=rtol64,
                                     maxiter=maxiter, flexible=True)
            return planar_to_interleave(x.reshape(-1), 2), k, rn

        solve64_jit = jax.jit(solve64)

        def step(rho, rhs, chain):
            coeff64 = assemble64(rho)
            return solve64_jit(coeff64, rho, rhs, chain)

        return step, rtol64

    def make_speed_step():
        def step(rho, rhs, chain):
            # chain: previous solution (or rhs); the zero-weighted term
            # makes back-to-back calls data-dependent, so pipelined
            # throughput timing can't be served from a result cache
            rho = rho + 0.0 * chain[0]
            gmg, lv0 = asm.assemble(rho)
            rhs_g = interleave_to_planar(rhs, 2).reshape(2, args.ny, args.nx)
            b = jnp.where(lv0.mask, 0.0, rhs_g)
            if args.precond == "gmg":
                x, k, rn = multigrid.pcg_gmg(
                    gmg, lv0, b, rtol=rtol, maxiter=maxiter,
                    flexible=sm_dtype is not None,
                )
            else:
                precond = lambda r: lv0.inv_diag * jnp.where(
                    lv0.mask, 0.0, r
                )
                x, k, rn = multigrid.pcg(lv0.matvec, precond, b,
                                         rtol=rtol, maxiter=maxiter,
                                         flexible=sm_dtype is not None)
            return planar_to_interleave(x.reshape(-1), 2), k, rn

        return jax.jit(step)

    rho = jnp.full((model.nnodes,), 1.0, dtype=dtype)
    rhs = jnp.asarray(model.compute_rhs(), dtype=dtype)

    def time_step(step_fn, label, pipeline=8):
        log(f"[{label}] compiling...")
        t0 = time.time()
        try:
            u, iters, resnorm = step_fn(rho, rhs, rhs)
            u.block_until_ready()
        except Exception as e:  # transient device faults: one retry
            log(f"[{label}] first run failed ({type(e).__name__}); retry...")
            u, iters, resnorm = step_fn(rho, rhs, rhs)
            u.block_until_ready()
        log(f"[{label}] compile+first run: {time.time()-t0:.1f}s "
            f"iters={int(iters)} resnorm={float(resnorm):.3e}")
        # warm the timed signature (chain dtype switches rhs -> u, which
        # is a second compile for the mixed-precision step)
        u, iters, resnorm = step_fn(rho, rhs, u)
        u.block_until_ready()
        # single-shot latency (serialized; includes per-call dispatch
        # round trips — on a remote-tunneled chip these dominate)
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            u, iters, resnorm = step_fn(rho, rhs, u)
            u.block_until_ready()
            times.append(time.time() - t0)
        single = float(np.median(times))
        # pipelined throughput: chained data-dependent solves dispatched
        # back-to-back.  The steady-state (marginal) cost between two
        # pipeline depths removes the one-time sync round trip (~25 ms
        # on the remote tunnel) that a single fixed depth smears over
        # every solve.
        t0 = time.time()
        for _ in range(pipeline):
            u, iters, resnorm = step_fn(rho, rhs, u)
        u.block_until_ready()
        t_short = time.time() - t0
        t0 = time.time()
        for _ in range(4 * pipeline):
            u, iters, resnorm = step_fn(rho, rhs, u)
        u.block_until_ready()
        t_long = time.time() - t0
        elapsed = (t_long - t_short) / (3 * pipeline)
        log(f"[{label}] single-shot={['%.3f' % t for t in times]} "
            f"pipelined={elapsed:.4f}s/solve "
            f"iters={int(iters)} resnorm={float(resnorm):.3e}")
        return elapsed, single, int(iters), float(resnorm), u

    extra = {}
    if args.accuracy:
        step, rtol = make_accuracy_step()
        elapsed, single, iters, resnorm, u = time_step(step, "accuracy")
        extra["single_shot_s"] = round(single, 4)
    else:
        elapsed, single, iters, resnorm, u = time_step(
            make_speed_step(), "speed"
        )
        extra["single_shot_s"] = round(single, 4)
        if args.precond == "gmg" and not args.no_accuracy_extra:
            # also report the mixed-precision accuracy mode (same dofs)
            try:
                acc_step, acc_rtol = make_accuracy_step()
                acc_t, acc_single, acc_k, acc_rn, acc_u = time_step(
                    acc_step, "accuracy", pipeline=3
                )
                extra.update(
                    accuracy_mode_s=round(acc_t, 4),
                    accuracy_mode_iters=acc_k,
                    accuracy_mode_rtol=acc_rtol,
                )
            except Exception as e:
                acc_u = None
                log(f"accuracy-mode extra failed: {type(e).__name__}")

    if args.check:
        log("host scipy check...")
        # float64 oracle entirely on CPU (f64 einsums on TPU are emulated
        # and memory-hungry; the oracle is a host path by design)
        with jax.default_device(jax.devices("cpu")[0]):
            model64 = fem.LinearElasticity(
                "quad4", X, conn, dof_fixed, None, nodal_force,
                dtype=jnp.float64,
            )
            u_ref = np.asarray(model64.solve(method="direct"))
        rng = np.random.RandomState(123)
        p = rng.rand(ndof)
        rel = abs((p @ np.asarray(u, np.float64) - p @ u_ref) / (p @ u_ref))
        extra["pTu_rel_err_vs_scipy"] = float(rel)
        log(f"pTu rel err vs scipy: {rel:.3e}")
        if not args.accuracy and extra.get("accuracy_mode_s") and (
            acc_u is not None
        ):
            rel_a = abs(
                (p @ np.asarray(acc_u, np.float64) - p @ u_ref) / (p @ u_ref)
            )
            extra["accuracy_mode_pTu_rel_err"] = float(rel_a)
            log(f"accuracy-mode pTu rel err vs scipy: {rel_a:.3e}")

    mode = (
        "mixed-f64/f32" if args.accuracy else args.dtype
    )
    # headline = honest single-solve latency (dispatch included);
    # pipelined throughput (chained solves, the hardware number) is the
    # labeled extra
    result = {
        "metric": (
            f"plane-stress assembly+CG time-to-solution (single-shot), "
            f"{ndof} dof, {mode}, rtol={rtol}, {args.precond}-pcg"
        ),
        "value": round(single, 4),
        "unit": "s",
        "vs_baseline": round(5.0 / single, 3),
        "cg_iters": int(iters),
        "resnorm": float(resnorm),
        "pipelined_s": round(elapsed, 4),
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
