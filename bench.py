"""Headline benchmark: 1M-DOF plane-stress assembly + CG time-to-solution.

Prints ONE JSON line:
    {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 5.0/seconds}

The baseline (BASELINE.md) is the driver-set target of < 5 s on a single
TPU v5e chip for assembly + CG solve at ~1e6 dofs, with the solution
matching the host scipy reference.

Pipeline (all on device, one jit):
    nodal rho -> RAMP material -> element stiffness (Lame-form einsums)
    -> DIA (stencil) assembly via segment_sum -> Dirichlet mask BCs
    -> Jacobi-PCG on the shifted-slice DIA SpMV.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1001)
    ap.add_argument("--ny", type=int, default=500)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=30000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="compare against host scipy direct solve")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pyfem_gpu_testflight_tpu as fem
    from pyfem_gpu_testflight_tpu import solvers
    from pyfem_gpu_testflight_tpu.ops import geometry, stiffness
    from pyfem_gpu_testflight_tpu.ops.dia import DiaOperator
    from pyfem_gpu_testflight_tpu.models.base import ramp

    dtype = jnp.dtype(args.dtype)
    log = (lambda *a: None) if args.quiet else (
        lambda *a: print(*a, file=sys.stderr, flush=True)
    )

    log(f"devices: {jax.devices()}")
    creator = fem.ProblemCreator(nnodes_x=args.nx, nnodes_y=args.ny,
                                 element_type="quad")
    conn, X, dof_fixed, nodal_force = creator.create_linear_elasticity_problem()
    model = fem.LinearElasticity(
        "quad4", X, conn, dof_fixed, None, nodal_force, p=0.0, dtype=dtype
    )
    ndof = model.ndof
    log(f"ndof={ndof} nelems={model.nelems} dtype={dtype}")

    op = DiaOperator(model.conn_dof_host, ndof)
    log(f"dia offsets: {op.noffs}")

    mu, lam = model.mu, model.lam
    N, dN, wq = model.N, model.dN, model.wq
    maxiter, rtol = args.maxiter, args.rtol

    def step(rho, rhs, Xe, conn_arr, seg_ids, mask):
        rho_q = geometry.interp_to_quads(N, jnp.take(rho, conn_arr, axis=0))
        Ke = stiffness.elasticity_stiffness(Xe, dN, wq, ramp(rho_q, 0.0), mu, lam)
        dia = jax.ops.segment_sum(
            Ke.reshape(-1), seg_ids, num_segments=op.noffs * ndof
        ).reshape(op.noffs, ndof)
        b = jnp.where(mask, 0.0, rhs)
        diag = op.diagonal(dia)
        inv_diag = 1.0 / jnp.where(mask | (diag == 0.0), 1.0, diag)
        matvec = lambda u: op.bc_matvec(dia, mask, u)
        x, iters, resnorm = solvers.cg_loop(
            matvec, b, inv_diag=inv_diag, rtol=rtol, maxiter=maxiter
        )
        return x, iters, resnorm

    step_jit = jax.jit(step)

    rho = jnp.full((model.nnodes,), 1.0, dtype=dtype)
    rhs = jnp.asarray(model.compute_rhs(), dtype=dtype)
    run_args = (rho, rhs, model.Xe, model.conn, op.seg_ids, model.bc.mask)

    log("compiling...")
    t0 = time.time()
    u, iters, resnorm = step_jit(*run_args)
    u.block_until_ready()
    log(f"compile+first run: {time.time()-t0:.1f}s "
        f"iters={int(iters)} resnorm={float(resnorm):.3e}")

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        u, iters, resnorm = step_jit(*run_args)
        u.block_until_ready()
        times.append(time.time() - t0)
    elapsed = float(np.median(times))
    log(f"times={['%.3f' % t for t in times]} iters={int(iters)} "
        f"resnorm={float(resnorm):.3e}")

    extra = {}
    if args.check:
        log("host scipy check...")
        model64 = fem.LinearElasticity(
            "quad4", X, conn, dof_fixed, None, nodal_force, dtype=jnp.float64
        )
        u_ref = np.asarray(model64.solve(method="direct"))
        rng = np.random.RandomState(123)
        p = rng.rand(ndof)
        rel = abs((p @ np.asarray(u, np.float64) - p @ u_ref) / (p @ u_ref))
        extra["pTu_rel_err_vs_scipy"] = float(rel)
        log(f"pTu rel err vs scipy: {rel:.3e}")

    result = {
        "metric": (
            f"plane-stress assembly+CG time-to-solution, "
            f"{ndof} dof, {args.dtype}, rtol={args.rtol}"
        ),
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(5.0 / elapsed, 3),
        "cg_iters": int(iters),
        "resnorm": float(resnorm),
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
