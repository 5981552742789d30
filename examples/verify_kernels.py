"""Element-kernel verification sweep: einsum path vs Pallas kernels.

The analogue of the reference's examples/SciTech2023/verification/verify.py
(pyfem einsum vs A2D C++ kernels on hex meshes): sweeps mesh sizes and
reports max-abs and relative differences of the element stiffness
matrices between the einsum reference path (ops.stiffness) and the
Pallas TPU kernels — quad4 (ops.pallas_stiffness) and hex8
(ops.pallas_stiffness3d, the element type the reference's A2D wrapper
actually supported, pyfem.py:2260-2264) for poisson and elasticity.
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu.models.base import ramp
from pyfem_gpu_testflight_tpu.ops import geometry, stiffness
from pyfem_gpu_testflight_tpu.ops import pallas_stiffness as pk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--interpret", action="store_true",
                    help="run Pallas in interpreter mode (CPU)")
    args = ap.parse_args()

    interpret = args.interpret or jax.default_backend() == "cpu"
    rows = []
    for n in args.sizes:
        creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n,
                                     element_type="quad")
        conn, X, dof_fixed, nodal_force = (
            creator.create_linear_elasticity_problem()
        )
        model = fem.LinearElasticity(
            "quad4", X, conn, dof_fixed, None, nodal_force, p=3.0,
            dtype=jnp.float32,
        )
        rng = np.random.RandomState(0)
        rho = jnp.asarray(0.2 + 0.8 * rng.rand(model.nnodes), jnp.float32)
        rho_q = geometry.interp_to_quads(
            model.N, jnp.take(rho, model.conn, axis=0)
        )
        cq = ramp(rho_q, model.p)
        XeT = pk.transpose_xe(model.Xe)
        cqT = jnp.transpose(cq)

        for problem in ("poisson", "elasticity"):
            if problem == "poisson":
                ref = stiffness.poisson_stiffness(
                    model.Xe, model.dN, model.wq, cq
                )
                ker = pk.poisson_stiffness_quad4(
                    XeT, cqT, tile=1024, interpret=interpret
                )
                ndpe = 4
            else:
                ref = stiffness.elasticity_stiffness(
                    model.Xe, model.dN, model.wq, cq, model.mu, model.lam
                )
                ker = pk.elasticity_stiffness_quad4(
                    XeT, cqT, model.mu, model.lam, tile=1024,
                    interpret=interpret,
                )
                ndpe = 8
            ker = jnp.transpose(ker).reshape(model.nelems, ndpe, ndpe)
            diff = float(jnp.abs(ker - ref).max())
            scale = float(jnp.abs(ref).max())
            rows.append(
                {"problem": problem, "n": n, "nelems": model.nelems,
                 "max_abs_err": diff, "rel_err": diff / scale}
            )
            print(json.dumps(rows[-1]))

    # hex8 sweep (the reference A2D verification was hex-mesh-based)
    from pyfem_gpu_testflight_tpu.ops import pallas_stiffness3d as pk3

    for n in [s_ for s_ in args.sizes if s_ <= 32]:
        creator = fem.ProblemCreator(nnodes_x=n, nnodes_y=n, nnodes_z=n,
                                     element_type="block")
        conn, X, dof_fixed, nodal_force = (
            creator.create_linear_elasticity_problem()
        )
        model = fem.LinearElasticity(
            "hex8", X, conn, dof_fixed, None, nodal_force, p=3.0,
            dtype=jnp.float32,
        )
        rng = np.random.RandomState(0)
        rho = jnp.asarray(0.2 + 0.8 * rng.rand(model.nnodes), jnp.float32)
        rho_q = geometry.interp_to_quads(
            model.N, jnp.take(rho, model.conn, axis=0)
        )
        cq = ramp(rho_q, model.p)
        XeT = pk3.transpose_xe_hex8(model.Xe)
        cqT = jnp.transpose(cq)
        for problem in ("poisson", "elasticity"):
            if problem == "poisson":
                ref = stiffness.poisson_stiffness(
                    model.Xe, model.dN, model.wq, cq
                )
                ker = pk3.poisson_stiffness_hex8(XeT, cqT,
                                                 interpret=interpret)
                ndpe = 8
            else:
                ref = stiffness.elasticity_stiffness(
                    model.Xe, model.dN, model.wq, cq, model.mu, model.lam
                )
                ker = pk3.elasticity_stiffness_hex8(
                    XeT, cqT, float(model.mu), float(model.lam),
                    interpret=interpret,
                )
                ndpe = 24
            ker = jnp.transpose(ker).reshape(model.nelems, ndpe, ndpe)
            diff = float(jnp.abs(ker - ref).max())
            scale = float(jnp.abs(ref).max())
            rows.append(
                {"problem": f"hex8-{problem}", "n": n,
                 "nelems": model.nelems, "max_abs_err": diff,
                 "rel_err": diff / scale}
            )
            print(json.dumps(rows[-1]))

    worst = max(r["rel_err"] for r in rows)
    print(f"\nworst relative difference: {worst:.3e} "
          f"({'OK' if worst < 1e-4 else 'INVESTIGATE'} for float32)")


if __name__ == "__main__":
    main()
