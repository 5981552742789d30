"""Double-float stencil matvec (ops/df64.py) vs the XLA f64 oracle.

The accuracy-mode fine operator must match true float64 well below the
1e-11 solve tolerance while running entirely in f32 vector arithmetic
(VERDICT r4 weak #1 / next #3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyfem_gpu_testflight_tpu as fem
from pyfem_gpu_testflight_tpu import multigrid
from pyfem_gpu_testflight_tpu.ops import df64

jax.config.update("jax_enable_x64", True)

pytestmark = pytest.mark.quick


def _system(nx=65, ny=33):
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    asm = multigrid.GMGAssembler(
        nx, ny, float(X[:, 0].max()), float(X[:, 1].max()),
        "elasticity", p=3.0, dtype=jnp.float64,
    )
    rng = np.random.RandomState(7)
    rho = jnp.asarray(0.2 + 0.8 * rng.rand(ny, nx))
    st0 = asm.static_levels[0][0]
    Kq64 = asm.static_levels[0][5]
    coeff = st0.assemble_uniform(asm.material_planes(rho), Kq64)
    u = jnp.asarray(rng.standard_normal((2, ny, nx)))
    return st0, coeff, u


def test_df64_matvec_matches_f64():
    st0, coeff, u = _system()
    y64 = st0.matvec(coeff, u)
    chi, clo = df64.df_split(coeff)
    y = df64.stencil_matvec_f64(st0, chi, clo, u)
    rel = float(jnp.linalg.norm(y - y64) / jnp.linalg.norm(y64))
    # compensated f32 arithmetic: well below the 1e-11 solve tolerance
    assert rel < 5e-14, rel
    # and the SAME accuracy under whole-program compilation: fused
    # lowering runs LLVM FMA contraction, which silently broke the
    # Veltkamp-TwoProd formulation (eager ops compile one-by-one and
    # hid it); the mantissa-mask formulation must hold under jit
    yj = jax.jit(
        lambda ch, cl, v: df64.stencil_matvec_f64(st0, ch, cl, v)
    )(chi, clo, u)
    relj = float(jnp.linalg.norm(yj - y64) / jnp.linalg.norm(y64))
    assert relj < 5e-14, relj


def test_df64_beats_plain_f32():
    """Sanity that the compensation is load-bearing: a plain f32
    matvec on the same data is ~6 digits worse."""
    st0, coeff, u = _system()
    y64 = st0.matvec(coeff, u)
    y32 = st0.matvec(coeff.astype(jnp.float32),
                     u.astype(jnp.float32)).astype(jnp.float64)
    rel32 = float(jnp.linalg.norm(y32 - y64) / jnp.linalg.norm(y64))
    chi, clo = df64.df_split(coeff)
    y = df64.stencil_matvec_f64(st0, chi, clo, u)
    rel = float(jnp.linalg.norm(y - y64) / jnp.linalg.norm(y64))
    assert rel32 > 1e-8 and rel < rel32 * 1e-4, (rel, rel32)


def test_pcg_df_matches_f64_pcg():
    """The all-double-float PCG (df vector arithmetic, f64 scalars
    only) reaches the same 1e-11-class solution as the XLA-f64 PCG on
    the BC-eliminated fine operator with an f32 GMG V-cycle
    preconditioner — the accuracy-mode solve loop without any O(n)
    software-f64 arithmetic."""
    nx, ny = 65, 33
    creator = fem.ProblemCreator(nnodes_x=nx, nnodes_y=ny,
                                 element_type="quad")
    conn, X, dof_fixed, nodal_force = (
        creator.create_linear_elasticity_problem()
    )
    model = fem.LinearElasticity("quad4", X, conn, dof_fixed, None,
                                 nodal_force, p=0.0, dtype=jnp.float64)
    Lx, Ly = float(X[:, 0].max()), float(X[:, 1].max())
    asm32 = multigrid.GMGAssembler(nx, ny, Lx, Ly, "elasticity", p=0.0,
                                   dtype=jnp.float32)
    asm64 = multigrid.GMGAssembler(nx, ny, Lx, Ly, "elasticity", p=0.0,
                                   dtype=jnp.float64)
    st0 = asm64.static_levels[0][0]
    mask0 = asm64.static_levels[0][3]
    rho32 = jnp.ones(ny * nx, jnp.float32)
    rho64 = jnp.ones(ny * nx, jnp.float64)
    gmg32, _ = asm32.assemble(rho32)
    Kq64 = asm64.static_levels[0][5]
    coeff64 = st0.bc_eliminate(
        st0.assemble_uniform(asm64.material_planes(
            rho64.reshape(ny, nx)), Kq64), mask0
    )
    from pyfem_gpu_testflight_tpu.ops.dia import interleave_to_planar

    rhs = jnp.asarray(model.compute_rhs(), jnp.float64)
    b = jnp.where(mask0, 0.0,
                  interleave_to_planar(rhs, 2).reshape(2, ny, nx))

    pre32 = lambda r32: gmg32.apply(jnp.where(mask0, 0.0, r32))
    x_ref, k_ref, rn_ref = multigrid.pcg(
        lambda u: st0.matvec(coeff64, u),
        lambda r: pre32(r.astype(jnp.float32)).astype(jnp.float64),
        b, rtol=1e-11, maxiter=200, flexible=True,
    )

    chi, clo = df64.df_split(coeff64)
    x, k, rn = df64.pcg_df(
        lambda uh, ul: df64.stencil_matvec_df(st0, chi, clo, uh, ul),
        pre32, b, rtol=1e-11, maxiter=200, flexible=True,
    )
    assert x.dtype == jnp.float64
    nb = float(jnp.linalg.norm(b))
    assert float(rn) <= 1e-11 * nb * 1.01
    # the meaningful gate: the TRUE residual of the returned solution
    # (in f64) matches the recursively-tracked one — this is exactly
    # what broke when the backend's FMA contraction perturbed the
    # compensated arithmetic (true residual 9e-5 while the recursion
    # claimed 4e-12)
    true_rn = float(jnp.linalg.norm(b - st0.matvec(coeff64, x)))
    assert true_rn <= 3e-11 * nb, (true_rn / nb, int(k))
    # solution difference is conditioning-amplified (kappa * rtol)
    rel = float(jnp.linalg.norm(x - x_ref) / jnp.linalg.norm(x_ref))
    assert rel < 1e-9, (rel, int(k), int(k_ref))
    # df iteration count stays in the same class as true f64
    assert int(k) <= int(k_ref) + 3


def test_df64_split_roundtrip():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.standard_normal(1000) * 10.0 ** rng.randint(
        -6, 6, 1000))
    hi, lo = df64.df_split(a)
    assert hi.dtype == jnp.float32 and lo.dtype == jnp.float32
    back = df64.df_merge(hi, lo)
    # a f32 pair carries 48 significant bits: the roundtrip matches to
    # ~eps_f32^2 relative (not bit-for-bit — f64 has 53)
    rel = float(jnp.max(jnp.abs(back - a) / jnp.abs(a)))
    assert rel < 6e-15, rel
