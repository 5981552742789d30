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
