"""On-the-fly 3D operator (ops.pallas_otf3d): the coefficient-free
stencil application must reproduce the assembled uniform-grid operator.

The OTF kernels rebuild the stencil coefficients from the density grid
on the MXU inside every apply (the reference's element-stiffness role,
pyfem.py:2016-2027, without ever materializing Ke or the assembled
coefficient planes).  Gates: matvec identity, fused sweep sequences,
and the full GMG-PCG solve against the assembled ``elem_path="uniform"``
route.  All interpret-mode (CPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyfem_gpu_testflight_tpu import multigrid
from pyfem_gpu_testflight_tpu.multigrid import GMGAssembler3D, OTFLevel

pytestmark = pytest.mark.quick


def _assemblers(physics, n=9, tz=4, **kw):
    mk = lambda path: GMGAssembler3D(
        n, n, n, 1.0, 1.0, 1.0, physics, p=3.0, dtype=jnp.float32,
        nu_pre=2, nu_post=2, pallas_smooth=True, pallas_tz=tz,
        pallas_asm_min=0, elem_path=path, **kw,
    )
    return mk("uniform"), mk("otf")


def _fields(physics, n=9, seed=0):
    nd = 3 if physics == "elasticity" else 1
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, n ** 3), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nd, n, n, n)), jnp.float32)
    return rho, b


@pytest.mark.parametrize("physics", ["elasticity", "poisson"])
def test_otf_matvec_matches_assembled(physics):
    asm_u, asm_o = _assemblers(physics)
    rho, b = _fields(physics)
    gu, lu = asm_u.assemble(rho)
    go, lo = asm_o.assemble(rho)
    assert isinstance(lo, OTFLevel) and not isinstance(lu, OTFLevel)
    b = jnp.where(lu.mask, 0.0, b)
    yu = np.asarray(lu.matvec(b))
    yo = np.asarray(lo.matvec(b))
    rel = np.abs(yo - yu).max() / np.abs(yu).max()
    assert rel < 2e-6, rel


@pytest.mark.parametrize("physics", ["elasticity", "poisson"])
def test_otf_fused_sweeps_match_assembled(physics):
    asm_u, asm_o = _assemblers(physics)
    rho, b = _fields(physics, seed=1)
    _, lu = asm_u.assemble(rho)
    _, lo = asm_o.assemble(rho)
    b = jnp.where(lu.mask, 0.0, b)
    omega = 0.6
    for niter in (1, 2, 3):
        assert lo.can_fuse3d(niter, True, True)
        xu, ru = lu.presmooth_resid3d(b, niter, omega)
        xo, ro = lo.presmooth_resid3d(b, niter, omega)
        sx = float(jnp.abs(xu).max())
        sr = float(jnp.abs(ru).max())
        assert float(jnp.abs(xo - xu).max()) < 2e-5 * sx
        assert float(jnp.abs(ro - ru).max()) < 2e-5 * sr
        pu = lu.postsmooth3d(b, xu, niter, omega)
        po = lo.postsmooth3d(b, xu, niter, omega)
        assert float(jnp.abs(po - pu).max()) < 2e-5 * float(
            jnp.abs(pu).max()
        )


def test_otf_budget_rule():
    from pyfem_gpu_testflight_tpu.ops.pallas_otf3d import otf_budget_ok

    # x0=0 stages need invd one plane wider -> budget tz-1
    assert otf_budget_ok(2, True, True, 4)
    assert not otf_budget_ok(4, True, True, 4)
    assert otf_budget_ok(4, False, False, 4)
    assert not otf_budget_ok(5, False, False, 4)
    # nu outside the budget must disable OTF at construction
    asm = GMGAssembler3D(9, 9, 9, 1.0, 1.0, 1.0, "elasticity", p=3.0,
                         dtype=jnp.float32, nu_pre=6, nu_post=6,
                         pallas_smooth=True, pallas_tz=4,
                         elem_path="otf")
    _, lv0 = asm.assemble(jnp.ones(9 ** 3, jnp.float32))
    assert not isinstance(lv0, OTFLevel)


def test_otf_gmg_pcg_matches_uniform_solve():
    asm_u, asm_o = _assemblers("elasticity")
    rho, b = _fields("elasticity", seed=2)
    sols = {}
    for name, asm in (("uniform", asm_u), ("otf", asm_o)):
        gmg, lv0 = asm.assemble(rho)
        bb = jnp.where(lv0.mask, 0.0, b)
        x, k, rn = multigrid.pcg_gmg(gmg, lv0, bb, rtol=1e-7,
                                     maxiter=100)
        sols[name] = (np.asarray(x), int(k))
    rel = (
        np.abs(sols["otf"][0] - sols["uniform"][0]).max()
        / np.abs(sols["uniform"][0]).max()
    )
    assert abs(sols["otf"][1] - sols["uniform"][1]) <= 2
    assert rel < 5e-4, rel


def test_otf_bf16_sweeps_converge():
    """mxu_bf16 sweeps (the bf16-coefficient analogue) under flexible
    PCG still solve; matvec stays f32."""
    _, asm_o = _assemblers("elasticity", smoother_dtype=jnp.bfloat16)
    rho, b = _fields("elasticity", seed=3)
    gmg, lv0 = asm_o.assemble(rho)
    assert isinstance(lv0, OTFLevel) and lv0.smoother_bf16
    bb = jnp.where(lv0.mask, 0.0, b)
    x, k, rn = multigrid.pcg_gmg(gmg, lv0, bb, rtol=1e-6, maxiter=100,
                                 flexible=True)
    nb = float(jnp.linalg.norm(bb))
    assert float(rn) <= 1e-6 * nb  # the solver's convergence contract
    # true residual: recurrence drift under the perturbed (bf16)
    # preconditioner stays within ~5x of rtol
    r = bb - lv0.matvec(x)
    assert float(jnp.linalg.norm(r)) <= 5e-6 * nb
