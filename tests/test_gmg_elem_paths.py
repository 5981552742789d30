"""Element-matrix routes into the GMG stencil assembly must agree.

"uniform" (unit-matrix MXU path, the benchmark default), "pallas"
(elements-on-lanes kernel, interpret mode on CPU) and "einsum" (general
fallback) assemble the same coefficient planes on the creator's uniform
grids.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyfem_gpu_testflight_tpu import multigrid

jax.config.update("jax_enable_x64", True)

# the "pallas" route runs interpret-mode kernels (minutes-scale
# off-chip); the middle tier (-m "not quick and not nightly") skips it
pytestmark = pytest.mark.nightly


def _coeffs(asm, rho):
    gmg, _ = asm.assemble(rho)
    return [lv.coeff for lv in gmg.levels]


@pytest.mark.parametrize("physics", ["elasticity", "poisson"])
def test_uniform_matches_einsum_2d(physics):
    rng = np.random.RandomState(1)
    rho = jnp.asarray(0.3 + 0.6 * rng.rand(9 * 17))
    kw = dict(p=3.0, dtype=jnp.float64)
    cu = _coeffs(multigrid.GMGAssembler(17, 9, 2.0, 1.0, physics,
                                        elem_path="uniform", **kw), rho)
    ce = _coeffs(multigrid.GMGAssembler(17, 9, 2.0, 1.0, physics,
                                        elem_path="einsum", **kw), rho)
    for a, b in zip(cu, ce):
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert rel < 1e-13, rel


@pytest.mark.parametrize("physics", ["elasticity", "poisson"])
def test_pallas_matches_einsum_2d(physics):
    rng = np.random.RandomState(2)
    rho = jnp.asarray(0.3 + 0.6 * rng.rand(9 * 17), jnp.float32)
    kw = dict(p=3.0, dtype=jnp.float32)
    cp = _coeffs(multigrid.GMGAssembler(17, 9, 2.0, 1.0, physics,
                                        elem_path="pallas", **kw), rho)
    ce = _coeffs(multigrid.GMGAssembler(17, 9, 2.0, 1.0, physics,
                                        elem_path="einsum", **kw), rho)
    for a, b in zip(cp, ce):
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert rel < 1e-5, rel  # f32 roundoff


def test_uniform_matches_einsum_3d():
    rng = np.random.RandomState(3)
    rho = jnp.asarray(0.3 + 0.6 * rng.rand(5 * 5 * 9))
    kw = dict(p=3.0, dtype=jnp.float64)
    cu = _coeffs(multigrid.GMGAssembler3D(9, 5, 5, 2.0, 1.0, 1.0,
                                          "elasticity",
                                          elem_path="uniform", **kw), rho)
    ce = _coeffs(multigrid.GMGAssembler3D(9, 5, 5, 2.0, 1.0, 1.0,
                                          "elasticity",
                                          elem_path="einsum", **kw), rho)
    for a, b in zip(cu, ce):
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert rel < 1e-13, rel
