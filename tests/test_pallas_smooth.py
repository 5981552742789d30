"""Fused Pallas Jacobi-sweep kernels (interpret mode on CPU).

Gates:
* ``Stencil2D.bc_eliminate``: plain matvec on eliminated coefficients
  equals ``bc_matvec`` on the raw ones.
* fused sweeps (+residual) match the XLA smoother sequence.
* GMG-PCG with the Pallas smoother reproduces the XLA-smoother solve
  (same iteration count, f32-roundoff solution difference).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyfem_gpu_testflight_tpu import multigrid
from pyfem_gpu_testflight_tpu.ops import pallas_smooth as ps

# interpret-mode kernel emulation is minutes-scale off-chip; the
# middle tier (-m "not quick and not nightly") skips these sweeps
pytestmark = pytest.mark.nightly


@pytest.fixture(scope="module")
def level():
    nx, ny = 33, 21
    asm = multigrid.GMGAssembler(nx, ny, 2.0, 1.0, "elasticity", p=3.0,
                                 dtype=jnp.float32)
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(0.2, 1.0, ny * nx), jnp.float32)
    _, lv0 = asm.assemble(rho)
    return lv0, (ny, nx), rng


def test_bc_eliminate_matches_bc_matvec(level):
    lv0, (ny, nx), rng = level
    u = jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32)
    y1 = lv0.op.bc_matvec(lv0.coeff, lv0.mask, u)
    y2 = lv0.op.matvec(lv0.coeff_e, u)
    assert float(jnp.abs(y1 - y2).max()) < 1e-6


def test_bc_eliminate_3d():
    from pyfem_gpu_testflight_tpu.ops.stencil import Stencil3D

    n = 7
    op = Stencil3D(n, n, n, 3)
    rng = np.random.default_rng(3)
    Ke = jnp.asarray(
        rng.standard_normal(((n - 1) ** 3, 24, 24)), jnp.float32
    )
    coeff = op.assemble(Ke)
    mask = jnp.asarray(rng.uniform(size=(3, n, n, n)) < 0.2)
    u = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    y1 = op.bc_matvec(coeff, mask, u)
    y2 = op.matvec(op.bc_eliminate(coeff, mask), u)
    assert float(jnp.abs(y1 - y2).max()) < 1e-5


def _xla_smooth(lv0, b, x, nit, omega=0.7):
    for _ in range(nit):
        r = b - lv0.matvec(x)
        x = x + omega * lv0.inv_diag * jnp.where(lv0.mask, 0.0, r)
    return x


@pytest.mark.parametrize("ty", [8, 32])
def test_fused_sweeps_match_xla(level, ty):
    lv0, (ny, nx), rng = level
    b = jnp.where(
        lv0.mask, 0.0,
        jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32),
    )
    ck = ps.pack_coeff2d(lv0.coeff_e, ty)
    dk = ps.pack_field2d(lv0.inv_diag, ty)
    bk = ps.pack_field2d(b, ty)

    x_ref = _xla_smooth(lv0, b, jnp.zeros_like(b), 2)
    r_ref = b - lv0.matvec(x_ref)
    xk, rk = ps.fused_sweeps_2d(ck, dk, bk, None, niter=2, want_resid=True,
                                omega=0.7, ty=ty, interpret=True)
    assert float(jnp.abs(ps.unpack_field2d(xk, ny, nx) - x_ref).max()) < 1e-5
    assert float(jnp.abs(ps.unpack_field2d(rk, ny, nx) - r_ref).max()) < 1e-5

    # post-smooth from a given iterate
    x0 = jnp.where(
        lv0.mask, 0.0,
        jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32),
    )
    x_ref2 = _xla_smooth(lv0, b, x0, 2)
    xk2 = ps.fused_sweeps_2d(ck, dk, bk, ps.pack_field2d(x0, ty), niter=2,
                             want_resid=False, omega=0.7, ty=ty,
                             interpret=True)
    assert float(jnp.abs(ps.unpack_field2d(xk2, ny, nx) - x_ref2).max()) < 1e-5

    # matvec-only variant: niter=0, b=0, negated residual = A x
    yk = ps.fused_sweeps_2d(ck, dk, None, ps.pack_field2d(x0, ty), niter=0,
                            want_resid=True, neg_resid=True, omega=0.7,
                            ty=ty, interpret=True)
    y_ref = lv0.matvec(x0)
    assert float(jnp.abs(ps.unpack_field2d(yk, ny, nx) - y_ref).max()) < 1e-4


def test_gmg_pcg_with_pallas_smoother():
    nx, ny = 65, 33
    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, ny * nx), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32)
    sols = {}
    for pal in (False, True):
        asm = multigrid.GMGAssembler(nx, ny, 2.0, 1.0, "elasticity", p=3.0,
                                     dtype=jnp.float32, pallas_smooth=pal)
        gmg, lv0 = asm.assemble(rho)
        bb = jnp.where(lv0.mask, 0.0, b)
        x, k, rn = multigrid.pcg(lv0.matvec, gmg.apply, bb, rtol=1e-7,
                                 maxiter=100)
        sols[pal] = (np.asarray(x), int(k))
    rel = (
        np.abs(sols[True][0] - sols[False][0]).max()
        / np.abs(sols[False][0]).max()
    )
    assert sols[True][1] <= sols[False][1] + 2
    assert rel < 1e-4


def test_fused_assembly_matches_xla():
    """assemble_pack_2d == pack(bc_eliminate(assemble_uniform)) (interpret).

    The packed halo rows differ by design (the kernel writes its unit
    diag-fix into padding, which the smoother never reads), so compare
    the real rows only; then gate a full GMG-PCG solve through packed
    levels against the XLA-assembled one.
    """
    from pyfem_gpu_testflight_tpu.ops.pallas_smooth import _PADY

    nx, ny = 65, 33
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(0.2, 1.0, ny * nx), jnp.float32)
    asm_x = multigrid.GMGAssembler(nx, ny, 2.0, 1.0, "elasticity", p=3.0,
                                   dtype=jnp.float32, pallas_smooth=True,
                                   pallas_asm_min=10 ** 9)
    asm_p = multigrid.GMGAssembler(nx, ny, 2.0, 1.0, "elasticity", p=3.0,
                                   dtype=jnp.float32, pallas_smooth=True,
                                   pallas_asm_min=0)
    gx, lx = asm_x.assemble(rho)
    gp, lp = asm_p.assemble(rho)
    n_packed = 0
    for a, b in zip(gx.levels, gp.levels):
        if b.coeff_e is None:
            n_packed += 1
            lny, lnx = a.shape
            d = jnp.abs(
                a.coeff_k[:, _PADY : _PADY + lny, 1 : 1 + lnx]
                - b.coeff_k[:, _PADY : _PADY + lny, 1 : 1 + lnx]
            )
            assert float(d.max()) < 1e-5
    assert n_packed >= 2

    bf = jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32)
    bb = jnp.where(lx.mask, 0.0, bf)
    x1, k1, _ = multigrid.pcg(lx.matvec, gx.apply, bb, rtol=1e-7,
                              maxiter=100)
    x2, k2, _ = multigrid.pcg(lp.matvec, gp.apply, bb, rtol=1e-7,
                              maxiter=100)
    rel = float(jnp.abs(x1 - x2).max() / jnp.abs(x1).max())
    assert abs(int(k1) - int(k2)) <= 2
    # two rtol=1e-7-converged f32 solves via different fp paths
    assert rel < 5e-4


def test_gmg3d_pcg_with_pallas_smoother():
    """3D fused z-tiled sweeps reproduce the XLA-smoother solve."""
    n = 9
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, n ** 3), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    sols = {}
    for pal in (False, True):
        asm = multigrid.GMGAssembler3D(n, n, n, 1.0, 1.0, 1.0,
                                       "elasticity", p=3.0,
                                       dtype=jnp.float32,
                                       pallas_smooth=pal)
        gmg, lv0 = asm.assemble(rho)
        bb = jnp.where(lv0.mask, 0.0, b)
        x, k, _ = multigrid.pcg(lv0.matvec, gmg.apply, bb, rtol=1e-7,
                                maxiter=100)
        sols[pal] = (np.asarray(x), int(k))
    rel = (
        np.abs(sols[True][0] - sols[False][0]).max()
        / np.abs(sols[False][0]).max()
    )
    assert abs(sols[True][1] - sols[False][1]) <= 2
    assert rel < 5e-4


@pytest.mark.parametrize("tz", [1, 2, 4])
def test_fused_assembly3d_matches_xla(tz):
    """assemble_pack_3d == packed XLA route on every non-coarsest level.

    tz >= 2 exercises the slab kernel (two-block z-halo windows); tz=1
    the per-plane kernel.
    """
    n = 9
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, n ** 3), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    a_x = multigrid.GMGAssembler3D(n, n, n, 1.0, 1.0, 1.0, "elasticity",
                                   p=3.0, dtype=jnp.float32,
                                   pallas_smooth=True, pallas_tz=tz,
                                   pallas_asm_min=10 ** 9)
    a_p = multigrid.GMGAssembler3D(n, n, n, 1.0, 1.0, 1.0, "elasticity",
                                   p=3.0, dtype=jnp.float32,
                                   pallas_smooth=True, pallas_tz=tz,
                                   pallas_asm_min=0)
    gx, lx = a_x.assemble(rho)
    gp, lp = a_p.assemble(rho)
    n_packed = 0
    for a, c in zip(gx.levels, gp.levels):
        if c.coeff_e is None:
            n_packed += 1
            nzl, nyl, nxl = a.shape
            # padding z-slabs carry the kernel's diag-fix (never read)
            d = jnp.abs(
                a.coeff_k[:nzl, :, 1 : 1 + nyl, 1 : 1 + nxl]
                - c.coeff_k[:nzl, :, 1 : 1 + nyl, 1 : 1 + nxl]
            )
            assert float(d.max()) < 1e-5
    assert n_packed >= 1
    bb = jnp.where(lx.mask, 0.0, b)
    x1, k1, _ = multigrid.pcg(lx.matvec, gx.apply, bb, rtol=1e-7,
                              maxiter=100)
    x2, k2, _ = multigrid.pcg(lp.matvec, gp.apply, bb, rtol=1e-7,
                              maxiter=100)
    rel = float(jnp.abs(x1 - x2).max() / jnp.abs(x1).max())
    assert abs(int(k1) - int(k2)) <= 2
    assert rel < 5e-4


@pytest.mark.parametrize("dim", ["2d", "3d"])
def test_bf16_smoother_coefficients(dim):
    """bf16 coefficient copies for the smoother converge under flexible
    PCG with the same iteration count ballpark (PCG operator stays f32)."""
    rng = np.random.default_rng(1)
    if dim == "2d":
        nx, ny = 65, 33
        rho = jnp.asarray(rng.uniform(0.3, 1.0, ny * nx), jnp.float32)
        b = jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32)
    else:
        n = 9
        rho = jnp.asarray(rng.uniform(0.3, 1.0, n ** 3), jnp.float32)
        b = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    sols = {}
    for smd in (None, jnp.bfloat16):
        if dim == "2d":
            asm = multigrid.GMGAssembler(
                nx, ny, 2.0, 1.0, "elasticity", p=3.0,
                dtype=jnp.float32, pallas_smooth=True,
                smoother_dtype=smd,
            )
        else:
            asm = multigrid.GMGAssembler3D(
                n, n, n, 1.0, 1.0, 1.0, "elasticity", p=3.0,
                dtype=jnp.float32, pallas_smooth=True,
                pallas_asm_min=0, smoother_dtype=smd,
            )
        gmg, lv0 = asm.assemble(rho)
        bb = jnp.where(lv0.mask, 0.0, b)
        x, k, _ = multigrid.pcg(lv0.matvec, gmg.apply, bb, rtol=1e-6,
                                maxiter=200, flexible=smd is not None)
        sols[smd is None] = (np.asarray(x), int(k))
    rel = (
        np.abs(sols[True][0] - sols[False][0]).max()
        / np.abs(sols[True][0]).max()
    )
    assert abs(sols[True][1] - sols[False][1]) <= 3
    assert rel < 5e-3  # bf16 smoother, both converged at rtol 1e-6


def test_pcg_gmg_fused_matvec_matches_pcg():
    """pcg_gmg (A p by recurrence off the postsmooth residual) == pcg.

    The fused path replaces the per-iteration operator matvec with
    ``A z = r - r_out`` from the fine postsmooth kernel (f32
    coefficients) plus the recurrence ``A p = A z + beta A p``.
    """
    nx, ny = 65, 33
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, ny * nx), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, ny, nx)), jnp.float32)
    for smd in (None, jnp.bfloat16):
        asm = multigrid.GMGAssembler(
            nx, ny, 2.0, 1.0, "elasticity", p=3.0, dtype=jnp.float32,
            pallas_smooth=True, smoother_dtype=smd,
        )
        gmg, lv0 = asm.assemble(rho)
        assert gmg.supports_apply_resid
        bb = jnp.where(lv0.mask, 0.0, b)
        fl = smd is not None
        x1, k1, _ = multigrid.pcg(lv0.matvec, gmg.apply, bb, rtol=1e-7,
                                  maxiter=100, flexible=fl)
        x2, k2, _ = multigrid.pcg_gmg(gmg, lv0, bb, rtol=1e-7,
                                      maxiter=100, flexible=fl)
        rel = float(jnp.abs(x1 - x2).max() / jnp.abs(x1).max())
        assert abs(int(k1) - int(k2)) <= 2
        assert rel < 5e-4
        # warm start re-enters through the explicit initial matvec
        x3, k3, _ = multigrid.pcg_gmg(gmg, lv0, bb, rtol=1e-7,
                                      maxiter=100, x0=x2, flexible=fl)
        assert int(k3) <= 8
    # XLA-smoother hierarchy falls back to the classic path
    asm = multigrid.GMGAssembler(nx, ny, 2.0, 1.0, "elasticity", p=3.0,
                                 dtype=jnp.float32)
    gmg, lv0 = asm.assemble(rho)
    assert not gmg.supports_apply_resid
    bb = jnp.where(lv0.mask, 0.0, b)
    x4, k4, _ = multigrid.pcg_gmg(gmg, lv0, bb, rtol=1e-7, maxiter=100)
    x5, k5, _ = multigrid.pcg(lv0.matvec, gmg.apply, bb, rtol=1e-7,
                              maxiter=100)
    assert int(k4) == int(k5)
    assert float(jnp.abs(x4 - x5).max()) == 0.0


@pytest.mark.parametrize("dim", ["2d", "3d"])
def test_assembly_lp_output_matches_cast(dim):
    """In-kernel bf16 coefficient copy == cast of the f32 output."""
    rng = np.random.default_rng(3)
    if dim == "2d":
        nx, ny = 65, 33
        rho = jnp.asarray(rng.uniform(0.3, 1.0, ny * nx), jnp.float32)
        asm = multigrid.GMGAssembler(
            nx, ny, 2.0, 1.0, "elasticity", p=3.0, dtype=jnp.float32,
            pallas_smooth=True, smoother_dtype=jnp.bfloat16,
        )
    else:
        n = 9
        rho = jnp.asarray(rng.uniform(0.3, 1.0, n ** 3), jnp.float32)
        asm = multigrid.GMGAssembler3D(
            n, n, n, 1.0, 1.0, 1.0, "elasticity", p=3.0,
            dtype=jnp.float32, pallas_smooth=True, pallas_asm_min=0,
            pallas_tz=2, smoother_dtype=jnp.bfloat16,
        )
    gmg, _ = asm.assemble(rho)
    lv = gmg.levels[0]
    lp = np.asarray(lv.coeff_lp_k, np.float32)
    cast = np.asarray(lv.coeff_k.astype(jnp.bfloat16), np.float32)
    assert np.abs(lp - cast).max() == 0.0


@pytest.mark.parametrize("nd_physics", [("elasticity", 2), ("poisson", 1)])
def test_sym_storage_matches_full(nd_physics):
    """Half-stencil (symmetric) coefficient storage == full storage.

    Every fused_sweeps_2d mode must agree: the missing planes are
    reconstructed from the symmetry identity
    coeff[(cb,ca,2-dy,2-dx)][i] = coeff[(ca,cb,dy,dx)][i+d-1].
    """
    physics, nd = nd_physics
    asm = multigrid.GMGAssembler(33, 17, 2.0, 1.0, physics, p=3.0,
                                 dtype=jnp.float32)
    rng = np.random.default_rng(7)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, 17 * 33), jnp.float32)
    _, lv0 = asm.assemble(rho)
    ny, nx = lv0.shape
    ty = 16
    ck_full = ps.pack_coeff2d(lv0.coeff_e, ty)
    ck_sym = ps.pack_coeff2d(lv0.coeff_e, ty, sym=True)
    assert ck_sym.shape[0] == len(ps.sym_planes_2d(nd)) < ck_full.shape[0]
    dk = ps.pack_field2d(lv0.inv_diag, ty)
    b = jnp.asarray(
        np.where(np.asarray(lv0.mask), 0.0, rng.standard_normal((nd, ny, nx))),
        jnp.float32,
    )
    x0 = jnp.asarray(
        np.where(np.asarray(lv0.mask), 0.0, rng.standard_normal((nd, ny, nx))),
        jnp.float32,
    )
    bk, xk = ps.pack_field2d(b, ty), ps.pack_field2d(x0, ty)
    cases = [
        (bk, None, dict(niter=2, want_resid=True)),            # presmooth
        (None, xk, dict(niter=0, want_resid=True, neg_resid=True)),  # matvec
        (bk, xk, dict(niter=2, want_resid=True)),              # postsmooth+r
        (bk, xk, dict(niter=3, want_resid=False)),             # postsmooth
    ]
    for bin_, xin, kw in cases:
        o1 = ps.fused_sweeps_2d(ck_full, dk, bin_, xin, interpret=True,
                                ty=ty, **kw)
        o2 = ps.fused_sweeps_2d(ck_sym, dk, bin_, xin, interpret=True,
                                ty=ty, **kw)
        if not isinstance(o1, (tuple, list)):
            o1, o2 = (o1,), (o2,)
        for a, c in zip(o1, o2):
            assert float(jnp.abs(a - c).max()) < 1e-5, kw


@pytest.mark.parametrize("physics", ["elasticity", "poisson"])
def test_fused_multi_sweep3d_matches_per_sweep(physics):
    """fused_sweeps3d == the per-sweep kernel sequence on the same data.

    Same tz, same (f32) coefficients: the fused kernel runs the exact
    per-sweep arithmetic with z-ghost redundant compute, so iterates
    must agree to reassociation roundoff.
    """
    n = 9
    rng = np.random.default_rng(3)
    nd = 3 if physics == "elasticity" else 1
    rho = jnp.asarray(rng.uniform(0.3, 1.0, n ** 3), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nd, n, n, n)), jnp.float32)
    asm = multigrid.GMGAssembler3D(n, n, n, 1.0, 1.0, 1.0, physics,
                                   p=3.0, dtype=jnp.float32,
                                   pallas_smooth=True, pallas_tz=4)
    gmg, lv0 = asm.assemble(rho)
    b = jnp.where(lv0.mask, 0.0, b)
    omega = 0.6
    for niter in (2, 3):
        assert lv0.can_fuse3d(niter, True, True)
        x_f, r_f = lv0.presmooth_resid3d(b, niter, omega)
        # per-sweep reference sequence (the pre-fusion _cycle path)
        bk = ps.pack_field3d(b, tz=lv0.tz)
        x_s = omega * lv0.inv_diag * b
        for _ in range(niter - 1):
            x_s = lv0.sweep3d(bk, x_s, omega)
        r_s = lv0.resid3d(bk, x_s)
        sc = float(jnp.abs(x_s).max())
        assert float(jnp.abs(x_f - x_s).max()) < 1e-5 * sc
        assert float(jnp.abs(r_f - r_s).max()) < 1e-5 * float(
            jnp.abs(r_s).max()
        )
        # post path from a nonzero iterate
        assert lv0.can_fuse3d(niter, False, False)
        x_pf = lv0.postsmooth3d(b, x_f, niter, omega)
        x_ps = x_f
        for _ in range(niter):
            x_ps = lv0.sweep3d(bk, x_ps, omega)
        assert float(jnp.abs(x_pf - x_ps).max()) < 1e-5 * float(
            jnp.abs(x_ps).max()
        )
    # budget: consumed > min(tz, SWEEP3_ZEXT) must be rejected
    assert not lv0.can_fuse3d(ps.SWEEP3_ZEXT + 1, False, False)


def test_gmg3d_pcg_fused_multi_matches_per_sweep_solve():
    """Full 3D GMG-PCG through the fused multi-sweep V-cycle (tz=4)
    reproduces the per-sweep (tz=1) solve."""
    n = 9
    rng = np.random.default_rng(4)
    rho = jnp.asarray(rng.uniform(0.3, 1.0, n ** 3), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    sols = {}
    for tz in (1, 4):
        asm = multigrid.GMGAssembler3D(n, n, n, 1.0, 1.0, 1.0,
                                       "elasticity", p=3.0,
                                       dtype=jnp.float32,
                                       pallas_smooth=True, pallas_tz=tz)
        gmg, lv0 = asm.assemble(rho)
        if tz == 4:
            assert gmg.levels[0].can_fuse3d(gmg.nu_pre, True, True)
        bb = jnp.where(lv0.mask, 0.0, b)
        x, k, _ = multigrid.pcg(lv0.matvec, gmg.apply, bb, rtol=1e-7,
                                maxiter=100)
        sols[tz] = (np.asarray(x), int(k))
    rel = (
        np.abs(sols[4][0] - sols[1][0]).max()
        / np.abs(sols[1][0]).max()
    )
    assert abs(sols[4][1] - sols[1][1]) <= 2
    assert rel < 5e-4
