"""Phase-level timing of the GMG solve pipeline on the attached device.

Each timed program re-assembles the hierarchy from rho (the GMG object
is not a pytree, so it cannot cross a jit boundary); phase costs come
out of *differences* between programs:

    assembly            = T(assemble)
    V-cycle             = T(assemble + 1 vcycle) - T(assemble)
    PCG iteration       = (T(maxiter=K) - T(maxiter=1)) / (K - 1)

Chained data-dependent calls (rho + eps*out) defeat the relay result
cache and keep dispatch pipelined (NOTES.md "Timing methodology").

Usage:
    PYTHONPATH=.:$HOME/.axon_site python examples/profile_phases.py \
        --config 2d [--min_n 17 --coarse-max 4096 ...]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["2d", "3d"], default="2d")
    ap.add_argument("--nx", type=int, default=1025)
    ap.add_argument("--ny", type=int, default=513)
    ap.add_argument("--n3d", type=int, default=65)
    ap.add_argument("--min_n", type=int, default=5)
    ap.add_argument("--min_n3d", type=int, default=3)
    ap.add_argument("--coarse-max", dest="coarse_max", type=int,
                    default=4096)
    ap.add_argument("--nu", type=int, default=2)
    ap.add_argument("--pallas-tz", dest="pallas_tz", type=int, default=1)
    ap.add_argument("--smoother-dtype", dest="smoother_dtype",
                    choices=["none", "bfloat16"], default="bfloat16")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--deep-k", dest="deep_k", type=int, default=9,
                    help="maxiter of the deep PCG program")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pyfem_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    from pyfem_gpu_testflight_tpu import multigrid
    from pyfem_gpu_testflight_tpu.ops.dia import interleave_to_planar

    sm = jnp.bfloat16 if args.smoother_dtype == "bfloat16" else None
    if args.config == "2d":
        nx, ny = args.nx, args.ny
        asm = multigrid.GMGAssembler(
            nx, ny, 2.0, 1.0, "elasticity", p=0.0, min_n=args.min_n,
            coarse_dense_max=args.coarse_max, nu_pre=args.nu,
            nu_post=args.nu, smoother_dtype=sm, pallas_smooth=True,
        )
        nd, shape = 2, (ny, nx)
    else:
        n = args.n3d
        asm = multigrid.GMGAssembler3D(
            n, n, n, 2.0, 1.0, 1.0, "elasticity", p=0.0,
            min_n=args.min_n3d, coarse_dense_max=args.coarse_max,
            nu_pre=args.nu, nu_post=args.nu, smoother_dtype=sm,
            pallas_smooth=True, pallas_tz=args.pallas_tz,
        )
        nd, shape = 3, (n, n, n)
    print(f"levels: {asm.sizes}", file=sys.stderr, flush=True)

    rho0 = jnp.ones((int(np.prod(shape)),), jnp.float32)
    bconst = jnp.ones((nd,) + shape, jnp.float32)

    def mk(program):
        @jax.jit
        def step(rho):
            return program(rho)

        def timed(label, iters=args.iters):
            y = step(rho0)
            y.block_until_ready()
            y = step(y)  # warm the chained signature
            y.block_until_ready()
            t0 = time.time()
            y = rho0
            for _ in range(iters):
                y = step(y)
            y.block_until_ready()
            t_short = time.time() - t0
            t0 = time.time()
            y = rho0
            for _ in range(4 * iters):
                y = step(y)
            y.block_until_ready()
            t_long = time.time() - t0
            per = (t_long - t_short) / (3 * iters)
            print(f"  {label}: {per*1e3:.3f} ms", file=sys.stderr,
                  flush=True)
            return per

        return timed

    def chain(rho, *outs):
        s = jnp.float32(0)
        for o in outs:
            s = s + jnp.sum(o[..., :1].astype(jnp.float32))
        return rho + 1e-30 * s

    def assemble_only(rho):
        gmg, lv0 = asm.assemble(rho)
        outs = []
        for lv in gmg.levels:
            arr = lv.coeff_k if lv.coeff_e is None else lv.coeff_e
            outs.append(arr)
        return chain(rho, *outs)

    def asm_vcycle(rho):
        gmg, lv0 = asm.assemble(rho)
        b = jnp.where(lv0.mask, 0.0, bconst)
        z = gmg.apply(b)
        return chain(rho, z)

    def asm_vcycle_resid(rho):
        gmg, lv0 = asm.assemble(rho)
        b = jnp.where(lv0.mask, 0.0, bconst)
        if gmg.supports_apply_resid:
            z, az = gmg.apply_resid(b)
            return chain(rho, z, az)
        return chain(rho, gmg.apply(b))

    def asm_matvec(rho):
        gmg, lv0 = asm.assemble(rho)
        b = jnp.where(lv0.mask, 0.0, bconst)
        return chain(rho, lv0.matvec(b))

    def mk_pcg(k):
        def f(rho):
            gmg, lv0 = asm.assemble(rho)
            b = jnp.where(lv0.mask, 0.0, bconst)
            x, it, rn = multigrid.pcg_gmg(gmg, lv0, b, rtol=0.0,
                                          maxiter=k,
                                          flexible=sm is not None)
            return chain(rho, x)

        return f

    t_asm = mk(assemble_only)("assembly")
    t_av = mk(asm_vcycle)("assembly + V-cycle")
    t_avr = mk(asm_vcycle_resid)("assembly + V-cycle(apply_resid)")
    t_amv = mk(asm_matvec)("assembly + matvec")
    t_p1 = mk(mk_pcg(1))("assembly + PCG(1)")
    K = args.deep_k
    t_pk = mk(mk_pcg(K))(f"assembly + PCG({K})")
    print(
        f"derived: vcycle={1e3*(t_av-t_asm):.3f} ms  "
        f"vcycle_resid={1e3*(t_avr-t_asm):.3f} ms  "
        f"matvec={1e3*(t_amv-t_asm):.3f} ms  "
        f"pcg_iter={1e3*(t_pk-t_p1)/(K-1):.3f} ms  "
        f"pcg_overhead1={1e3*(t_p1-t_asm):.3f} ms",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
