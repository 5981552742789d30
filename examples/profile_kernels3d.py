"""Phase timings of the 3D GMG-PCG pipeline on the device.

Each timed program assembles the hierarchy from nodal rho *inside*
jit (closing over pre-assembled coefficient arrays would bake ~100 MB
of constants into the compile payload — the remote-compile relay
rejects it) and runs a prefix of the solve; phase costs come from
differences between programs.  Timing uses the chained-dependency
methodology (NOTES.md): outputs feed the next call's input so the
relay cannot serve cached results, and costs come from the difference
between a long and a short pipelined loop.

Usage:
    PYTHONPATH=.:$HOME/.axon_site python examples/profile_kernels3d.py \
        [--n3d 65 --tz 5 --iters 10 --omega cheby]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n3d", type=int, default=65)
    ap.add_argument("--tz", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pcg-iters", dest="pcg_iters", type=int, default=7)
    ap.add_argument("--omega", type=lambda v: v if v == "cheby"
                    else float(v), default="cheby")
    ap.add_argument("--smoother-dtype", dest="smoother_dtype",
                    choices=["none", "bfloat16"], default="bfloat16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pyfem_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    from pyfem_gpu_testflight_tpu import multigrid

    n = args.n3d
    sm = jnp.bfloat16 if args.smoother_dtype == "bfloat16" else None
    asm = multigrid.GMGAssembler3D(
        n, n, n, 1.0, 1.0, 1.0, "elasticity", p=0.0,
        nu_pre=2, nu_post=2, smoother_dtype=sm, pallas_smooth=True,
        pallas_tz=args.tz, pallas_asm_min=0, omega=args.omega,
    )
    rng = np.random.default_rng(0)
    rho0 = jnp.asarray(1.0 + 0.0 * rng.standard_normal(n ** 3),
                       jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)

    def timed(label, program):
        @jax.jit
        def step(rho, x):
            y = program(rho, x)
            # chain: bounded magnitude, real data (no relay caching)
            return rho + 1e-6 * jnp.sum(y), b0 + 1e-3 * y

        rho, y = step(rho0, b0)
        y.block_until_ready()
        rho, y = step(rho, y)
        y.block_until_ready()
        it = args.iters
        t0 = time.time()
        rho, y = rho0, b0
        for _ in range(it):
            rho, y = step(rho, y)
        y.block_until_ready()
        t_short = time.time() - t0
        t0 = time.time()
        rho, y = rho0, b0
        for _ in range(4 * it):
            rho, y = step(rho, y)
        y.block_until_ready()
        t_long = time.time() - t0
        per = (t_long - t_short) / (3 * it)
        print(f"  {label}: {per * 1e3:.3f} ms", file=sys.stderr,
              flush=True)
        return per

    def assemble(rho):
        gmg, lv0 = asm.assemble(rho)
        return gmg, lv0

    def p_asm(rho, x):
        gmg, lv0 = assemble(rho)
        # touch one coefficient so assembly isn't dead-code-eliminated
        return x * (1.0 + 0.0 * gmg.levels[0].inv_diag)

    def p_matvec(rho, x):
        gmg, lv0 = assemble(rho)
        return lv0.matvec(jnp.where(lv0.mask, 0.0, x))

    def p_vcycle(rho, x):
        gmg, lv0 = assemble(rho)
        return gmg.apply(x)

    def make_pcg(k):
        def p(rho, x):
            gmg, lv0 = assemble(rho)
            b = jnp.where(lv0.mask, 0.0, x)
            u, it, rn = multigrid.pcg_gmg(gmg, lv0, b, rtol=0.0,
                                          maxiter=k,
                                          flexible=sm is not None)
            return u
        return p

    t_a = timed("assembly", p_asm)
    t_m = timed("assembly + matvec", p_matvec)
    t_v = timed("assembly + V-cycle", p_vcycle)
    t_1 = timed("assembly + PCG(1)", make_pcg(1))
    k = args.pcg_iters
    t_k = timed(f"assembly + PCG({k})", make_pcg(k))
    per_iter = (t_k - t_1) / (k - 1)
    print(
        f"derived: matvec={1e3 * (t_m - t_a):.3f} ms  "
        f"vcycle={1e3 * (t_v - t_a):.3f} ms  "
        f"pcg_iter={1e3 * per_iter:.3f} ms  "
        f"pcg_setup1={1e3 * (t_1 - t_a - per_iter):.3f} ms  "
        f"total_pcg{k}={1e3 * t_k:.3f} ms",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
