"""Micro-timings of the individual 3D fine-level kernels on the device.

Times each kernel with the chained-fori methodology (NOTES.md): the
output feeds the next call's input so the relay cannot serve cached
results and dispatch stays pipelined; costs come from the difference
between a long and a short loop.

Usage:
    PYTHONPATH=.:$HOME/.axon_site python examples/profile_kernels3d.py \
        [--n3d 65 --tz 4 --iters 20]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n3d", type=int, default=65)
    ap.add_argument("--tz", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--smoother-dtype", dest="smoother_dtype",
                    choices=["none", "bfloat16"], default="bfloat16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pyfem_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    from pyfem_gpu_testflight_tpu import multigrid
    from pyfem_gpu_testflight_tpu.ops import pallas_smooth as ps

    n = args.n3d
    sm = jnp.bfloat16 if args.smoother_dtype == "bfloat16" else None
    asm = multigrid.GMGAssembler3D(
        n, n, n, 1.0, 1.0, 1.0, "elasticity", p=0.0,
        nu_pre=2, nu_post=2, smoother_dtype=sm, pallas_smooth=True,
        pallas_tz=args.tz,
    )
    rho = jnp.ones((n ** 3,), jnp.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)

    gmg, lv0 = asm.assemble(rho)
    b = jnp.where(lv0.mask, 0.0, b)

    def timed(label, program):
        @jax.jit
        def step(x):
            y = program(x)
            # normalize with a constant so magnitude stays bounded but
            # the chain carries real data (jnp.max would serialize)
            return b + 1e-3 * y

        y = step(b)
        y.block_until_ready()
        y = step(y)
        y.block_until_ready()
        it = args.iters
        t0 = time.time()
        y = b
        for _ in range(it):
            y = step(y)
        y.block_until_ready()
        t_short = time.time() - t0
        t0 = time.time()
        y = b
        for _ in range(4 * it):
            y = step(y)
        y.block_until_ready()
        t_long = time.time() - t0
        per = (t_long - t_short) / (3 * it)
        print(f"  {label}: {per * 1e3:.3f} ms", file=sys.stderr, flush=True)
        return per

    # hierarchy is assembled OUTSIDE the timed programs here (it is not
    # a pytree), so every program re-traces the assembly — keep it out
    # by closing over the already-assembled level arrays instead
    lv = gmg.levels[0]
    lv2 = gmg.levels[1]

    timed("fine matvec (f32 single-sweep kernel)", lv.matvec)
    timed("fine pre(2)+resid fused (bf16)",
          lambda x: lv.presmooth_resid3d(x, 2, 0.6)[0])
    timed("fine post(2) fused (bf16)",
          lambda x: lv.postsmooth3d(x, x, 2, 0.6))
    timed("fine pack+unpack only",
          lambda x: ps.unpack_field3d(
              ps.pack_field3d(x, zpad=1, tz=lv.tz)[:, lv.tz:-lv.tz],
              *lv.shape))

    def one_sweep(x):
        bk = ps.pack_field3d(x, tz=lv.tz)
        return lv.sweep3d(bk, x, 0.6)

    timed("fine single sweep (bf16 per-sweep kernel)", one_sweep)

    def transfers(x):
        rc = multigrid.restrict3d_il(x, lv2.shape)
        return multigrid.prolong3d_il(rc, lv.shape)

    timed("restrict+prolong (fine<->L2)", transfers)

    def full_vcycle(x):
        return gmg.apply(x)

    timed("full V-cycle", full_vcycle)

    def fine_only(x):
        # fine-level portion of the V-cycle: pre+resid, transfers, post
        xx, r = lv.presmooth_resid3d(x, 2, 0.6)
        rc = multigrid.restrict3d_il(r, lv2.shape)
        corr = multigrid.prolong3d_il(rc, lv.shape)
        xx = xx + jnp.where(lv.mask, 0.0, corr)
        return lv.postsmooth3d(x, xx, 2, 0.6)

    timed("V-cycle fine-level portion", fine_only)


if __name__ == "__main__":
    main()
