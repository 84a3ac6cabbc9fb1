"""HBM->VMEM slab DMA rate: strided (dense-grid slab, 512B pieces) vs
blocked (contiguous 1MB slab) on this chip — the decisive probe for a
blocked-HBM-layout mode of the fused nl kernel.

Variants (same bytes: 64 slabs of (256,8,128) f32 = 64 MB in, 64 MB out):
  strided : slab = grid[:, jj*8:(jj+1)*8, cc*128:(cc+1)*128] of a dense
            (256,256,256) array — 256*8 pieces of 512 B (the current
            kernel's slab4 access)
  fullc   : slab = grid[:, jj*8:(jj+1)*8, :] of the dense array with
            lane window = full C — 256 pieces of 8 KB
  blocked : slab = grid5[jj, cc] of a (32, 2, 256, 8, 128) pre-blocked
            array — ONE contiguous 1 MB piece

Each variant also measured with DMA depth 4 (4 slabs in flight).

Run on the TPU:  python scripts/probe_slabdma.py [--reps 20]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 256
    S, L = 8, 128
    n_j, n_c = N // S, N // L          # 32 x 2 = 64 blocks
    total = n_j * n_c
    D = args.depth

    def make_kernel(mode):
        if mode == "fullc":
            slab = (N, S, N)
        else:
            slab = (N, S, L)

        def src(hbm, b):
            jj = jax.lax.div(b, n_c)
            cc = jax.lax.rem(b, n_c)
            if mode == "strided":
                return hbm.at[:, pl.ds(jj * S, S), pl.ds(cc * L, L)]
            if mode == "fullc":
                return hbm.at[:, pl.ds(jj * S, S), :]
            return hbm.at[jj, cc]

        def body(hbm, o_hbm, bufs, acc, sems):
            b = pl.program_id(0)
            cp = pltpu.make_async_copy

            @pl.when(b == 0)
            def _():
                for k in range(min(D, total)):
                    cp(src(hbm, k), bufs.at[k % D], sems.at[k % D]).start()
                acc[...] = jnp.zeros_like(acc)

            @pl.when(b + D < total)
            def _():
                cp(src(hbm, b + D), bufs.at[(b + D) % D],
                   sems.at[(b + D) % D]).start()

            cp(src(hbm, b), bufs.at[b % D], sems.at[b % D]).wait()
            # touch one row so the copy isn't dead-code eliminated
            acc[...] += bufs[b % D, 0, :, : L]

            @pl.when(b == total - 1)
            def _():
                o_hbm_cp = cp(acc, o_hbm, sems.at[0])
                o_hbm_cp.start()
                o_hbm_cp.wait()

        return body, slab

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(x, mode):
        body, slab = make_kernel(mode)
        return pl.pallas_call(
            body,
            grid=(total,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((D,) + slab, jnp.float32),
                pltpu.VMEM((S, L), jnp.float32),
                pltpu.SemaphoreType.DMA((D,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=(jax.default_backend() != "tpu"),
        )(x)

    key = jax.random.PRNGKey(0)
    dense = jax.random.uniform(key, (N, N, N), jnp.float32)
    blocked = jnp.transpose(dense.reshape(N, n_j, S, n_c, L),
                            (1, 3, 0, 2, 4)).copy()
    print(f"device={jax.devices()[0]}  64 MB per run, depth={D}")
    for mode, x in (("strided", dense), ("fullc", dense),
                    ("blocked", blocked)):
        o = run(x, mode)
        float(jnp.sum(o))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.reps):
                o = run(x, mode)
            float(jnp.sum(o))
            dt = (time.time() - t0) / args.reps
            best = min(best, dt)
        gbs = (N * N * N * 4) / best / 1e9
        print(f"  {mode:8s}: {best * 1e3:7.3f} ms   {gbs:6.1f} GB/s")


if __name__ == "__main__":
    main()
