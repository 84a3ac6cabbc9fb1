"""Isolate the fused-sweep kernel's bottleneck: DMA floor vs compute floor.

Three variants at the same slab geometry as pallas_sweep_stream
((8, n, 128) slabs, grid (n/8, n/128)):
  dma  — streams all 11 input + 8 output slabs, no compute (copy via VMEM)
  comp — one DMA round, then the full 4-var chain compute on resident slabs
  full — the real fused_sweep_stream

Run on the TPU: python scripts/kernel_probe.py [--n 256]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
S_TILE = 8


def sync(x):
    return float(jnp.sum(x))


def make_probe(n, mode):
    def kernel(temp_hbm, rhs_hbm, op_hbm, forc_hbm, out_hbm, tn_hbm,
               adv_v, T_v, pk_v, in_buf, out_buf, tn_buf, cp, rbuf,
               sh_sems, in_sems, out_sems):
        j = pl.program_id(0)
        cidx = pl.program_id(1)

        def slab3(ref):
            return ref.at[pl.ds(j * S_TILE, S_TILE), :,
                          pl.ds(cidx * LANES, LANES)]

        def slab4(ref, vv):
            return ref.at[vv, pl.ds(j * S_TILE, S_TILE), :,
                          pl.ds(cidx * LANES, LANES)]

        if mode in ("dma", "full"):
            a_dma = pltpu.make_async_copy(slab4(temp_hbm, 1), adv_v, sh_sems.at[0])
            t_dma = pltpu.make_async_copy(slab4(temp_hbm, 3), T_v, sh_sems.at[1])
            p_dma = pltpu.make_async_copy(slab3(forc_hbm), pk_v, sh_sems.at[2])
            a_dma.start(); t_dma.start(); p_dma.start()

            def start_inputs(v, slot):
                pltpu.make_async_copy(slab4(rhs_hbm, v), in_buf.at[slot, 0],
                                      in_sems.at[slot, 0]).start()
                pltpu.make_async_copy(slab4(op_hbm, v), in_buf.at[slot, 1],
                                      in_sems.at[slot, 1]).start()
                pltpu.make_async_copy(slab4(temp_hbm, v), in_buf.at[slot, 2],
                                      in_sems.at[slot, 2]).start()

            def wait_inputs(v, slot):
                pltpu.make_async_copy(slab4(rhs_hbm, v), in_buf.at[slot, 0],
                                      in_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(slab4(op_hbm, v), in_buf.at[slot, 1],
                                      in_sems.at[slot, 1]).wait()
                pltpu.make_async_copy(slab4(temp_hbm, v), in_buf.at[slot, 2],
                                      in_sems.at[slot, 2]).wait()

            start_inputs(0, 0)
            start_inputs(1, 1)
            a_dma.wait(); t_dma.wait(); p_dma.wait()

        def compute(v, slot):
            zero = jnp.zeros_like(adv_v[:, 0, :])

            def chunked(body, init):
                def chunk(k, carry):
                    base = k * 8
                    for i in range(8):
                        carry = body(base + i, carry)
                    return carry
                return jax.lax.fori_loop(0, n // 8, chunk, init)

            ob = out_buf.at[slot]
            tb = tn_buf.at[slot]
            db = in_buf.at[slot, 0]

            def fwd(p, carry):
                c_prev, d_prev = carry
                pk = pk_v[:, p, :]
                adv = adv_v[:, p, :]
                a = -adv * 0.5 - 1.0
                b = 3.0 + pk
                c = adv * 0.5 - 1.0
                d = db[:, p, :]
                denom = b - a * c_prev
                r = pl.reciprocal(denom, approx=False)
                c_new = c * r
                d_new = (d - d_prev * a) * r
                cp[:, p, :] = c_new
                ob[:, p, :] = d_new
                return c_new, d_new

            chunked(fwd, (zero, zero))

            def bwd(q, x_next):
                p = n - 1 - q
                x = ob[:, p, :] - cp[:, p, :] * x_next
                tb[:, p, :] = x
                return x

            chunked(bwd, zero)

        def compute2(v, slot):
            """Tile-group variant: load 8 rows as one aligned (8,8,128)
            register value, slice sublanes statically."""
            zero = jnp.zeros_like(adv_v[:, 0, :])
            ob = out_buf.at[slot]
            tb = tn_buf.at[slot]
            db = in_buf.at[slot, 0]

            def fwd_chunk(k, carry):
                base = k * 8
                pk_t = pk_v[:, pl.ds(base, 8), :]
                adv_t = adv_v[:, pl.ds(base, 8), :]
                d_t = db[:, pl.ds(base, 8), :]
                outs = []
                cps = []
                for i in range(8):
                    c_prev, d_prev = carry
                    pk = pk_t[:, i, :]
                    adv = adv_t[:, i, :]
                    a = -adv * 0.5 - 1.0
                    b = 3.0 + pk
                    c = adv * 0.5 - 1.0
                    d = d_t[:, i, :]
                    denom = b - a * c_prev
                    r = pl.reciprocal(denom, approx=False)
                    c_new = c * r
                    d_new = (d - d_prev * a) * r
                    cps.append(c_new)
                    outs.append(d_new)
                    carry = (c_new, d_new)
                cp[:, pl.ds(base, 8), :] = jnp.stack(cps, axis=1)
                ob[:, pl.ds(base, 8), :] = jnp.stack(outs, axis=1)
                return carry

            jax.lax.fori_loop(0, n // 8, fwd_chunk, (zero, zero))

            def bwd_chunk(k, x_next):
                base = (n // 8 - 1 - k) * 8
                d_t = ob[:, pl.ds(base, 8), :]
                c_t = cp[:, pl.ds(base, 8), :]
                xs = [None] * 8
                for i in reversed(range(8)):
                    x_next = d_t[:, i, :] - c_t[:, i, :] * x_next
                    xs[i] = x_next
                tb[:, pl.ds(base, 8), :] = jnp.stack(xs, axis=1)
                return x_next

            jax.lax.fori_loop(0, n // 8, bwd_chunk, zero)

        def compute_shared(interleave):
            """Real-kernel structure: ONE coefficient chain (c', 1/denom
            stored), then the four variables' d-elimination + backward
            chains — sequentially (as pallas_sweep_nl does today) or
            interleaved per row step (four independent single-VREG chains
            in flight, hiding the serial-step latency)."""
            zero = jnp.zeros_like(adv_v[:, 0, :])

            def chunked(body, init):
                def chunk(k, carry):
                    base = k * 8
                    for i in range(8):
                        carry = body(base + i, carry)
                    return carry
                return jax.lax.fori_loop(0, n // 8, chunk, init)

            def coeff(p, c_prev):
                adv = adv_v[:, p, :]
                a = -adv * 0.5 - 1.0
                b = 3.0 + pk_v[:, p, :]
                c = adv * 0.5 - 1.0
                denom = b - a * c_prev
                r = pl.reciprocal(denom, approx=False)
                c_new = c * r
                cp[:, p, :] = c_new
                rbuf[:, p, :] = r
                return c_new

            chunked(coeff, zero)

            dsts = [out_buf.at[0], out_buf.at[1], tn_buf.at[0], tn_buf.at[1]]
            dbs = [in_buf.at[0, 0], in_buf.at[0, 1],
                   in_buf.at[1, 0], in_buf.at[1, 1]]

            if not interleave:
                for q in range(4):
                    def fwd(p, d_prev, q=q):
                        adv = adv_v[:, p, :]
                        a = -adv * 0.5 - 1.0
                        d_new = (dbs[q][:, p, :]
                                 - d_prev * a) * rbuf[:, p, :]
                        dsts[q][:, p, :] = d_new
                        return d_new

                    chunked(fwd, zero)

                    def bwd(qq, x_next, q=q):
                        p = n - 1 - qq
                        x = dsts[q][:, p, :] - cp[:, p, :] * x_next
                        dsts[q][:, p, :] = x
                        return x

                    chunked(bwd, zero)
                return

            def fwd4(p, ds):
                adv = adv_v[:, p, :]
                a = -adv * 0.5 - 1.0
                r = rbuf[:, p, :]
                new = []
                for q in range(4):
                    d_new = (dbs[q][:, p, :] - ds[q] * a) * r
                    dsts[q][:, p, :] = d_new
                    new.append(d_new)
                return tuple(new)

            chunked(fwd4, (zero,) * 4)

            def bwd4(qq, xs):
                p = n - 1 - qq
                cpr = cp[:, p, :]
                new = []
                for q in range(4):
                    x = dsts[q][:, p, :] - cpr * xs[q]
                    dsts[q][:, p, :] = x
                    new.append(x)
                return tuple(new)

            chunked(bwd4, (zero,) * 4)

        def compute_pcr():
            """Parallel cyclic reduction over the slab: ONE shared (a,b,c)
            chain + four d's carried through log2(n) fully-vectorized
            levels (shifts along the sweep dim), no serial row loop at
            all.  ~6x the flops of comps in ~16 full-slab passes instead
            of 2n row steps — the recurrence-widening candidate
            (docs/ROOFLINE.md §3)."""
            adv = adv_v[...]
            a = -adv * 0.5 - 1.0
            b = 3.0 + pk_v[...]
            c = adv * 0.5 - 1.0
            ds = [dbs_ref[...] for dbs_ref in
                  (in_buf.at[0, 0], in_buf.at[0, 1],
                   in_buf.at[1, 0], in_buf.at[1, 1])]

            def shift(x, k, fill):
                # along the sweep dim (axis 1 of the (8, n, 128) slab)
                if k > 0:
                    pad = jnp.full_like(x[:, :k, :], fill)
                    return jnp.concatenate([x[:, k:, :], pad], axis=1)
                pad = jnp.full_like(x[:, k:, :], fill)
                return jnp.concatenate([pad, x[:, :k, :]], axis=1)

            s = 1
            while s < n:
                am, bm, cm = (shift(a, -s, 0.0), shift(b, -s, 1.0),
                              shift(c, -s, 0.0))
                ap_, bp, cp_ = (shift(a, s, 0.0), shift(b, s, 1.0),
                                shift(c, s, 0.0))
                alpha = -a * pl.reciprocal(bm, approx=False)
                gamma = -c * pl.reciprocal(bp, approx=False)
                b = b + alpha * cm + gamma * ap_
                ds = [dq + alpha * shift(dq, -s, 0.0)
                      + gamma * shift(dq, s, 0.0) for dq in ds]
                a = alpha * am
                c = gamma * cp_
                s *= 2
            rb = pl.reciprocal(b, approx=False)
            dsts = [out_buf.at[0], out_buf.at[1], tn_buf.at[0], tn_buf.at[1]]
            for q in range(4):
                dsts[q][...] = ds[q] * rb

        if mode == "pcr":
            compute_pcr()
            return

        if mode in ("comps", "compi"):
            compute_shared(interleave=(mode == "compi"))
            return

        for v in range(4):
            slot = v % 2
            if mode in ("dma", "full"):
                wait_inputs(v, slot)
                if v >= 2:
                    pltpu.make_async_copy(out_buf.at[slot], slab4(out_hbm, v - 2),
                                          out_sems.at[slot, 0]).wait()
                    pltpu.make_async_copy(tn_buf.at[slot], slab4(tn_hbm, v - 2),
                                          out_sems.at[slot, 1]).wait()
            if mode == "comp2":
                compute2(v, slot)
            elif mode in ("comp", "full"):
                compute(v, slot)
            else:
                out_buf[slot] = in_buf[slot, 0]
                tn_buf[slot] = in_buf[slot, 2]
            if mode in ("dma", "full"):
                pltpu.make_async_copy(out_buf.at[slot], slab4(out_hbm, v),
                                      out_sems.at[slot, 0]).start()
                pltpu.make_async_copy(tn_buf.at[slot], slab4(tn_hbm, v),
                                      out_sems.at[slot, 1]).start()
                if v + 2 <= 3:
                    start_inputs(v + 2, slot)

        if mode in ("dma", "full"):
            for v in (2, 3):
                slot = v % 2
                pltpu.make_async_copy(out_buf.at[slot], slab4(out_hbm, v),
                                      out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(tn_buf.at[slot], slab4(tn_hbm, v),
                                      out_sems.at[slot, 1]).wait()

    slab = (S_TILE, n, LANES)

    @jax.jit
    def run(temp4, rhs4, op4, forc):
        return pl.pallas_call(
            kernel,
            grid=(n // S_TILE, n // LANES),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
            out_shape=(jax.ShapeDtypeStruct((4, n, n, n), jnp.float32),) * 2,
            input_output_aliases={2: 0},
            scratch_shapes=[
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM((2, 3) + slab, jnp.float32),
                pltpu.VMEM((2,) + slab, jnp.float32),
                pltpu.VMEM((2,) + slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.VMEM(slab, jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(temp4, rhs4, op4, forc)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    n = args.n
    temp4 = jnp.ones((4, n, n, n), jnp.float32)
    rhs4 = jnp.ones((4, n, n, n), jnp.float32)
    forc = jnp.ones((n, n, n), jnp.float32)

    ap2_modes = os.environ.get("PROBE_MODES",
                               "dma,comp,comp2,comps,compi,pcr,full")
    for mode in ap2_modes.split(","):
        run = make_probe(n, mode)
        op4 = jnp.zeros((4, n, n, n), jnp.float32)
        o, t = run(temp4, rhs4, op4, forc)
        sync(o)
        t0 = time.time()
        for _ in range(args.reps):
            op4 = jnp.zeros((4, n, n, n), jnp.float32)
            o, t = run(temp4, rhs4, op4, forc)
        sync(o); sync(t)
        ms = (time.time() - t0) / args.reps * 1e3
        gb = ((11 + 8) / 4 * 4 * n ** 3 * 4 / 1e9
              if mode in ("dma", "full") else 0)   # compute-only modes do no DMA
        print(f"{mode:5s}: {ms:7.2f} ms  "
              + (f"({gb / (ms / 1e3):.0f} GB/s over {gb:.2f} GB)" if gb else ""))


if __name__ == "__main__":
    main()
