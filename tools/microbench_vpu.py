"""Microbenchmark Mosaic/VPU primitive costs on the axon v5e chip.

Measures ns per op for the primitives the decode kernels are built from
(gather along lanes, roll, select, add, dynamic-slice refresh, loop
overhead) using the in-jit repetition methodology (CLAUDE.md: wall-clock
around single dispatches lies on this harness).
"""
import os, sys, pathlib, time, functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_OPS = 32  # ops per loop iteration


def run(name, body, n_steps):
    """body(x, tab, i) -> x', applied N_OPS times per loop iteration."""
    def kernel(tab_ref, x_ref, out_ref, *, n_steps):
        tab = tab_ref[:, :]

        def step(i, x):
            for j in range(N_OPS):
                x = body(x, tab, j)
            return x

        out_ref[:, :] = jax.lax.fori_loop(0, n_steps, step, x_ref[:, :])

    @functools.partial(jax.jit, static_argnames="n")
    def go(tab, x, n):
        return pl.pallas_call(
            functools.partial(kernel, n_steps=n),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(tab, x)

    tab = jnp.asarray(np.random.randint(0, 128, (8, 1024), np.int32))
    x = jnp.asarray(np.random.randint(0, 128, (8, 128), np.int32))
    lo = n_steps // 8
    f_lo = lambda: np.asarray(go(tab, x, lo)).sum()
    f_hi = lambda: np.asarray(go(tab, x, n_steps)).sum()
    t0 = time.time(); f_lo(); f_hi(); c = time.time() - t0
    t0 = time.time(); f_lo(); t_lo = time.time() - t0
    t0 = time.time(); f_hi(); t_hi = time.time() - t0
    per_op = (t_hi - t_lo) / ((n_steps - lo) * N_OPS)
    print(f"{name:28s} {per_op*1e9:7.2f} ns/op   (compile {c:.0f}s)",
          flush=True)
    return per_op


lane = None


def main():
    mask = None

    # dependent chain: latency
    run("add (chain)", lambda x, tab, j: x + 1, 200_000)
    run("gather128 (chain)",
        lambda x, tab, j: jnp.take_along_axis(tab[:, :128], x & 127, axis=1),
        50_000)
    run("roll (chain)", lambda x, tab, j: pltpu.roll(x, 1, 1) + 1, 100_000)

    def sel(x, tab, j):
        return jnp.where(x > 64, x - 1, x + 1)
    run("select (chain)", sel, 100_000)

    # independent: throughput (accumulate 8 independent streams)
    def gather_tp(x, tab, j):
        return x + jnp.take_along_axis(tab[:, (j % 8) * 128:(j % 8) * 128 + 128],
                                       (x + j) & 127, axis=1)
    run("gather128 (indep)", gather_tp, 50_000)

    def shift_tp(x, tab, j):
        return (x >> 1) ^ (x << 2)
    run("shift pair", shift_tp, 100_000)

    # 16-lane-wide gather source (sectioned table tile width)
    def gather16(x, tab, j):
        return x + jnp.take_along_axis(tab[:, :128], x & 15, axis=1)
    run("gather idx<16 (indep)", gather16, 50_000)

    # loop overhead: empty-ish body
    run("xor only", lambda x, tab, j: x ^ 3, 200_000)

    # ---- true throughput: N independent streams, combined once per iter ----
    def run_tp(name, width, make_op, n_steps):
        """width independent op chains; per-iteration chain length is 1 op +
        a combine tree, so with enough width the measurement approaches
        issue throughput rather than latency."""
        def kernel(tab_ref, x_ref, out_ref, *, n_steps):
            tab = tab_ref[:, :]

            def step(i, x):
                ys = [make_op(x + j, tab, j) for j in range(width)]
                acc = ys[0]
                for y in ys[1:]:
                    acc = acc + y
                return acc & 127

            out_ref[:, :] = jax.lax.fori_loop(0, n_steps, step, x_ref[:, :])

        @functools.partial(jax.jit, static_argnames="n")
        def go(tab, x, n):
            return pl.pallas_call(
                functools.partial(kernel, n_steps=n),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )(tab, x)

        tab = jnp.asarray(np.random.randint(0, 128, (8, 1024), np.int32))
        x = jnp.asarray(np.random.randint(0, 128, (8, 128), np.int32))
        lo = n_steps // 8
        f_lo = lambda: np.asarray(go(tab, x, lo)).sum()
        f_hi = lambda: np.asarray(go(tab, x, n_steps)).sum()
        t0 = time.time(); f_lo(); f_hi(); c = time.time() - t0
        t0 = time.time(); f_lo(); t_lo = time.time() - t0
        t0 = time.time(); f_hi(); t_hi = time.time() - t0
        per_op = (t_hi - t_lo) / ((n_steps - lo) * width)
        print(f"{name:28s} {per_op*1e9:7.2f} ns/op   (compile {c:.0f}s)",
              flush=True)

    run_tp("gather x8 indep (tput)", 8,
           lambda x, tab, j: jnp.take_along_axis(tab[:, :128], x & 127,
                                                 axis=1), 30_000)
    run_tp("roll x8 indep (tput)", 8,
           lambda x, tab, j: pltpu.roll(x, (j % 7) + 1, 1), 30_000)

    # prefix patterns: chained rolls vs independent roll tree
    def prefix_chain(x, tab, j):
        k = x & 15
        ks = k + pltpu.roll(k, 1, 1)
        ks = ks + pltpu.roll(ks, 2, 1)
        return ks

    def prefix_tree(x, tab, j):
        k = x & 15
        r1 = pltpu.roll(k, 1, 1)
        r2 = pltpu.roll(k, 2, 1)
        r3 = pltpu.roll(k, 3, 1)
        return k + r1 + (r2 + r3)

    run("prefix 2-chained-roll", prefix_chain, 50_000)
    run("prefix 3-indep-roll", prefix_tree, 50_000)

    # simulated literal-step critical chain: gather -> indep rolls -> arith
    def lit_step(x, tab, j):
        ent = jnp.take_along_axis(tab[:, :128], x & 127, axis=1)
        k = ent & 15
        r1 = pltpu.roll(k, 1, 1)
        r2 = pltpu.roll(k, 2, 1)
        r3 = pltpu.roll(k, 3, 1)
        ksum = k + r1 + (r2 + r3)
        w = jnp.take_along_axis(tab[:, 128:256], ksum & 127, axis=1)
        return (w >> (k.astype(jnp.uint32) & 7).astype(jnp.int32)) & 127

    run("sim lit step (g,3r,g)", lit_step, 30_000)


if __name__ == "__main__":
    main()
