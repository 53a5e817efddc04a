"""Per-stage in-jit profile of the decode device pipeline on the real
corpus batch (the exact shapes bench.py times): payload row gathers, the
literal kernel, the LMD kernel, and output compaction, each isolated by
differencing in-jit repetition pipelines (same methodology as bench.py —
axon wall clocks lie, so every number comes from fori_loop repetition with
data deps inside one jit).

Usage: python tools/profile_device_stages.py [reps_of_corpus]
"""
import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp

import bench
import lzfse_rust_tpu.models.decoder as M
from lzfse_rust_tpu.base import constants as C
from lzfse_rust_tpu.ops.pallas_decode import (decode_literals_pallas,
                                              decode_lmds_pallas)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 24

files, srcs, hashes = bench._corpus()
batch = srcs * REPS
args, info = bench._device_setup(batch)
B, lw, mw = info["B"], info["lw"], info["mw"]
from lzfse_rust_tpu.runtime import native
total_raw = sum(len(native.decode_bytes(s)) for s in srcs) * REPS


def timed(pipe, label):
    f1 = lambda: float(pipe(*args, n_rep=1))
    f5 = lambda: float(pipe(*args, n_rep=5))
    t0 = time.time()
    f1()
    c1 = time.time() - t0
    f5()
    t = time.time(); f1(); t1 = time.time() - t
    t = time.time(); f5(); t5 = time.time() - t
    per = max((t5 - t1) / 4, 1e-9)
    print(f"{label:28s} {per*1000:8.2f} ms   "
          f"({total_raw/per/1e9:6.2f} GB/s of raw)  [compile {c1:.0f}s]",
          flush=True)
    return per


def make(pieces):
    """Build an in-jit repetition pipeline running the selected pieces."""

    @functools.partial(jax.jit, static_argnames="n_rep")
    def pipe(UT, VT, CAT, SL, SM, LS, MS, LP, MP, LN, MN, TOT, ML, MM,
             n_rep):
        def gath(starts, w_words):
            idx = (starts[:, None]
                   + jnp.arange(w_words // 128, dtype=jnp.int32)[None, :])
            return jnp.take(CAT, idx.reshape(-1), axis=0).reshape(B, w_words)

        def comp(x2d, rows_idx):
            Bx, n = x2d.shape
            return jnp.take(x2d.reshape(Bx * (n // 128), 128), rows_idx,
                            axis=0)

        def body(r, acc):
            # full sums (not strided picks) so XLA cannot narrow the
            # gathers; the reduce is HBM-fused and identical across
            # pipelines so it cancels in the differencing
            if "lit" in pieces or "gath" in pieces:
                LW = gath(SL + r - r, lw)
                acc = acc + jnp.sum(LW)
            if "lmd" in pieces or "gath" in pieces:
                MW = gath(SM + r - r, mw)
                acc = acc + jnp.sum(MW)
            if "lit" in pieces:
                lits, lfs, _ = decode_literals_pallas(
                    UT + r - r, LW, LS, LP + r - r, LN, TOT,
                    C.LITERALS_PER_BLOCK // 4)
                acc = acc + jnp.sum(lfs)
                if "comp" in pieces:
                    acc = acc + jnp.sum(comp(lits, ML))
                else:
                    acc = acc + jnp.sum(lits)
            if "lmd" in pieces:
                lm, dd, mfs, _ = decode_lmds_pallas(
                    VT + r - r, MW, MS, MP + r - r, MN, C.LMDS_PER_BLOCK)
                acc = acc + jnp.sum(mfs)
                if "comp" in pieces:
                    acc = acc + jnp.sum(comp(lm, MM)) + jnp.sum(comp(dd, MM))
                else:
                    acc = acc + jnp.sum(lm) + jnp.sum(dd)
            return acc

        return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

    return pipe


print(f"corpus x{REPS}: {info['nb']} blocks, B={B}, lw={lw}, mw={mw}, "
      f"{total_raw/1e6:.1f} MB raw", flush=True)
t_g = timed(make({"gath"}), "payload row gathers")
t_l = timed(make({"lit"}), "gath+literal kernel")
t_m = timed(make({"lmd"}), "gath+lmd kernel")
t_a = timed(make({"lit", "lmd", "comp"}), "full (gath+kernels+compact)")
lit_net = t_l - t_g / 2
lmd_net = t_m - t_g / 2
print(f"\nstage model: gathers {t_g*1e3:.2f} | lit ~{lit_net*1e3:.2f} | "
      f"lmd ~{lmd_net*1e3:.2f} | compact ~{(t_a-(t_l+t_m-t_g))*1e3:.2f} ms")
