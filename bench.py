#!/usr/bin/env python
"""Benchmark driver: honest end-to-end TPU decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N, "extra": {...}}

The measured quantity is FULL container decode over the Snappy corpus through
TpuDecoder.decode_many — host container parse, batch prep, device tANS table
build + literal/LMD Pallas kernels, host flatten, and the multithreaded
native LZ rebuild — at a serving batch of 8 corpus replicas (280 FSE blocks
in flight). Outputs are SHA-256-verified against the reference fixture
hashes inside the bench, and the run asserts zero spec-layer fallbacks so a
kernel regression cannot hide behind the fallback path.

Timing methodology: host stages use wall clock from instrumented
decode_many; the device stage is measured with in-jit repetition (the
kernels loop inside one dispatch with data dependencies and one scalar is
downloaded), because on this tunneled harness async dispatch RTT (~30-50 ms)
and sub-MB/s device->host downloads would otherwise swamp the measurement.
Host<->device payload transfers are therefore excluded; at PCIe rates the
corpus batch (~30 MB) moves in ~2 ms, <2% of the pipeline.

vs_baseline compares against the reference C library's aggregate full-decode
throughput on the same corpus (BASELINE.md lzfse_ref column, size-weighted
aggregate = 0.46 GB/s on the i5-2500K).

The metric is the stage-sum model: no host/device overlap is assumed. A
three-plane pipelined driver existed in round 2 but measured ZERO wall
saving on this harness (walls are tunnel-RTT dominated — seconds for a
~100 ms pipeline — so a sub-100 ms overlap gain is below the noise floor
and cannot be demonstrated honestly); it was removed rather than carried
unproven.
"""

import hashlib
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

SNAPPY = pathlib.Path("/root/reference/data/snappy")
# Corpus replicas per decode_many call (serving-style batch). Bigger
# batches pack the size-sorted 128-block kernel groups tighter (at 8 reps
# the literal kernel pays 1.97x the needed steps from pad + within-group
# spread) and amortize fixed dispatch — the steady-state serving regime
# the metric models. Hardware sweep on the r5 tree (2026-08-20, one
# queue): 0.70 / 0.99 / 1.09 GB/s at 8/24/48 reps (entropy stage 1.26 /
# 1.70 / 1.83 — group utilization keeps improving), so 48 is the default
# serving batch; blocks_in_flight rides in extra for comparability.
# 96 reps measured WORSE (0.93): entropy plateaus at 1.82 while the
# host rebuild/prep scale super-linearly past the cache-friendly
# working set (rebuild 4.0 GB/s vs 7.6 at 48) — recorded, don't raise.
REPS = int(os.environ.get("LZT_BENCH_REPS", "48"))

# lzfse_ref aggregate ENCODE throughput on the corpus (size-weighted from
# BASELINE.md's encode rows, README.md:166-176) — the vs_ref_encode base
ENC_BASELINE_GBPS = 0.0496

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


def _corpus():
    files = sorted(SNAPPY.glob("*.lzfse"))
    srcs = [p.read_bytes() for p in files]
    hashes = [pathlib.Path(str(p)[:-len(".lzfse")] + ".hash").read_bytes()
              for p in files]
    return files, srcs, hashes


def _device_setup(srcs):
    """Build the exact device-stage inputs decode_many would dispatch for
    `srcs`: packed tables (host-built, pre-sorted), the 512B-aligned payload
    cat, per-block states/positions/counts, and the compaction maps.
    Shared by the bench's in-jit timer and tools/profile_device_stages.py."""
    import functools
    import numpy as np
    import jax
    import jax.numpy as jnp
    import lzfse_rust_tpu.models.decoder as M
    from lzfse_rust_tpu.base import constants as C
    from lzfse_rust_tpu.ops.pallas_decode import (R_ROWS,
                                                  decode_literals_pallas,
                                                  decode_lmds_pallas)

    fse_blocks = []
    for i, s in enumerate(srcs):
        M._parse_container(s, i, fse_blocks)
    nb = len(fse_blocks)
    B = M._round_up(max(nb, R_ROWS), R_ROWS)
    lit_pos = np.zeros(B, np.int32)
    lmd_pos = np.zeros(B, np.int32)
    lit_states = np.zeros((B, 4), np.int32)
    lmd_states = np.zeros((B, 3), np.int32)
    lit_num = np.zeros(B, np.int32)
    lmd_num = np.zeros(B, np.int32)
    for i, d in enumerate(fse_blocks):
        lp, mp = d.lit_payload, d.lmd_payload
        lit_pos[i] = len(lp) * 8 - d.block.literal.bits
        lmd_pos[i] = len(mp) * 8 - d.block.lmd.bits
        lit_states[i] = d.block.literal.state
        ls = d.block.lmd.state
        lmd_states[i] = (ls[0], ls[1] + C.L_STATES,
                         ls[2] + C.L_STATES + C.M_STATES)
        lit_num[i] = d.block.literal.num
        lmd_num[i] = d.block.lmd.num

    perm_l = np.argsort(-((lit_num + 3) // 4), kind="stable").astype(np.int32)
    perm_m = np.argsort(-lmd_num, kind="stable").astype(np.int32)
    # packed tables built host-side (native engine), uploaded pre-sorted;
    # payloads travel as the compact 512B-aligned cat and expand on device
    # via the row gather — exactly what decode_many does. The device stage
    # is the gathers + the two kernels.
    from lzfse_rust_tpu.runtime import native
    v_tabs = np.zeros((B, 384), np.int32)
    u_tabs = np.zeros((B, 384), np.int32)
    u_tot = np.zeros(B, np.int32)
    inv_l = np.argsort(perm_l).astype(np.int32)
    inv_m = np.argsort(perm_m).astype(np.int32)
    lens_l = np.array([len(d.lit_payload) for d in fse_blocks], np.int64)
    lens_m = np.array([len(d.lmd_payload) for d in fse_blocks], np.int64)
    w16 = np.empty((nb, C.N_WEIGHTS), np.uint16)
    for i, d in enumerate(fse_blocks):
        w16[i] = d.weights
    native.build_tables3_batch(w16, inv_m[:nb], inv_l[:nb], v_tabs, u_tabs,
                               u_tot)
    AL = M._ALIGN
    cum = np.cumsum(np.concatenate((
        (lens_l + AL - 1) // AL, (lens_m + AL - 1) // AL)))
    starts_all = np.concatenate(([0], cum[:-1])).astype(np.int32)
    start_l = np.zeros(B, np.int32)
    start_m = np.zeros(B, np.int32)
    start_l[inv_l[:nb]] = starts_all[:nb]
    start_m[inv_m[:nb]] = starts_all[nb:]
    zpad = b"\0" * AL
    cat = b"".join(
        [p + zpad[:-len(p) % AL or 0]
         for p in ([d.lit_payload for d in fse_blocks]
                   + [d.lmd_payload for d in fse_blocks])])
    stage = M._cat_staging(len(cat))
    stage[:len(cat)] = np.frombuffer(cat, np.uint8)
    cat2d = stage.view(np.int32).reshape(-1, 128)
    # batch-bucketed window widths EXACTLY as decode_many dispatches them
    # (decoder.py _walk_front): the static PAD constants used here before
    # overstated the gather volume and dropped the LMD kernel to G=8
    lw = M._w_bucket(int(lens_l.max()))
    mw = M._w_bucket(int(lens_m.max()))

    def vec(x):
        out = np.zeros((B, 128), np.int32)
        out[:, :x.shape[1]] = x
        return jnp.asarray(out)

    def bc(x):
        return jnp.asarray(np.repeat(x[:, None], 128, 1).astype(np.int32))

    # device-side output compaction (decode_many downloads dense used-row
    # prefixes) is part of the device stage — time it in-jit too. Kernel
    # output widths come from the wrappers' shape logic via eval_shape.
    def _kshapes():
        lit_sh = jax.eval_shape(
            functools.partial(decode_literals_pallas,
                              n_steps=C.LITERALS_PER_BLOCK // 4),
            jax.ShapeDtypeStruct((B, 384), jnp.int32),
            jax.ShapeDtypeStruct((B, lw), jnp.int32),
            *[jax.ShapeDtypeStruct((B, 128), jnp.int32)] * 3,
            jax.ShapeDtypeStruct((B,), jnp.int32))[0]
        lmd_sh = jax.eval_shape(
            functools.partial(decode_lmds_pallas, n_steps=C.LMDS_PER_BLOCK),
            jax.ShapeDtypeStruct((B, 384), jnp.int32),
            jax.ShapeDtypeStruct((B, mw), jnp.int32),
            *[jax.ShapeDtypeStruct((B, 128), jnp.int32)] * 3)[0]
        return int(lit_sh.shape[1]), int(lmd_sh.shape[1])

    lit_cols, lmd_cols = _kshapes()
    map_l, _ = M._compact_map((lit_num[perm_l] + 3) // 4, lit_cols)
    map_m, _ = M._compact_map(lmd_num[perm_m], lmd_cols)

    args = (jnp.asarray(u_tabs), jnp.asarray(v_tabs),
            jnp.asarray(np.ascontiguousarray(cat2d)),
            jnp.asarray(start_l), jnp.asarray(start_m),
            vec(lit_states[perm_l]),
            vec(lmd_states[perm_m]), bc(lit_pos[perm_l]), bc(lmd_pos[perm_m]),
            bc(lit_num[perm_l]), bc(lmd_num[perm_m]), jnp.asarray(u_tot),
            jnp.asarray(map_l), jnp.asarray(map_m))
    return args, dict(B=B, lw=lw, mw=mw, nb=nb)


def _device_time_injit(srcs):
    """In-jit repetition timing of the device stage exactly as decode_many
    runs it: payload row gathers + both Pallas kernels + output compaction,
    sorted blocks, dynamic per-group step counts."""
    import functools
    import jax
    import jax.numpy as jnp
    import lzfse_rust_tpu.models.decoder as M
    from lzfse_rust_tpu.base import constants as C

    from lzfse_rust_tpu.ops.pallas_decode import (decode_literals_pallas,
                                                  decode_lmds_pallas)

    args, info = _device_setup(srcs)
    B, lw, mw = info["B"], info["lw"], info["mw"]

    @functools.partial(jax.jit, static_argnames="n_rep")
    def pipe(UT, VT, CAT, SL, SM, LS, MS, LP, MP, LN, MN, TOT, ML, MM,
             n_rep):
        def gath(starts, w_words):
            idx = (starts[:, None]
                   + jnp.arange(w_words // 128, dtype=jnp.int32)[None, :])
            return jnp.take(CAT, idx.reshape(-1), axis=0).reshape(
                B, w_words)

        def comp(x2d, rows_idx):
            Bx, n = x2d.shape
            return jnp.take(x2d.reshape(Bx * (n // 128), 128), rows_idx,
                            axis=0)

        def body(r, acc):
            LW = gath(SL + r - r, lw)
            MW = gath(SM + r - r, mw)
            lits, lfs, _ = decode_literals_pallas(
                UT + r - r, LW, LS, LP + r - r, LN, TOT,
                C.LITERALS_PER_BLOCK // 4)
            lm, dd, mfs, _ = decode_lmds_pallas(
                VT + r - r, MW, MS, MP + r - r, MN,
                C.LMDS_PER_BLOCK)
            # sum (not a single element) so XLA cannot narrow the gathers
            lit_c = comp(lits, ML)
            lm_c = comp(lm, MM)
            d_c = comp(dd, MM)
            return (acc + jnp.sum(lfs) + jnp.sum(mfs) + jnp.sum(lit_c)
                    + jnp.sum(lm_c) + jnp.sum(d_c))
        return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

    f1 = lambda: float(pipe(*args, n_rep=1))
    f5 = lambda: float(pipe(*args, n_rep=5))
    f1(); f5()
    t = time.time(); f1(); t1 = time.time() - t
    t = time.time(); f5(); t5 = time.time() - t
    return max((t5 - t1) / 4, 1e-9), args, info


def bench_tpu_full_decode():
    from lzfse_rust_tpu.models.decoder import TpuDecoder

    files, srcs, hashes = _corpus()
    batch = srcs * REPS
    dec = TpuDecoder(use_pallas=True, use_native_rebuild=True)
    stats = {}
    outs = dec.decode_many(batch, stats=stats)  # warm compile + run
    # correctness gate: every output must hash to the reference fixture hash
    for i, out in enumerate(outs):
        want = hashes[i % len(srcs)]  # raw 32-byte sha256 digest fixture
        got = hashlib.sha256(out).digest()
        assert got == want, f"decode mismatch on {files[i % len(srcs)].name}"
    assert stats.get("fallbacks", 0) == 0, f"spec fallbacks: {stats}"

    # steady-state host stage timing: 2nd-smallest of 7 warm runs per
    # stage. Host-VM contention on this shared 4-core box only ever ADDS
    # time (observed 2-4x spikes on identical code), so a low-order
    # statistic estimates the true stage cost; discarding the single
    # smallest sample guards against a lucky fluke.
    runs = []
    for _ in range(7):
        stats = {}
        dec.decode_many(batch, stats=stats)
        assert stats.get("fallbacks", 0) == 0
        runs.append(stats)
    low = lambda k: sorted(r[k] for r in runs)[1]
    stats = {k: low(k) for k in ("parse", "prep", "flatten", "rebuild")}
    t_host = sum(stats.values())
    t_dev, dev_args, dev_info = _device_time_injit(batch)
    total_raw = sum(len(o) for o in outs)
    t_full = t_host + t_dev
    det = runs[-1].get("detail_prep", {})
    # Transfer accounting (VERDICT r3 #9): the tunneled harness cannot
    # measure real PCIe (downloads run sub-MB/s through the link), so the
    # bench reports the actual byte volumes the pipeline moves plus a
    # MODELED transfer time at a stated PCIe gen3 x16 effective rate —
    # labeled as modeled, not measured.
    PCIE_GBPS = 12.0
    up_bytes = sum(int(a.nbytes) for a in dev_args)  # shape math only
    map_l, map_m = dev_args[-2], dev_args[-1]
    B = dev_info["B"]
    down_bytes = ((int(map_l.shape[0]) + 2 * int(map_m.shape[0])) * 128 * 4
                  + 4 * B * 128 * 4)  # compacted rows + final states/pos
    t_transfer = (up_bytes + down_bytes) / (PCIE_GBPS * 1e9)
    extra = {
        "parse_s": round(stats["parse"], 4),
        "prep_s": round(stats["prep"], 4),
        "device_injit_s": round(t_dev, 4),
        "flatten_s": round(stats["flatten"], 4),
        "rebuild_s": round(stats["rebuild"], 4),
        "blocks_in_flight": REPS * 35,
        "entropy_stage_GBps": round(total_raw / t_dev / 1e9, 4),
        "raw_bytes": total_raw,
        "prep_detail_s": {k: round(v, 4) for k, v in det.items()},
        # transfer-inclusive view (modeled PCIe — see comment above):
        "transfer_bytes_up": up_bytes,
        "transfer_bytes_down": down_bytes,
        "pcie_model_GBps": PCIE_GBPS,
        "full_decode_with_transfers_modeled_GBps": round(
            total_raw / (t_full + t_transfer) / 1e9, 4),
    }

    return total_raw / t_full / 1e9, extra


def _tpu_reachable(timeout_s: int = 180) -> bool:
    """Device discovery AND a tiny computation in a KILLABLE subprocess.
    On this harness a dead tunnel can make jax.devices() hang forever
    (not raise) — and in some outage phases discovery still answers
    while any COMPUTE dispatch wedges (observed 2026-08-20), which would
    hang the whole bench. Probing with a real matmul+download catches
    both so the retry/fallback logic actually engages."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "assert len(jax.devices()) > 0;"
             "x = jnp.ones((256, 256), jnp.float32);"
             "assert float(jnp.sum(x @ x)) > 0"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def bench_native_decode():
    """Fallback: host-native decode throughput when no accelerator exists.

    Measures the host SERVING path — independent containers decode in
    parallel across cores (ctypes releases the GIL), the host analog of
    decode_many's block parallelism — and reports the thread count in the
    extra dict alongside the single-thread aggregate for comparability
    with the single-core reference baseline."""
    import concurrent.futures as cf
    import hashlib

    from lzfse_rust_tpu.runtime import native
    files = sorted(SNAPPY.glob("*.lzfse"))
    srcs = [p.read_bytes() for p in files]
    hashes = [pathlib.Path(str(p)[:-len(".lzfse")] + ".hash").read_bytes()
              for p in files]
    outs = [native.decode_bytes(s) for s in srcs]  # warm
    for o, want in zip(outs, hashes):
        assert hashlib.sha256(o).digest() == want
    total = sum(len(o) for o in outs)

    def timed(fn, reps=3):
        best = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            best.append((time.perf_counter() - t0) / reps)
        return sorted(best)[1]  # 2nd-smallest guards VM noise (CLAUDE.md)

    import numpy as np
    seq = lambda s: native.decode_bytes(s, parallel=False)
    t1 = timed(lambda: [seq(s) for s in srcs])
    n_threads = min(os.cpu_count() or 1, 8)
    batch = srcs * 4  # serving batch: enough work per worker
    # container-level parallelism only (the per-container mt engine would
    # nest pools), decoding into preallocated caller buffers — the
    # bytes-copy-free serving shape, so the GIL never serializes output
    bufs = [np.empty(native.decode_bound(s), np.uint8) for s in batch]
    nd = [native.decode_into(s, b, parallel=False)
          for s, b in zip(batch, bufs)]  # warm + verify
    for (s, b), n, want in zip(zip(batch, bufs), nd,
                               hashes * 4):
        assert hashlib.sha256(b[:n].tobytes()).digest() == want
    with cf.ThreadPoolExecutor(n_threads) as ex:
        tp = timed(lambda: list(ex.map(
            lambda sb: native.decode_into(sb[0], sb[1], parallel=False),
            zip(batch, bufs))), reps=1)
    par = total * 4 / tp
    extra = {
        "single_thread_GBps": round(total / t1 / 1e9, 4),
        "threads": n_threads,
    }
    return par / 1e9, extra


def main():
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

    metric = "snappy_full_decode_GBps_chip"
    extra = {}
    tpu_ok = False
    try:
        # the tunnel has observed dead phases of tens of minutes that
        # recover on their own; retry discovery a few times before
        # abandoning the TPU metric for the host fallback
        reachable = False
        for attempt in range(3):
            if _tpu_reachable():
                reachable = True
                break
            sys.stderr.write(f"device discovery attempt {attempt + 1} "
                             "timed out; retrying in 120s\n")
            time.sleep(120)
        if not reachable:
            raise RuntimeError("device discovery timed out (tunnel down)")
        value, extra = bench_tpu_full_decode()
        tpu_ok = True
    except Exception as e:  # no TPU / compile issue: report host native path
        sys.stderr.write(f"tpu bench failed ({type(e).__name__}: {e}); "
                         "falling back to native host decode\n")
        metric = "snappy_native_decode_GBps_host"
        value, extra = bench_native_decode()

    # encode headline rides in extra (tools/bench_encode_e2e.py in a
    # subprocess so an encode-side failure cannot take down the decode
    # metric); in-bench byte-identity against the native encoder included
    if tpu_ok and os.environ.get("LZT_BENCH_ENCODE", "1") == "1":
        try:
            import subprocess
            here = pathlib.Path(__file__).resolve().parent
            r = subprocess.run(
                [sys.executable, str(here / "tools" / "bench_encode_e2e.py")],
                capture_output=True, text=True, timeout=2400, cwd=str(here))
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            enc = json.loads(line)
            extra["encode"] = {
                "full_encode_GBps_chip": enc["value"],
                "vs_ref_encode": round(
                    enc["value"] / ENC_BASELINE_GBPS, 2),
                "frontend": enc.get("frontend"),
                "stages_s": enc.get("stages_s"),
                # labeled model: pipelined chunks overlap frontends with
                # the async-dispatched emission kernels (see
                # tools/bench_encode_e2e.py)
                "pipeline_overlap_model": enc.get(
                    "pipeline_overlap_model"),
            }
        except Exception as e:
            extra["encode_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(value / base, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
