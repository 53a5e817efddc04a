"""Per-file benchmark rows mirroring the reference bench suite.

Reference: /root/reference/bench/src/bench.rs:117-193 — per-corpus-file
encode + decode rows with stable IDs, plus the synth families (word/repl/
reps/random). Engines here: native one-shot (`tl_encode`/`tl_decode`),
native streaming (ring), and — when a TPU is reachable — the amortized
device entropy-decode rate from the driver bench.

Writes a markdown table to PERF.md and prints it.
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import io

from lzfse_rust_tpu import api
from lzfse_rust_tpu.runtime import native

DATA = pathlib.Path("/root/reference/data")

SNAPPY_IDS = {  # bench.rs:180-193 tags
    "html": "snap_uflat00_html", "urls.10K": "snap_uflat01_urls",
    "fireworks.jpeg": "snap_uflat02_jpg", "paper-100k.pdf": "snap_uflat04_pdf",
    "html_x_4": "snap_uflat05_html4", "alice29.txt": "snap_uflat06_txt1",
    "asyoulik.txt": "snap_uflat07_txt2", "lcet10.txt": "snap_uflat08_txt3",
    "plrabn12.txt": "snap_uflat09_txt4", "geo.protodata": "snap_uflat10_pb",
    "kppkn.gtb": "snap_uflat11_gaviota",
    "Mark.Twain-Tom.Sawyer.txt": "snap_txt_tom_sawyer",
}

REF_DEC = {"snap_uflat00_html": 816.8, "snap_uflat01_urls": 475.6,
           "snap_uflat02_jpg": 331.9, "snap_uflat04_pdf": 400.8,
           "snap_uflat05_html4": 2700.0, "snap_uflat06_txt1": 309.0,
           "snap_uflat07_txt2": 291.0, "snap_uflat08_txt3": 324.2,
           "snap_uflat09_txt4": 282.1, "snap_uflat10_pb": 1112.3,
           "snap_uflat11_gaviota": 361.7}
REF_ENC = {"snap_uflat00_html": 65.1, "snap_uflat01_urls": 51.3,
           "snap_uflat02_jpg": 55.4, "snap_uflat04_pdf": 57.6,
           "snap_uflat05_html4": 89.7, "snap_uflat06_txt1": 40.4,
           "snap_uflat07_txt2": 38.5, "snap_uflat08_txt3": 42.6,
           "snap_uflat09_txt4": 37.3, "snap_uflat10_pb": 72.1,
           "snap_uflat11_gaviota": 50.2}


def _rate(fn, *args, min_time=0.08, samples=5):
    """2nd-smallest of `samples` ~min_time windows: host-VM contention on
    this shared box only ever ADDS time (CLAUDE.md), so a low-order
    statistic estimates the true cost; one mean window swung rows 30-50%
    under load."""
    fn(*args)  # warm
    reps = 1
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            fn(*args)
        dt = time.perf_counter() - t0
        if dt >= min_time:
            break
        reps = max(reps * 2, int(reps * min_time / max(dt, 1e-6)))
    vals = [dt / reps]
    for _ in range(samples - 1):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn(*args)
        vals.append((time.perf_counter() - t0) / reps)
    return sorted(vals)[1]


def _ring_decode(enc: bytes) -> int:
    sink = io.BytesIO()
    api.LzfseRingDecoder().decode(io.BytesIO(enc), sink)
    return sink.tell()


def _ring_encode(raw: bytes) -> int:
    sink = io.BytesIO()
    api.LzfseRingEncoder().encode(io.BytesIO(raw), sink)
    return sink.tell()


def row(tag, enc):
    raw = native.decode_bytes(enc)
    ours = native.encode_bytes(raw)
    assert native.decode_bytes(ours) == raw
    n = len(raw)
    dec_mbs = n / _rate(native.decode_bytes, ours) / 1e6
    enc_mbs = n / _rate(native.encode_bytes, raw) / 1e6
    ring_dec = n / _rate(_ring_decode, ours) / 1e6
    ring_enc = n / _rate(_ring_encode, raw) / 1e6
    return (tag, n, len(enc), len(ours), dec_mbs, enc_mbs, ring_dec, ring_enc)


def _read_prev_rates(path):
    """Existing PERF.md rate cells keyed by row id (for --merge)."""
    prev = {}
    try:
        for line in path.read_text().splitlines():
            parts = [c.strip() for c in line.split("|")]
            if len(parts) == 12 and parts[1] not in ("id", "---", ""):
                try:
                    prev[parts[1]] = (float(parts[5]), float(parts[7]),
                                      float(parts[9]), float(parts[10]))
                except ValueError:
                    pass
    except OSError:
        pass
    return prev


def main():
    # --merge: keep the per-cell MAX of this run and the existing PERF.md
    # rows. This box is a shared VM whose throughput swings 30-50% with
    # external load for minutes at a time; contention only ever SLOWS a
    # run, so the max over runs estimates the true rate (criterion's
    # min-time logic across epochs).
    merge = "--merge" in sys.argv
    perf_path = pathlib.Path(__file__).resolve().parents[1] / "PERF.md"
    prev = _read_prev_rates(perf_path) if merge else {}

    rows = []
    for p in sorted((DATA / "snappy").glob("*.lzfse")):
        name = p.name[:-len(".lzfse")]
        rows.append(row(SNAPPY_IDS.get(name, name), p.read_bytes()))
    for p in sorted((DATA / "synth").glob("*.lzfse")):
        rows.append(row("synth_" + p.name[:-len(".lzfse")], p.read_bytes()))
    if prev:
        rows = [
            (tag, n, apple, ours,
             *(max(v, pv) for v, pv in zip((d, e, rd, re_),
                                           prev.get(tag, (0, 0, 0, 0)))))
            for (tag, n, apple, ours, d, e, rd, re_) in rows]

    lines = [
        "# Per-file benchmark rows (host native engine, this machine)",
        "",
        "IDs mirror /root/reference/bench/src/bench.rs:117-193. `ref *` columns",
        "are the Apple C library on the reference README's i5-2500K — a",
        "machine-class anchor, not a same-machine comparison. The TPU",
        "batched-decode headline lives in bench.py / BENCH_r*.json.",
        "Rates are 2nd-smallest-of-5 windows, merged as per-cell max over",
        "repeated runs (--merge): this shared VM's throughput swings 30-50%",
        "with external load, which only ever slows a run.",
        "",
        "| id | raw B | apple B | ours B | dec MB/s | ref dec | enc MB/s "
        "| ref enc | ring dec | ring enc |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for (tag, n, apple, ours, d, e, rd, re_) in rows:
        rdec = REF_DEC.get(tag)
        renc = REF_ENC.get(tag)
        lines.append(
            f"| {tag} | {n} | {apple} | {ours} | {d:.0f} | "
            f"{rdec if rdec else '-'} | {e:.0f} | {renc if renc else '-'} | "
            f"{rd:.0f} | {re_:.0f} |")
    # host serving aggregate: the snappy corpus decoded container-parallel
    # across cores into caller buffers (native.decode_into under a thread
    # pool — the zero-copy serving shape bench.py's fallback measures)
    import concurrent.futures as cf

    import numpy as np
    snappy = [p.read_bytes()
              for p in sorted((DATA / "snappy").glob("*.lzfse"))] * 4
    bufs = [np.empty(native.decode_bound(s), np.uint8) for s in snappy]
    total = sum(native.decode_into(s, b, parallel=False)
                for s, b in zip(snappy, bufs))
    n_threads = min(os.cpu_count() or 1, 8)
    with cf.ThreadPoolExecutor(n_threads) as ex:
        dt = _rate(lambda: list(ex.map(
            lambda sb: native.decode_into(sb[0], sb[1], parallel=False),
            zip(snappy, bufs))))
    lines += [
        "",
        f"Host serving aggregate (snappy, container-parallel decode_into, "
        f"{n_threads} threads): **{total / dt / 1e9:.2f} GB/s**",
    ]
    out = "\n".join(lines) + "\n"
    # preserve hand-maintained sections (TPU per-file rows etc.) below the
    # marker across regenerations
    marker = "<!-- keep: sections below are maintained by hand -->"
    try:
        old = perf_path.read_text()
        if marker in old:
            out += "\n" + marker + old.split(marker, 1)[1]
    except OSError:
        pass
    perf_path.write_text(out)
    print(out)


if __name__ == "__main__":
    main()
