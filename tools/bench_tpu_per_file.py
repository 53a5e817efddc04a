"""Per-file TPU full-decode rows (the reference benches every corpus file
with stable IDs — bench.rs:180-193; this is the TPU-pipeline analog of
PERF.md's host rows).

Each file is decoded as its own serving batch ([file] * reps, reps sized to
~24MB of raw output so the kernels see a steady-state batch), with the same
sum-model accounting as bench.py: host stages wall-clocked from instrumented
decode_many (2nd-smallest of 5 warm runs), the device stage measured with
in-jit repetition on the exact dispatch shapes. SHA-verified per run.

Usage: python tools/bench_tpu_per_file.py   (~all 11 files; prints a
markdown table for PERF.md and one JSON line per file)
"""
import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import bench
from lzfse_rust_tpu.models.decoder import TpuDecoder
from lzfse_rust_tpu.runtime import native

SNAPPY = pathlib.Path("/root/reference/data/snappy")
TARGET_RAW = 24 << 20

rows = []
dec = TpuDecoder(use_pallas=True, use_native_rebuild=True)
only = set(sys.argv[1:])  # optional file-name filters (substring match)
for p in sorted(SNAPPY.glob("*.lzfse")):
    name = p.name[:-len(".lzfse")]
    if only and not any(f in name for f in only):
        continue
    src = p.read_bytes()
    want = pathlib.Path(str(p)[:-len(".lzfse")] + ".hash").read_bytes()
    raw_n = len(native.decode_bytes(src))
    reps = max(1, TARGET_RAW // max(raw_n, 1))
    batch = [src] * reps
    outs = dec.decode_many(batch)  # warm + compile
    for o in outs:
        assert hashlib.sha256(o).digest() == want, name
    runs = []
    for _ in range(5):
        st: dict = {}
        outs = dec.decode_many(batch, stats=st)
        assert st.get("fallbacks", 0) == 0, (name, st)
        runs.append(st)
    low = lambda k: sorted(r[k] for r in runs)[1]
    t_host = sum(low(k) for k in ("parse", "prep", "flatten", "rebuild"))
    t_dev = bench._device_time_injit(batch)[0]
    total = raw_n * reps
    mbps = total / (t_host + t_dev) / 1e6
    ref = bench.REF_DECODE_MBPS.get(name)
    rows.append((name, reps, mbps, ref))
    print(json.dumps({
        "file": name, "reps": reps, "raw_bytes": total,
        "tpu_dec_MBps": round(mbps, 1),
        "host_s": round(t_host, 4), "device_injit_s": round(t_dev, 4),
        "stages_s": {k: round(low(k), 4)
                     for k in ("parse", "prep", "flatten", "rebuild")},
        "prep_detail_s": {k: round(v, 4) for k, v in
                          runs[-1].get("detail_prep", {}).items()},
        "ref_dec_MBps": ref,
    }), flush=True)

print("\n| file | tpu dec MB/s | lzfse_ref MB/s | ratio |")
print("|---|---|---|---|")
for name, reps, mbps, ref in rows:
    r = f"{mbps/ref:.2f}x" if ref else "-"
    print(f"| {name} | {mbps:.0f} | {ref or '-'} | {r} |")
