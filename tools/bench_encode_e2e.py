"""End-to-end TPU encode throughput: TpuEncoder.encode_many over the corpus.

Measures the full batched serving encode — device match finding (pooled
window dispatches per size bucket), host selection scan, and pooled device
FSE block emission — as wall clock around encode_many, 2nd-smallest of
RUNS warm runs (host-VM contention only ever adds time; see CLAUDE.md).
Outputs are verified byte-identical to the native engine in-bench, which
(by the suite's invariants) equals the spec encoder at every size.

Tunnel caveat: wall clock on the axon harness carries per-dispatch RTT
(~30-50 ms); encode_many batches all windows into a handful of dispatches
per size bucket, so the inflation is bounded and the number is a LOWER
bound on real-hardware throughput. Run standalone (one TPU client at a
time). Reference bar: lzfse_ref encode 37-90 MB/s per file (BASELINE.md).
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from lzfse_rust_tpu.models.encoder import TpuEncoder  # noqa: E402
from lzfse_rust_tpu.runtime import native  # noqa: E402

SNAPPY = pathlib.Path("/root/reference/data/snappy")
REPS = int(os.environ.get("BE_REPS", "4"))
RUNS = int(os.environ.get("BE_RUNS", "5"))

files = sorted(SNAPPY.glob("*.lzfse"))
raws = [native.decode_bytes(p.read_bytes()) for p in files]
batch = raws * REPS
total_raw = sum(len(r) for r in batch)

enc = TpuEncoder()
outs = enc.encode_many(batch)  # warm compile + run
for i, (r, o) in enumerate(zip(batch, outs)):
    want = native.encode_bytes(r)
    assert o == want, (
        f"encode mismatch vs native on {files[i % len(files)].name}")

walls = []
for _ in range(RUNS):
    t0 = time.perf_counter()
    enc.encode_many(batch)
    walls.append(time.perf_counter() - t0)
wall = sorted(walls)[1] if len(walls) > 1 else walls[0]

print(json.dumps({
    "metric": "snappy_tpu_encode_many_MBps",
    "value": round(total_raw / wall / 1e6, 2),
    "unit": "MB/s",
    "n_sources": len(batch),
    "raw_bytes": total_raw,
    "wall_s": round(wall, 4),
    "all_walls": [round(w, 4) for w in walls],
}))
