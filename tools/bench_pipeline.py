"""Wall-clock comparison of sequential vs pipelined decode_many on real
hardware, plus per-stage accounting.

On the tunneled axon harness, per-dispatch RTT (~30-50 ms) and download
sync artifacts inflate every measured wall time by a roughly constant
per-sub-batch amount; the SEQUENTIAL-minus-PIPELINED difference at the
same sub-batch count isolates the overlap gain. Run standalone (one TPU
client at a time)."""
import os
import sys
import pathlib
import hashlib
import json
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from lzfse_rust_tpu.models.decoder import TpuDecoder  # noqa: E402

SNAPPY = pathlib.Path("/root/reference/data/snappy")
REPS = int(os.environ.get("BP_REPS", "8"))
RUNS = int(os.environ.get("BP_RUNS", "7"))

files = sorted(SNAPPY.glob("*.lzfse"))
srcs = [p.read_bytes() for p in files]
hashes = [pathlib.Path(str(p)[:-6] + ".hash").read_bytes() for p in files]
batch = srcs * REPS
total = None

dec = TpuDecoder(use_pallas=True, use_native_rebuild=True)


def check(outs):
    for i, o in enumerate(outs):
        assert hashlib.sha256(o).digest() == hashes[i % len(srcs)], \
            files[i % len(srcs)].name
    return sum(len(o) for o in outs)


def run(fn, label):
    stats: dict = {}
    outs = fn(stats)  # warm
    tot = check(outs)
    walls = []
    stages = []
    for _ in range(RUNS):
        st: dict = {}
        t0 = time.perf_counter()
        fn(st)
        walls.append(time.perf_counter() - t0)
        stages.append(st)
    wall = sorted(walls)[1]
    agg = {k: round(sorted(s.get(k, 0.0) for s in stages)[1], 4)
           for k in ("parse", "prep", "device", "flatten", "rebuild")}
    print(json.dumps({
        "label": label, "raw_bytes": tot,
        "wall_2nd_smallest_s": round(wall, 4),
        "wall_GBps": round(tot / wall / 1e9, 3),
        "stage_sums": agg,
        "all_walls": [round(w, 4) for w in walls]}))
    return wall, tot


w_seq, tot = run(lambda st: dec.decode_many(batch, stats=st), "sequential")
for n_sub in (2, 4, 8):
    w_p, _ = run(lambda st, n=n_sub: dec.decode_many_pipelined(
        batch, stats=st, n_sub=n), f"pipelined_n{n_sub}")
    print(f"# pipelined n_sub={n_sub}: {w_seq / w_p:.2f}x vs sequential "
          f"wall", file=sys.stderr)
