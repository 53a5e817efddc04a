import os, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time
from lzfse_rust_tpu.models.encoder import TpuEncoder
from lzfse_rust_tpu.runtime import native

enc = TpuEncoder()
all_ok = True
for p in sorted(pathlib.Path("/root/reference/data/snappy").glob("*.lzfse")):
    raw = native.decode_bytes(p.read_bytes())
    t0 = time.time()
    got = enc.encode_bytes(raw)
    dt = time.time() - t0
    want = native.encode_bytes(raw)
    same = got == want
    rt = native.decode_bytes(got) == raw
    all_ok &= same and rt
    print(f"{p.name:35s} {dt:6.1f}s identical={same} rt={rt} len={len(got)}", flush=True)
print("ALL", "OK" if all_ok else "MISMATCH")
