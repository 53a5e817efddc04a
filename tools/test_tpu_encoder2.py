import os, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time
from lzfse_rust_tpu.models.encoder import TpuEncoder
from lzfse_rust_tpu.runtime import native
from lzfse_rust_tpu.spec import container as spec

enc = TpuEncoder()
for name in ["urls.10K", "html_x_4", "plrabn12.txt"]:
    p = pathlib.Path(f"/root/reference/data/snappy/{name}.lzfse")
    raw = native.decode_bytes(p.read_bytes())
    t0 = time.time()
    got = enc.encode_bytes(raw)
    dt = time.time() - t0
    rt = native.decode_bytes(got) == raw
    print(f"{name}: {dt:.1f}s len={len(got)} vs apple={p.stat().st_size} roundtrip={rt}", flush=True)
