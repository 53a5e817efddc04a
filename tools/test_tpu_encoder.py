import os, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time
from lzfse_rust_tpu.models.encoder import TpuEncoder
from lzfse_rust_tpu.runtime import native

enc = TpuEncoder()
for name in ["html", "alice29.txt", "urls.10K"]:
    p = pathlib.Path(f"/root/reference/data/snappy/{name}.lzfse")
    raw = native.decode_bytes(p.read_bytes())
    t0 = time.time()
    got = enc.encode_bytes(raw)
    dt = time.time() - t0
    want = native.encode_bytes(raw)
    print(f"{name}: {dt:.1f}s byte-identical-to-native={got == want} "
          f"roundtrip={native.decode_bytes(got) == raw}", flush=True)
