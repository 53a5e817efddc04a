import os, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time, numpy as np, jax, jax.numpy as jnp, functools
from lzfse_rust_tpu.ops.match_find_tpu import find_matches_device
from lzfse_rust_tpu.runtime import native

raw = native.decode_bytes(pathlib.Path("/root/reference/data/snappy/urls.10K.lzfse").read_bytes())
N = 1 << 20
src = np.zeros(N, np.uint8)
n = min(len(raw), N - 128)
src[:n] = np.frombuffer(raw[:n], np.uint8)
S = jnp.asarray(src)

@functools.partial(jax.jit, static_argnames="n_rep")
def rep(S, n_rep):
    def body(r, acc):
        pos, cands, lcps = find_matches_device(S, jnp.int32(n) + r - r, False)
        return acc + jnp.sum(lcps) + pos[0]
    return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

f1 = lambda: float(rep(S, 1)); f5 = lambda: float(rep(S, 5))
f1(); f5()
t=time.time(); f1(); t1=time.time()-t
t=time.time(); f5(); t5=time.time()-t
per = (t5-t1)/4
print(f"device match finding: {per*1000:.1f}ms per {n} bytes -> {n/per/1e6:.0f} MB/s")
