"""In-jit match-finder throughput (the round-1 13 MB/s figure was measured
per dispatch and swamped by the 30-50ms tunnel RTT; this measures the
device pipeline honestly with in-jit repetition)."""
import os, sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
from lzfse_rust_tpu.ops.match_find_tpu import find_matches_device
from lzfse_rust_tpu.runtime import native

raws = []
for p in sorted(pathlib.Path("/root/reference/data/snappy").glob("*.lzfse")):
    raws.append(native.decode_bytes(p.read_bytes()))
data = (b"".join(raws) * 1)[: (1 << 20) - 128]
N = 1 << 20
src = np.zeros(N, np.uint8)
src[:len(data)] = np.frombuffer(data, np.uint8)
S = jnp.asarray(src)
n = jnp.int32(len(data))

@functools.partial(jax.jit, static_argnames="n_rep")
def pipe(S, n, n_rep):
    def body(r, acc):
        pos, cands, lcps = find_matches_device(S + (r - r).astype(jnp.uint8),
                                               n, False)
        return (acc + jnp.sum(lcps) + jnp.sum(cands) + jnp.sum(pos))
    return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

f1 = lambda: float(pipe(S, n, n_rep=1))
f5 = lambda: float(pipe(S, n, n_rep=5))
t0 = time.time(); f1(); print(f"compile1 {time.time()-t0:.0f}s", flush=True)
f5()
t = time.time(); f1(); t1 = time.time() - t
t = time.time(); f5(); t5 = time.time() - t
per = (t5 - t1) / 4
print(f"match find: {per*1000:.1f} ms per 1MiB window "
      f"-> {len(data)/per/1e6:.0f} MB/s in-jit", flush=True)
