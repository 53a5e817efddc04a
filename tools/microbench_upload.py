"""Staged-upload thread scaling (decode prep_upload, the corpus batch's
dominant prep cost at ~13ms/29MB). Times jnp.asarray of the real payload
cat split into k row-slices across k worker threads, k in 1/2/4/6/8.
2nd-smallest of 5 per k (shared-VM noise policy)."""
import concurrent.futures as cf
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np

SNAPPY = pathlib.Path("/root/reference/data/snappy")
REPS = 24

cat = (b"".join(p.read_bytes() for p in sorted(SNAPPY.glob("*.lzfse")))
       * REPS)
n = len(cat) // 512 * 512
stage = np.frombuffer(cat[:n], np.uint8).view(np.int32).reshape(-1, 128)
print(f"payload cat: {stage.nbytes / 1e6:.1f} MB", flush=True)

for k in (1, 2, 4, 6, 8):
    rows = stage.shape[0] // k
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        if k == 1:
            parts = [jnp.asarray(stage)]
        else:
            with cf.ThreadPoolExecutor(k) as ex:
                parts = list(ex.map(
                    lambda i: jnp.asarray(
                        stage[i * rows:(i + 1) * rows if i < k - 1
                              else stage.shape[0]]), range(k)))
        times.append(time.perf_counter() - t0)
        del parts
    t = sorted(times)[1]
    print(f"k={k}: {t*1000:7.2f} ms  {stage.nbytes/t/1e9:5.2f} GB/s",
          flush=True)
