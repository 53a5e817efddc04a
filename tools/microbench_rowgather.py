"""Row-gather cost vs row layout (r5 match-finder hot-spot isolation).

jnp.take(arr2d, idx, axis=0) with 1M random indices, for candidate wf
layouts: (N,64)u8, (N,16)i32, (N,32)i32, (N,128)i32. Also times the
_windows_fwd build and the full _grouped_core, so the 68ms/window grouped
probe decomposes. In-jit repetition with a REAL data dependency between
iterations (acc-conditioned index perturbation that XLA cannot fold, but
is zero at runtime) — the `X + r - r` trick is structurally foldable.
"""
import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20


def dep(acc):
    """Data-dependent perturbation, provably-unfoldable, runtime zero."""
    return jnp.where(acc == jnp.int32(-123456789), jnp.int32(1),
                     jnp.int32(0))


def timed(name, build, args, n_hi=5):
    @functools.partial(jax.jit, static_argnames="n_rep")
    def pipe(*a, n_rep):
        def body(r, acc):
            return acc + build(*a, dep(acc))
        return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

    f1 = lambda: float(pipe(*args, n_rep=1))
    fh = lambda: float(pipe(*args, n_rep=n_hi))
    t0 = time.time(); f1(); fh(); c = time.time() - t0
    t0 = time.time(); f1(); t1 = time.time() - t0
    t0 = time.time(); fh(); th = time.time() - t0
    per = (th - t1) / (n_hi - 1)
    print(f"{name:34s} {per*1000:8.2f} ms  (t1 {t1*1000:.0f} th "
          f"{th*1000:.0f}, compile {c:.0f}s)", flush=True)
    return per


def main():
    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

    for name, arr in (
        ("take (1M,64)u8", jnp.asarray(rng.integers(0, 255, (N, 64),
                                                    dtype=np.uint8))),
        ("take (1M,16)i32", jnp.asarray(rng.integers(0, 2**31 - 1, (N, 16),
                                                     dtype=np.int32))),
        ("take (1M,32)i32", jnp.asarray(rng.integers(0, 2**31 - 1, (N, 32),
                                                     dtype=np.int32))),
        ("take (1M,128)i32", jnp.asarray(rng.integers(0, 2**31 - 1,
                                                      (N, 128),
                                                      dtype=np.int32))),
    ):
        timed(name, lambda a, i, p: jnp.sum(
            jnp.take(a, i + p, axis=0), dtype=jnp.int32), (arr, idx))

    # wf build alone, and the current grouped core end-to-end
    from lzfse_rust_tpu.ops.match_find_tpu import (_grouped_core,
                                                   _windows_fwd)
    src = jnp.asarray(rng.integers(0, 255, N, dtype=np.uint8))
    timed("_windows_fwd build", lambda s, i, p: jnp.sum(
        _windows_fwd(s + p.astype(jnp.uint8)).astype(jnp.int32)
        [:8], dtype=jnp.int32), (src, idx))

    from lzfse_rust_tpu.runtime import native
    order, ok = native.match_group(np.asarray(src), N - 128, False)
    O = jnp.asarray(order)
    K = jnp.asarray(ok)

    def core(s, o, k, p):
        pos, cands, lcps = _grouped_core(s + p.astype(jnp.uint8),
                                         jnp.int32(N - 128), o + p, k)
        return (jnp.sum(pos, dtype=jnp.int32)
                + jnp.sum(cands, dtype=jnp.int32)
                + jnp.sum(lcps, dtype=jnp.int32))

    timed("_grouped_core full", core, (src, O, K), n_hi=3)


if __name__ == "__main__":
    main()
