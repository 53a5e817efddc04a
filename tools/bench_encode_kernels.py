"""In-jit throughput of the Pallas tANS ENCODE kernels (hot loop 2) over
the corpus blocks, measured like the decode kernels."""
import os, sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
import lzfse_rust_tpu.models.decoder as M
import lzfse_rust_tpu.ops.pallas_encode as PE
from lzfse_rust_tpu.ops.fse_encode import build_encode_tables
from lzfse_rust_tpu.spec import weights as W

# real block contents: decode the corpus FSE blocks' rows/literals via the
# native-backed TpuDecoder internals (host-side spec decode is fine here)
from lzfse_rust_tpu.spec import fse as F
from lzfse_rust_tpu.spec import tables as T

fse = []
for p in sorted(pathlib.Path("/root/reference/data/snappy").glob("*.lzfse")):
    M._parse_container(p.read_bytes(), 0, fse)
fse = (fse * 8)[:256]
B = 256
n_cols = 10112
wts = np.zeros((B, 360), np.int64)
litw = np.zeros((B, n_cols * 4), np.uint8)
lmv = np.zeros((B, n_cols), np.int32)
dv = np.zeros((B, n_cols), np.int32)
lit_num = np.zeros(B, np.int32)
lmd_num = np.zeros(B, np.int32)
total_raw = 0
for i, d in enumerate(fse):
    tabs = T.DecoderTables(d.weights)
    lits = np.asarray(F.decode_literals(d.lit_payload, tabs, d.block.literal),
                      np.uint8)
    rows = np.asarray(F.decode_lmds(d.lmd_payload, tabs, d.block.lmd))
    wts[i] = d.weights
    n_lit = len(lits)
    pad = (-n_lit) % 4
    g = (n_lit + pad) // 4
    start = n_cols * 4 - g * 4
    litw[i, start:start + n_lit] = lits
    if pad:
        litw[i, start + n_lit:start + n_lit + pad] = lits[0] if n_lit else 0
    lit_num[i] = n_lit + pad
    nr = len(rows)
    lmv[i, n_cols - nr:] = rows[:, 0] | (rows[:, 1] << 16)
    dv[i, n_cols - nr:] = rows[:, 2]
    lmd_num[i] = nr
    total_raw += d.block.n_raw_bytes

perm_l = np.argsort(-lit_num, kind="stable").astype(np.int32)
perm_m = np.argsort(-lmd_num, kind="stable").astype(np.int32)
e_l, e_m, e_d, e_u = build_encode_tables(jnp.asarray(wts))
bc = lambda x: jnp.asarray(np.repeat(x[:, None], 128, 1).astype(np.int32))
EU = jnp.take(e_u, jnp.asarray(perm_l), axis=0)
WD = jnp.asarray(litw.view("<i4")[perm_l])
LN = bc(lit_num[perm_l])
EL = jnp.take(e_l, jnp.asarray(perm_m), axis=0)
EM = jnp.take(e_m, jnp.asarray(perm_m), axis=0)
ED = jnp.take(e_d, jnp.asarray(perm_m), axis=0)
LM = jnp.asarray(lmv[perm_m])
DV = jnp.asarray(dv[perm_m])
MN = bc(lmd_num[perm_m])

@functools.partial(jax.jit, static_argnames="n_rep")
def pipe(EU, WD, LN, EL, EM, ED, LM, DV, MN, n_rep):
    def body(r, acc):
        glo, gme, lfs = PE.encode_literals_pallas(EU + r - r, WD, LN, 10112)
        mlo, mme, mfs = PE.encode_lmds_pallas(EL + r - r, EM, ED, LM, DV, MN,
                                              10112)
        return (acc + jnp.sum(lfs) + jnp.sum(mfs) + glo[0, 0] + gme[0, 0]
                + mlo[0, 0] + mme[0, 0])
    return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

args = (EU, WD, LN, EL, EM, ED, LM, DV, MN)
f1 = lambda: float(pipe(*args, n_rep=1))
f5 = lambda: float(pipe(*args, n_rep=5))
t0 = time.time(); f1(); print(f"compile {time.time()-t0:.0f}s", flush=True)
f5()
t = time.time(); f1(); t1 = time.time() - t
t = time.time(); f5(); t5 = time.time() - t
per = (t5 - t1) / 4
print(f"encode kernels: {per*1000:.1f} ms per {B}-block pass "
      f"({total_raw} raw bytes) -> {total_raw/per/1e9:.2f} GB/s", flush=True)
