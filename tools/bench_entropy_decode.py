import os, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"
import pathlib, time, numpy as np, jax, jax.numpy as jnp, functools
import lzfse_rust_tpu.models.decoder as M
from lzfse_rust_tpu.ops.table_build import build_decode_tables_v3
from lzfse_rust_tpu.ops.pallas_decode import decode_literals_pallas, decode_lmds_pallas

files = sorted(pathlib.Path("/root/reference/data/snappy").glob("*.lzfse"))
srcs = [p.read_bytes() for p in files]
fse_blocks = []
parsed = [M._parse_container(s, i, fse_blocks) for i, s in enumerate(srcs)]
blocks = (fse_blocks * 8)[:256]
B = 256
total_raw = sum(d.block.n_raw_bytes for d in blocks)
weights = np.stack([d.weights for d in blocks]).astype(np.int32)
litp = np.zeros((B, M.LIT_PAYLOAD_PAD), dtype=np.uint8)
lmdp = np.zeros((B, M.LMD_PAYLOAD_PAD), dtype=np.uint8)
lit_pos = np.zeros(B, np.int32); lmd_pos = np.zeros(B, np.int32)
lit_states = np.zeros((B,4), np.int32); lmd_states = np.zeros((B,3), np.int32)
lit_num = np.zeros(B, np.int32); lmd_num = np.zeros(B, np.int32)
for i, d in enumerate(blocks):
    lp, mp = d.lit_payload, d.lmd_payload
    litp[i,:len(lp)] = np.frombuffer(lp, np.uint8); lmdp[i,:len(mp)] = np.frombuffer(mp, np.uint8)
    lit_pos[i] = len(lp)*8 - d.block.literal.bits; lmd_pos[i] = len(mp)*8 - d.block.lmd.bits
    lit_states[i] = d.block.literal.state
    ls = d.block.lmd.state; lmd_states[i] = (ls[0], ls[1]+64, ls[2]+128)
    lit_num[i] = d.block.literal.num; lmd_num[i] = d.block.lmd.num

lw_tot = M._round_up(M.LIT_PAYLOAD_PAD//4+4, 128)
mw_tot = M._round_up(M.LMD_PAYLOAD_PAD//4+4, 128)
lit_words = np.zeros((B, lw_tot), np.int32); lit_words[:, :M.LIT_PAYLOAD_PAD//4] = litp.view("<i4")
lmd_words = np.zeros((B, mw_tot), np.int32); lmd_words[:, :M.LMD_PAYLOAD_PAD//4] = lmdp.view("<i4")
def vec(x):
    out = np.zeros((B,128), np.int32); out[:, :x.shape[1]] = x; return jnp.asarray(out)
def bc(x):
    return jnp.asarray(np.repeat(x[:,None],128,1).astype(np.int32))

# sort blocks by per-kernel step count (mirrors TpuDecoder.decode_many) so
# the dynamic per-group superepoch counts see homogeneous groups
perm_l = np.argsort(-((lit_num + 3) // 4), kind="stable").astype(np.int32)
perm_m = np.argsort(-lmd_num, kind="stable").astype(np.int32)
lit_words = lit_words[perm_l]; lmd_words = lmd_words[perm_m]

Wd = jnp.asarray(weights); LW = jnp.asarray(lit_words); MW = jnp.asarray(lmd_words)
LS = vec(lit_states[perm_l]); MS = vec(lmd_states[perm_m])
LP = bc(lit_pos[perm_l]); MP = bc(lmd_pos[perm_m])
LN = bc(lit_num[perm_l]); MN = bc(lmd_num[perm_m])
PL = jnp.asarray(perm_l); PM = jnp.asarray(perm_m)

@functools.partial(jax.jit, static_argnames="n_rep")
def pipe(Wd, LW, MW, LS, MS, LP, MP, LN, MN, PL, PM, n_rep):
    def body(r, acc):
        vp, u3, tot = build_decode_tables_v3(Wd + r - r)
        lits, lfs, lfp = decode_literals_pallas(
            jnp.take(u3, PL, axis=0), LW, LS, LP + r - r, LN,
            jnp.take(tot, PL), 10000)
        lm, dd, mfs, mfp = decode_lmds_pallas(
            jnp.take(vp, PM, axis=0), MW, MS, MP + r - r, MN, 10000)
        return acc + jnp.sum(lfs) + jnp.sum(mfs) + lits[0,0] + lm[0,0] + dd[0,0]
    return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

args = (Wd, LW, MW, LS, MS, LP, MP, LN, MN, PL, PM)
t0 = time.time()
f1 = lambda: float(pipe(*args, n_rep=1))
f5 = lambda: float(pipe(*args, n_rep=5))
f1(); print(f"compile1 {time.time()-t0:.0f}s", flush=True)
t0=time.time(); f5(); print(f"compile5 {time.time()-t0:.0f}s", flush=True)
t=time.time(); f1(); t1=time.time()-t
t=time.time(); f5(); t5=time.time()-t
per = (t5-t1)/4
print(f"pallas entropy decode: {per*1000:.1f}ms per {B}-block pass ({total_raw} raw bytes)")
print(f"  -> {total_raw/per/1e9:.2f} GB/s entropy-decode per chip")
