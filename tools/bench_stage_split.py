"""Per-stage in-jit timing for the entropy decode pipeline: table build,
literal kernel, LMD kernel, measured separately with fori_loop repetition."""
import os, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"
import pathlib, time, numpy as np, jax, jax.numpy as jnp, functools
import lzfse_rust_tpu.models.decoder as M
from lzfse_rust_tpu.ops.table_build import (build_decode_tables,
                                            build_decode_tables_v3)
from lzfse_rust_tpu.ops.pallas_decode import decode_literals_pallas, decode_lmds_pallas

files = sorted(pathlib.Path("/root/reference/data/snappy").glob("*.lzfse"))
srcs = [p.read_bytes() for p in files]
fse_blocks = []
parsed = [M._parse_container(s, i, fse_blocks) for i, s in enumerate(srcs)]
blocks = (fse_blocks * 8)[:256]
B = 256
total_raw = sum(d.block.n_raw_bytes for d in blocks)
total_lit = sum(d.block.literal.num for d in blocks)
total_lmd = sum(d.block.lmd.num for d in blocks)
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

lw_tot = M._w_bucket(max(len(d.lit_payload) for d in blocks))
mw_tot = M._w_bucket(max(len(d.lmd_payload) for d in blocks))
lit_words = np.zeros((B, lw_tot), np.int32); lit_words[:, :lw_tot-4] = litp.view("<i4")[:, :lw_tot-4]
lmd_words = np.zeros((B, mw_tot), np.int32); lmd_words[:, :mw_tot-4] = lmdp.view("<i4")[:, :mw_tot-4]
def vec(x):
    out = np.zeros((B,128), np.int32); out[:, :x.shape[1]] = x; return jnp.asarray(out)
def bc(x):
    return jnp.asarray(np.repeat(x[:,None],128,1).astype(np.int32))

perm_l = np.argsort(-((lit_num + 3) // 4), kind="stable").astype(np.int32)
perm_m = np.argsort(-lmd_num, kind="stable").astype(np.int32)
lit_words = lit_words[perm_l]; lmd_words = lmd_words[perm_m]

Wd = jnp.asarray(weights); LW = jnp.asarray(lit_words); MW = jnp.asarray(lmd_words)
LS = vec(lit_states[perm_l]); MS = vec(lmd_states[perm_m])
LP = bc(lit_pos[perm_l]); MP = bc(lmd_pos[perm_m])
LN = bc(lit_num[perm_l]); MN = bc(lmd_num[perm_m])
PL = jnp.asarray(perm_l); PM = jnp.asarray(perm_m)

# precompute tables once for the kernel-only stages
vp0, up0, tot0 = build_decode_tables_v3(Wd)
UP = jnp.take(up0, PL, axis=0); VP = jnp.take(vp0, PM, axis=0)
TOT = jnp.take(tot0, PL)
UP.block_until_ready()

@functools.partial(jax.jit, static_argnames="n_rep")
def tabs(Wd, n_rep):
    def body(r, acc):
        vp, vb, up = build_decode_tables(Wd + r - r)
        return acc + jnp.sum(up[:, :2]) + jnp.sum(vp[:, :2])
    return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

@functools.partial(jax.jit, static_argnames="n_rep")
def lits(UP, LW, LS, LP, LN, TOT, n_rep):
    def body(r, acc):
        o, fs, fp = decode_literals_pallas(UP, LW, LS, LP + r - r, LN, TOT,
                                           10000)
        return acc + jnp.sum(fs) + o[0, 0]
    return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

@functools.partial(jax.jit, static_argnames="n_rep")
def lmds(VP, MW, MS, MP, MN, n_rep):
    def body(r, acc):
        lm, dd, fs, fp = decode_lmds_pallas(VP, MW, MS, MP + r - r, MN,
                                            10000)
        return acc + jnp.sum(fs) + lm[0, 0] + dd[0, 0]
    return jax.lax.fori_loop(0, n_rep, body, jnp.int32(0))

def timeit(name, fn, args):
    t0 = time.time(); float(fn(*args, n_rep=1)); c1 = time.time()-t0
    float(fn(*args, n_rep=5))
    t=time.time(); float(fn(*args, n_rep=1)); t1=time.time()-t
    t=time.time(); float(fn(*args, n_rep=5)); t5=time.time()-t
    per = (t5-t1)/4
    print(f"{name:12s} {per*1000:7.2f} ms/pass  (compile {c1:.0f}s)", flush=True)
    return per

print(f"B={B} raw={total_raw} lit_syms={total_lit} lmd_syms={total_lmd}", flush=True)
pt = timeit("tables", tabs, (Wd,))
plt_ = timeit("literals", lits, (UP, LW, LS, LP, LN, TOT))
pm = timeit("lmds", lmds, (VP, MW, MS, MP, MN))
tot = pt + plt_ + pm
print(f"total {tot*1000:.1f} ms -> {total_raw/tot/1e9:.2f} GB/s")
print(f"  lit kernel:  {total_lit/plt_/1e6:.0f} Msym/s ({total_lit/256/64:.0f} avg steps/blk/4)")
print(f"  lmd kernel:  {total_lmd/pm/1e6:.0f} Msym/s")
