"""Step-exact microbenchmark of the literal decode kernel's inner step.

Replicates the sectioned literal step's op mix (64 lookup gathers + 32
extract gathers + rolls + arith per step, serving 256 literals) in
isolation, plus variants, to decide whether the kernel is latency-bound
(fix: independent-roll trees, more blocks in flight) or throughput-bound
(fix: fewer gathers). In-jit repetition timing per CLAUDE.md.
"""
import os, sys, pathlib, time, functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8          # sections per row
N_CHUNKS = 8   # 1024-state table chunks


def timed(name, make_kernel, n_steps, n_vregs=1, tab_words=1024):
    def kernel(tab_ref, chunk_ref, x_ref, out_ref, *, n_steps):
        body = make_kernel(tab_ref, chunk_ref)
        xs = [x_ref[pl.ds(8 * v, 8), :] for v in range(n_vregs)]

        def step(i, xs):
            return tuple(body(x, i) for x in xs)

        res = jax.lax.fori_loop(0, n_steps, step, tuple(xs))
        for v in range(n_vregs):
            out_ref[pl.ds(8 * v, 8), :] = res[v]

    @functools.partial(jax.jit, static_argnames="n")
    def go(tab, chunk, x, n):
        return pl.pallas_call(
            functools.partial(kernel, n_steps=n),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8 * n_vregs, 128), jnp.int32),
        )(tab, chunk, x)

    tab = jnp.asarray(
        np.random.randint(0, 1024, (8, G * tab_words), np.int32))
    chunk = jnp.asarray(np.random.randint(0, 2**31 - 1, (8, G * 256),
                                          np.int32))
    x = jnp.asarray(np.random.randint(0, 128, (8 * n_vregs, 128), np.int32))
    lo = n_steps // 8
    f_lo = lambda: np.asarray(go(tab, chunk, x, lo)).sum()
    f_hi = lambda: np.asarray(go(tab, chunk, x, n_steps)).sum()
    t0 = time.time(); f_lo(); f_hi(); c = time.time() - t0
    t0 = time.time(); f_lo(); t_lo = time.time() - t0
    t0 = time.time(); f_hi(); t_hi = time.time() - t0
    per = (t_hi - t_lo) / (n_steps - lo)
    lits = 256 * n_vregs
    print(f"{name:34s} {per*1e9:8.1f} ns/step  "
          f"{lits/per/1e9:6.2f} GB/s-lit  (compile {c:.0f}s)", flush=True)


def lane_ids():
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    glane = lane & 15
    sec_id = lane >> 4
    return lane, glane, sec_id


def lookup_sec(tab, state, sec_id, n_states=1024):
    lo = state & 127
    hi = (state >> 7) & (N_CHUNKS - 1)
    masks = [hi == c for c in range(1, N_CHUNKS)]
    e = None
    for g in range(G):
        eg = None
        for c in range(N_CHUNKS):
            o = g * n_states + c * 128
            gv = jnp.take_along_axis(tab[:, o:o + 128], lo, axis=1)
            eg = gv if eg is None else jnp.where(masks[c - 1], gv, eg)
        e = eg if e is None else jnp.where(sec_id == g, eg, e)
    return e


def chunk_word(chunk, widx, sec_id):
    lo = widx & 127
    half = widx < 128
    w = None
    for g in range(G):
        ga = jnp.take_along_axis(chunk[:, g * 256:g * 256 + 128], lo, axis=1)
        gb = jnp.take_along_axis(chunk[:, g * 256 + 128:g * 256 + 256], lo,
                                 axis=1)
        wg = jnp.where(half, ga, gb)
        w = wg if w is None else jnp.where(sec_id == g, wg, w)
    return w


def masked_roll(x, s, glane):
    return jnp.where(glane >= s, pltpu.roll(x, s, 1), 0)


def current_step(tab_ref, chunk_ref):
    """Mirror of the committed kernel's one_step (maskless path)."""
    _, glane, sec_id = lane_ids()
    tab = tab_ref[:, :]
    chunk = chunk_ref[:, :]

    def body(s, i):
        ent = lookup_sec(tab, s & 1023, sec_id)
        k = jnp.where(glane < 4, ent & 15, 0)
        ksum = k + masked_roll(k, 1, glane)
        ksum = ksum + masked_roll(ksum, 2, glane)
        widx = (ksum + i) & 254
        wlo = chunk_word(chunk, widx, sec_id).astype(jnp.uint32)
        whi = chunk_word(chunk, widx + 1, sec_id).astype(jnp.uint32)
        sh = (ksum & 31).astype(jnp.uint32)
        val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      whi << (jnp.uint32(32) - sh))
        bits = (val & 1023).astype(jnp.int32)
        t = jnp.where(glane == 3, ksum, 0)
        t = t + pltpu.roll(t, 127, 1)
        t = t + pltpu.roll(t, 126, 1)
        return (bits + (ent >> 12) + t) & 1023

    return body


def indep_roll_step(tab_ref, chunk_ref):
    """Variant: independent-roll prefix + fused bidirectional total."""
    _, glane, sec_id = lane_ids()
    tab = tab_ref[:, :]
    chunk = chunk_ref[:, :]

    def body(s, i):
        ent = lookup_sec(tab, s & 1023, sec_id)
        k = jnp.where(glane < 4, ent & 15, 0)
        f1 = masked_roll(k, 1, glane)
        f2 = masked_roll(k, 2, glane)
        f3 = masked_roll(k, 3, glane)
        b1 = jnp.where(glane < 3, pltpu.roll(k, 127, 1), 0)
        b2 = jnp.where(glane < 2, pltpu.roll(k, 126, 1), 0)
        b3 = jnp.where(glane < 1, pltpu.roll(k, 125, 1), 0)
        ksum = k + f1 + (f2 + f3)
        t = ksum + b1 + (b2 + b3)
        widx = (ksum + i) & 254
        wlo = chunk_word(chunk, widx, sec_id).astype(jnp.uint32)
        whi = chunk_word(chunk, widx + 1, sec_id).astype(jnp.uint32)
        sh = (ksum & 31).astype(jnp.uint32)
        val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      whi << (jnp.uint32(32) - sh))
        bits = (val & 1023).astype(jnp.int32)
        return (bits + (ent >> 12) + t) & 1023

    return body


def gathers_only(tab_ref, chunk_ref):
    """Issue floor: the 96 gathers with minimal dependencies."""
    _, glane, sec_id = lane_ids()
    tab = tab_ref[:, :]
    chunk = chunk_ref[:, :]

    def body(s, i):
        lo = s & 127
        acc = s
        for g in range(G):
            for c in range(N_CHUNKS):
                o = g * 1024 + c * 128
                acc = acc + jnp.take_along_axis(tab[:, o:o + 128], lo, axis=1)
        for g in range(G):
            for c in range(4):
                o = g * 256 + (c % 2) * 128
                acc = acc + jnp.take_along_axis(chunk[:, o:o + 128], lo,
                                                axis=1)
        return acc & 1023

    return body


def lookup_only(tab_ref, chunk_ref):
    """Dependent lookup chain alone (64 gathers + merge selects)."""
    _, glane, sec_id = lane_ids()
    tab = tab_ref[:, :]

    def body(s, i):
        ent = lookup_sec(tab, s & 1023, sec_id)
        return (s + ent) & 1023

    return body


def split_lookup(tab, state, sec_id, glane):
    """kd halfword-packed (4 chunks) + sym byte-packed (2 chunks):
    48 gathers instead of 64."""
    kd_i = state >> 1
    kd_lo = kd_i & 127
    kd_hi = kd_i >> 7            # 0..3
    kd_masks = [kd_hi == c for c in range(1, 4)]
    sy_i = state >> 2
    sy_lo = sy_i & 127
    sy_hi = sy_i >> 7            # 0..1
    kd = None
    sy = None
    for g in range(G):
        eg = None
        for c in range(4):
            o = g * 1024 + c * 128
            gv = jnp.take_along_axis(tab[:, o:o + 128], kd_lo, axis=1)
            eg = gv if eg is None else jnp.where(kd_masks[c - 1], gv, eg)
        kd = eg if kd is None else jnp.where(sec_id == g, eg, kd)
        sa = jnp.take_along_axis(tab[:, g * 1024 + 512:g * 1024 + 640],
                                 sy_lo, axis=1)
        sb = jnp.take_along_axis(tab[:, g * 1024 + 640:g * 1024 + 768],
                                 sy_lo, axis=1)
        sg = jnp.where(sy_hi == 0, sa, sb)
        sy = sg if sy is None else jnp.where(sec_id == g, sg, sy)
    kdv = (kd.astype(jnp.uint32)
           >> ((state & 1) << 4).astype(jnp.uint32)).astype(jnp.int32)
    k = kdv & 15
    delta = (kdv >> 4) & 1023
    sym = (sy.astype(jnp.uint32)
           >> ((state & 3) << 3).astype(jnp.uint32)).astype(jnp.int32) & 255
    return k, delta, sym


def chunk_word_128(chunk, widx, sec_id):
    """Compact 128-word window: one gather per section."""
    w = None
    for g in range(G):
        gv = jnp.take_along_axis(chunk[:, g * 256:g * 256 + 128],
                                 widx & 127, axis=1)
        w = gv if w is None else jnp.where(sec_id == g, gv, w)
    return w


def fast_step(tab_ref, chunk_ref):
    """Split lookup (48) + compact window (16) + indep rolls = 64 gathers."""
    _, glane, sec_id = lane_ids()
    tab = tab_ref[:, :]
    chunk = chunk_ref[:, :]

    def body(s, i):
        k, delta, sym = split_lookup(tab, s & 1023, sec_id, glane)
        k = jnp.where(glane < 4, k, 0)
        f1 = masked_roll(k, 1, glane)
        f2 = masked_roll(k, 2, glane)
        f3 = masked_roll(k, 3, glane)
        b1 = jnp.where(glane < 3, pltpu.roll(k, 127, 1), 0)
        b2 = jnp.where(glane < 2, pltpu.roll(k, 126, 1), 0)
        b3 = jnp.where(glane < 1, pltpu.roll(k, 125, 1), 0)
        ksum = k + f1 + (f2 + f3)
        t = ksum + b1 + (b2 + b3)
        widx = (ksum + i) & 126
        wlo = chunk_word_128(chunk, widx, sec_id).astype(jnp.uint32)
        whi = chunk_word_128(chunk, widx + 1, sec_id).astype(jnp.uint32)
        sh = (ksum & 31).astype(jnp.uint32)
        val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      whi << (jnp.uint32(32) - sh))
        bits = (val & 1023).astype(jnp.int32)
        return (bits + delta + t + sym) & 1023

    return body


def fast_step_nosplit(tab_ref, chunk_ref):
    """Full-entry lookup (64) + compact window (16) + indep rolls."""
    _, glane, sec_id = lane_ids()
    tab = tab_ref[:, :]
    chunk = chunk_ref[:, :]

    def body(s, i):
        ent = lookup_sec(tab, s & 1023, sec_id)
        k = jnp.where(glane < 4, ent & 15, 0)
        f1 = masked_roll(k, 1, glane)
        f2 = masked_roll(k, 2, glane)
        f3 = masked_roll(k, 3, glane)
        b1 = jnp.where(glane < 3, pltpu.roll(k, 127, 1), 0)
        b2 = jnp.where(glane < 2, pltpu.roll(k, 126, 1), 0)
        b3 = jnp.where(glane < 1, pltpu.roll(k, 125, 1), 0)
        ksum = k + f1 + (f2 + f3)
        t = ksum + b1 + (b2 + b3)
        widx = (ksum + i) & 126
        wlo = chunk_word_128(chunk, widx, sec_id).astype(jnp.uint32)
        whi = chunk_word_128(chunk, widx + 1, sec_id).astype(jnp.uint32)
        sh = (ksum & 31).astype(jnp.uint32)
        val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      whi << (jnp.uint32(32) - sh))
        bits = (val & 1023).astype(jnp.int32)
        return (bits + (ent >> 12) + t) & 1023

    return body


def lookup_chunks(tab, state, sec_id, n_chunks, tab_words):
    """Chunked gather into a tab_words-per-section table: Mosaic's gather
    primitive reaches 128 lanes, so a T-word table costs ceil(T/128) issued
    tile-gathers + a select merge — the scaling law the multi-symbol
    (state, peek) feasibility note rests on."""
    lo = state & 127
    hi = (state >> 7) & (n_chunks - 1)
    masks = [hi == c for c in range(1, n_chunks)]
    e = None
    for g in range(G):
        eg = None
        for c in range(n_chunks):
            o = g * tab_words + c * 128
            gv = jnp.take_along_axis(tab[:, o:o + 128], lo, axis=1)
            eg = gv if eg is None else jnp.where(masks[c - 1], gv, eg)
        e = eg if e is None else jnp.where(sec_id == g, eg, e)
    return e


def lookup_only_n(n_chunks):
    """Lookup chain alone at n_chunks 128-word chunks per section."""
    def make(tab_ref, chunk_ref):
        _, glane, sec_id = lane_ids()
        tab = tab_ref[:, :]
        tw = n_chunks * 128

        def body(s, i):
            ent = lookup_chunks(tab, s & (tw - 1), sec_id, n_chunks, tw)
            return (s + ent) & 1023

        return body
    return make


def pair_step_64(tab_ref, chunk_ref):
    """Most charitable multi-symbol variant: per-state full-word pre-gather
    (8 chunks: k1, base into the pair table) + a 64-chunk (8192-entry,
    top-8-hot-symbol scale) pair-table gather + one word-funnel extract,
    emitting 2 symbols per lane step (8 literals/section-step). The real
    (state, peek) table needs 1024 * n_syms entries (tANS coverage: each
    symbol's states' [delta, delta + 2^k) intervals partition the state
    space), i.e. 640+ chunks for text — this measures the 10x-smaller
    hot-set restriction and still loses."""
    _, glane, sec_id = lane_ids()
    tab = tab_ref[:, :]
    chunk = chunk_ref[:, :]
    tw = 9216  # 1024 per-state words + 8192 pair entries per section

    def body(s, i):
        # pre-gather: per-state entry (k1, pair base) — 8 chunks
        ent = lookup_chunks(tab, s & 1023, sec_id, 8, tw)
        k1 = ent & 15
        base = (ent >> 4) & 8191
        # peek k1 bits via the compacted window funnel
        ksum = k1 + masked_roll(k1, 1, glane)
        ksum = ksum + masked_roll(ksum, 2, glane)
        widx = (ksum + i) & 126
        wlo = chunk_word_128(chunk, widx, sec_id).astype(jnp.uint32)
        whi = chunk_word_128(chunk, widx + 1, sec_id).astype(jnp.uint32)
        sh = (ksum & 31).astype(jnp.uint32)
        val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                      whi << (jnp.uint32(32) - sh))
        b1 = (val & ((jnp.uint32(1) << k1.astype(jnp.uint32)) - 1)
              ).astype(jnp.int32)
        # pair-table gather: 64 chunks offset past the per-state words
        pair = lookup_chunks(tab[:, :], (1024 + base + b1) & (tw - 1),
                             sec_id, 64, tw)
        sym2 = (pair >> 8) & 255
        k2 = (pair >> 16) & 15
        delta2 = (pair >> 20) & 1023
        # second pull for state''
        widx2 = (ksum + k2 + i) & 126
        w2 = chunk_word_128(chunk, widx2, sec_id).astype(jnp.uint32)
        b2 = (w2 & ((jnp.uint32(1) << k2.astype(jnp.uint32)) - 1)
              ).astype(jnp.int32)
        return (b2 + delta2 + sym2 + (pair & 255)) & 1023

    return body


def main_multisym():
    """Round-5 multi-symbol feasibility anchors (FEASIBILITY_MULTISYM.md):
    lookup cost vs table size, and the charitable hot-set pair step."""
    timed("lookup 8ch (1024w, baseline)", lookup_only_n(8), 20_000)
    timed("lookup 16ch (2048w)", lookup_only_n(16), 20_000,
          tab_words=2048)
    timed("lookup 32ch (4096w)", lookup_only_n(32), 10_000,
          tab_words=4096)
    timed("pair step 64ch (8 lit/step)", pair_step_64, 10_000,
          tab_words=9216)


def main():
    if "--multisym" in sys.argv:
        return main_multisym()
    timed("current step (1 vreg)", current_step, 20_000)
    timed("indep-roll step (1 vreg)", indep_roll_step, 20_000)
    timed("current step (2 vregs)", current_step, 20_000, n_vregs=2)
    timed("indep-roll step (2 vregs)", indep_roll_step, 20_000, n_vregs=2)
    timed("96 gathers issue floor", gathers_only, 20_000)
    timed("lookup_sec only", lookup_only, 20_000)
    timed("fast step 64g (1 vreg)", fast_step, 20_000)
    timed("fast step 64g (2 vregs)", fast_step, 20_000, n_vregs=2)
    timed("fast nosplit 80g (1 vreg)", fast_step_nosplit, 20_000)


if __name__ == "__main__":
    main()
