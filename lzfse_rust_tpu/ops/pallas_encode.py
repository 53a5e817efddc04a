"""Pallas TPU kernels for batched tANS stream ENCODE — hot loop 2.

The reference's encode hot loop (src/fse/literals.rs:93-133, lmds.rs:62-93)
evolves per-stream states backwards over the symbol list, pushing
(bits, n_bits) pairs forward into the payload. Device design (mirroring
ops/pallas_decode.py):

  - one block per sublane row; its 4 (literals) / 3 (LMD) states occupy
    lanes 0..3 / 0..2
  - symbol streams are RIGHT-JUSTIFIED in the column axis so the reverse
    traversal visits the same column for every row at every step — the
    input tile slides by aligned 128-column windows (no per-row slices)
  - E-table lookups are within-tile gathers; the three LMD tables (L 20,
    M 20, D 64 entries) share ONE 128-lane tile, indexed by sym + a
    per-lane class offset (0/32/64), so each lookup is a single gather
  - each step's pushes are combined into one group value (<= 40 bits for
    a 4-literal group, <= 54 for an LMD row) via suffix-shift roll trees,
    emitted as (lo32, hi|n<<shift) packed pairs through the same
    roll-deposit accumulator + flipped aligned stores the decode kernels
    use. Bit-packing the group stream into payload bytes is a short
    vectorized host pass (ops/fse_encode.pack_group_stream).

Outputs are validated byte-identical to the spec encoder (interpret-mode
test in tests/test_pallas_kernels.py; hardware corpus identity via
tools/test_tpu_encoder_corpus.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..base import constants as C

SUPER = 128  # steps per aligned input load / output store


def _neg_roll(x, shift):
    return pltpu.roll(x, 128 - shift, 1)


def _take_col(tile, col):
    """Broadcast column `col` (0..127) of a (R, 128) tile to all lanes."""
    idx = jnp.full(tile.shape, col, jnp.int32)
    return jnp.take_along_axis(tile, idx, axis=1)


def _lane_sum4(x):
    """lane0 := x0+x1+x2+x3 (other lanes junk)."""
    a = x + _neg_roll(x, 1)
    return a + _neg_roll(a, 2)


def _e_decode(e, s, active):
    """Packed E entry -> (n_bits, bits, s')."""
    t_k = (e & 0x7FFF) - 2048
    t_w = e >> 15
    # clip guards the masked junk lanes (their entries are garbage but
    # their outputs are zeroed); valid entries give 0 <= n_b <= 11
    n_b = jnp.clip((t_k + s) >> 10, 0, 25)
    bits = s & ((jnp.int32(1) << n_b) - 1)
    s_new = jnp.where(active, t_w + (s >> n_b), s)
    return n_b, bits, s_new


def _group_pack(bits, n, lane, width):
    """Combine `width` lanes' pushes (lane width-1 first) into one value.

    Returns (glo, ghi, n_tot) valid at lane 0: value = sum bits_l << sh_l
    with sh_l = sum_{l' > l} n_{l'}; total <= 54 bits so the high part
    fits 22 bits."""
    nm = jnp.where(lane < width, n, 0)
    sh = _neg_roll(nm, 1) + _neg_roll(nm, 2)
    if width == 4:
        sh = sh + _neg_roll(nm, 3)
    bu = bits.astype(jnp.uint32)
    # a lane's contribution sits at bit range [sh, sh+n); sh can exceed 32
    # (an LMD row's last pair starts as high as bit 40), so split into the
    # lo/hi words with all shift amounts clamped into defined range
    sh_lo = jnp.clip(sh, 0, 31).astype(jnp.uint32)
    sh_hi = jnp.clip(sh - 32, 0, 31).astype(jnp.uint32)
    sh_dn = jnp.clip(32 - sh, 1, 31).astype(jnp.uint32)
    in_lo = (lane < width) & (sh < 32)
    lo = jnp.where(in_lo, (bu << sh_lo).astype(jnp.int32), 0)
    hi = jnp.where(in_lo & (sh > 0), (bu >> sh_dn).astype(jnp.int32),
                   jnp.where((lane < width) & (sh >= 32),
                             (bu << sh_hi).astype(jnp.int32), 0))
    glo = _lane_sum4(lo)
    ghi = _lane_sum4(hi)
    n_tot = _lane_sum4(nm)
    # carries: lo parts can overflow 32 bits when summed? No — the lo
    # contributions occupy disjoint bit ranges below 32 by construction
    # (positions sh_l .. sh_l + n_l are disjoint), so OR == ADD, no carry.
    return glo, ghi, n_tot


def _literal_encode_kernel(ns_ref, e_tab_ref, words_ref, num_ref,
                           out_lo_ref, out_meta_ref, fs_ref,
                           *, r_rows, n_cols):
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_rows, 128), 1)
    byte_sh = (lane & 3) * 8
    num = num_ref[:, :]
    groups = (num + 3) >> 2
    zero = jnp.zeros((r_rows, 128), jnp.int32)
    s0 = jnp.full((r_rows, 128), C.U_STATES, jnp.int32)

    def superepoch(se, s):
        base = pl.multiple_of(n_cols - (se + 1) * SUPER, SUPER)
        tile = words_ref[:, pl.ds(base, SUPER)]
        acc_lo = zero
        acc_meta = zero

        def one(j, carry):
            s, acc_lo, acc_meta = carry
            gstep = se * SUPER + j
            active = gstep < groups
            w = _take_col(tile, 127 - j)
            sym = (w >> byte_sh) & 255
            lo = sym & 127
            g0 = jnp.take_along_axis(e_tab_ref[:, :128], lo, axis=1)
            g1 = jnp.take_along_axis(e_tab_ref[:, 128:], lo, axis=1)
            e = jnp.where(sym < 128, g0, g1)
            n_b, bits, s = _e_decode(e, s, active)
            n_b = jnp.where((lane < 4) & active, n_b, 0)
            bits = jnp.where((lane < 4) & active, bits, 0)
            glo, ghi, n_tot = _group_pack(bits, n_b, lane, 4)
            meta = ghi | (n_tot << 8)
            acc_lo = jnp.where(lane == 0, glo, pltpu.roll(acc_lo, 1, 1))
            acc_meta = jnp.where(lane == 0, meta, pltpu.roll(acc_meta, 1, 1))
            return (s, acc_lo, acc_meta)

        def step(i, carry):
            carry = one(i * 2, carry)
            return one(i * 2 + 1, carry)

        s, acc_lo, acc_meta = jax.lax.fori_loop(0, SUPER // 2, step,
                                                (s, acc_lo, acc_meta))
        off = pl.multiple_of(se * SUPER, SUPER)
        out_lo_ref[:, pl.ds(off, SUPER)] = _flip(acc_lo)
        out_meta_ref[:, pl.ds(off, SUPER)] = _flip(acc_meta)
        return s

    s = jax.lax.fori_loop(0, ns_ref[pl.program_id(0), 0], superepoch, s0)
    fs_ref[:, :] = s


def _flip(x):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.take_along_axis(x, 127 - lane, axis=1)


def _lmd_encode_kernel(ns_ref, e_tab_ref, pk_tab_ref, dsym_ref, lm_ref, d_ref,
                       num_ref, out_lo_ref, out_meta_ref, fs_ref,
                       *, r_rows, n_cols):
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_rows, 128), 1)
    # per-lane class offset into the combined L/M/D table tiles
    cls_off = jnp.where(lane == 1, 32, jnp.where(lane == 2, 64, 0))
    # L/M symbol classification thresholds (l: 20/28/60, m: 24/56/312)
    t1 = jnp.where(lane == 1, 24, 20)
    t2 = jnp.where(lane == 1, 56, 28)
    t3 = jnp.where(lane == 1, 312, 60)
    num = num_ref[:, :]
    zero = jnp.zeros((r_rows, 128), jnp.int32)
    s_init = (jnp.where(lane == 0, C.L_STATES,
                        jnp.where(lane == 1, C.M_STATES, C.D_STATES))
              .astype(jnp.int32))

    def superepoch(se, s):
        base = pl.multiple_of(n_cols - (se + 1) * SUPER, SUPER)
        lm_tile = lm_ref[:, pl.ds(base, SUPER)]
        d_tile = d_ref[:, pl.ds(base, SUPER)]
        acc_lo = zero
        acc_meta = zero

        def one(j, carry):
            s, acc_lo, acc_meta = carry
            gstep = se * SUPER + j
            active = gstep < num
            lm = _take_col(lm_tile, 127 - j)
            dv = _take_col(d_tile, 127 - j)
            v = jnp.where(lane == 0, lm & 0xFFFF,
                          jnp.where(lane == 1, lm >> 16, dv))
            # symbol: L/M via threshold counting; D via the fine-index table
            sym_lm = jnp.where(v < 16, v,
                               16 + (v >= t1) + (v >= t2) + (v >= t3))
            d_i = jnp.where(
                v < 60, v,
                jnp.where(v < 1020, ((v - 60) >> 4) + 64,
                          jnp.where(v < 16380, ((v - 1020) >> 8) + 128,
                                    ((v - 16380) >> 12) + 192)))
            dlo = d_i & 127
            ds0 = jnp.take_along_axis(dsym_ref[:, :128], dlo, axis=1)
            ds1 = jnp.take_along_axis(dsym_ref[:, 128:], dlo, axis=1)
            sym_d = jnp.where(d_i < 128, ds0, ds1)
            sym = jnp.where(lane == 2, sym_d, sym_lm)
            idx = sym + cls_off
            # packed (extra_bits | base << 4) and E entries: one gather each
            pk = jnp.take_along_axis(pk_tab_ref[:, :], idx, axis=1)
            e = jnp.take_along_axis(e_tab_ref[:, :], idx, axis=1)
            eb = pk & 15
            vbase = pk >> 4
            ex = v - vbase
            n_b, bits, s = _e_decode(e, s, active)
            # pair push: extra bits first, then state bits above them
            pv = ex | (bits.astype(jnp.uint32)
                       << eb.astype(jnp.uint32)).astype(jnp.int32)
            pn = eb + n_b
            pv = jnp.where((lane < 3) & active, pv, 0)
            pn = jnp.where((lane < 3) & active, pn, 0)
            glo, ghi, n_tot = _group_pack(pv, pn, lane, 3)
            meta = ghi | (n_tot << 22)
            acc_lo = jnp.where(lane == 0, glo, pltpu.roll(acc_lo, 1, 1))
            acc_meta = jnp.where(lane == 0, meta, pltpu.roll(acc_meta, 1, 1))
            return (s, acc_lo, acc_meta)

        def step(i, carry):
            carry = one(i * 2, carry)
            return one(i * 2 + 1, carry)

        s, acc_lo, acc_meta = jax.lax.fori_loop(0, SUPER // 2, step,
                                                (s, acc_lo, acc_meta))
        off = pl.multiple_of(se * SUPER, SUPER)
        out_lo_ref[:, pl.ds(off, SUPER)] = _flip(acc_lo)
        out_meta_ref[:, pl.ds(off, SUPER)] = _flip(acc_meta)
        return s

    s = jax.lax.fori_loop(0, ns_ref[pl.program_id(0), 0], superepoch, s_init)
    fs_ref[:, :] = s


R_ROWS = 32  # both encode kernels carry a (R, 10112) input AND two output
             # tiles; 32 rows keep the double-buffered footprint inside the
             # 16MB scoped-VMEM limit (the LMD decode kernel's constraint)


@functools.partial(jax.jit, static_argnames=("n_cols",))
def encode_literals_pallas(e_u, words, num, n_cols: int):
    """Batched 4-lane literal encode scan.

    e_u: (B, 256) packed E entries; words: (B, n_cols) int32 packed
    4-symbols-per-word, RIGHT-JUSTIFIED (block's last group at the last
    column); num: (B, 128) broadcast literal counts (padded to 4).
    Returns (group_lo (B, n_cols), group_meta = hi8|n<<8 (B, n_cols),
    final_states (B, 128) lanes 0..3): column i holds push group i in
    forward payload order.
    """
    B = e_u.shape[0]
    assert B % R_ROWS == 0 and n_cols % SUPER == 0
    grid = (B // R_ROWS,)
    steps = (num[:, 0] + 3) >> 2
    gmax = jnp.max(steps.reshape(-1, R_ROWS), axis=1)
    ns = jnp.minimum((gmax + SUPER - 1) // SUPER,
                     n_cols // SUPER).astype(jnp.int32).reshape(-1, 1)
    kernel = functools.partial(_literal_encode_kernel, r_rows=R_ROWS,
                               n_cols=n_cols)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B // R_ROWS, 1), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R_ROWS, 256), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_ROWS, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
    )(ns, e_u, words, num)


@functools.partial(jax.jit, static_argnames=("n_cols",))
def encode_lmds_pallas(e_l, e_m, e_d, lm, d, num, n_cols: int):
    """Batched 3-lane LMD encode scan.

    e_l/e_m/e_d: (B, 20/20/64) packed E entries; lm: (B, n_cols) packed
    l|m<<16 rows RIGHT-JUSTIFIED; d: (B, n_cols) distances; num: (B, 128)
    broadcast row counts. Returns (group_lo, group_meta = hi22|n<<22,
    final_states (L, M, D at lanes 0..2))."""
    B = e_l.shape[0]
    assert B % R_ROWS == 0 and n_cols % SUPER == 0
    grid = (B // R_ROWS,)
    steps = num[:, 0]
    gmax = jnp.max(steps.reshape(-1, R_ROWS), axis=1)
    ns = jnp.minimum((gmax + SUPER - 1) // SUPER,
                     n_cols // SUPER).astype(jnp.int32).reshape(-1, 1)
    # combined class tables: lanes 0..19 L, 32..51 M, 64..127 D
    def combine(a_l, a_m, a_d):
        out = jnp.zeros((B, 128), jnp.int32)
        out = out.at[:, :20].set(a_l)
        out = out.at[:, 32:52].set(a_m)
        out = out.at[:, 64:128].set(a_d)
        return out

    e_tab = combine(e_l, e_m, e_d)
    pk = lambda extra, base: (np.asarray(extra, np.int64)
                              | (np.asarray(base, np.int64) << 4))
    pk_host = np.zeros(128, np.int32)
    pk_host[:20] = pk(C.L_EXTRA_BITS, C.L_BASE_VALUE)
    pk_host[32:52] = pk(C.M_EXTRA_BITS, C.M_BASE_VALUE)
    pk_host[64:128] = pk(C.D_EXTRA_BITS, C.D_BASE_VALUE)
    pk_tab = jnp.tile(jnp.asarray(pk_host)[None, :], (B, 1))
    dsym_host = np.zeros(256, np.int32)
    dsym_host[:] = np.asarray(C.D_BASE_FROM_VALUE, np.int32)
    dsym = jnp.tile(jnp.asarray(dsym_host)[None, :], (B, 1))
    kernel = functools.partial(_lmd_encode_kernel, r_rows=R_ROWS,
                               n_cols=n_cols)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B // R_ROWS, 1), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 256), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_ROWS, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
    )(ns, e_tab, pk_tab, dsym, lm, d, num)
