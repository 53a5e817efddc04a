"""Pallas TPU kernels for batched tANS stream decode (sectioned layout).

Why Pallas: XLA:TPU lowers gathers to ~11-cycle scalarized accesses (~85M
elem/s measured on v5e), which caps the pure-XLA scan pipeline. Mosaic's
within-tile dynamic gather (jnp.take_along_axis along the 128-lane axis)
moves whole (8, 128) lookups in a few cycles, so the full decode loop runs
on-chip at a few ns per block-step.

Layout (per grid step, R blocks = 8 sublane rows x G lane sections):
  - every (8, 128) tensor is ONE native vreg, so each elementwise op serves
    all R blocks at once. A block occupies a 128/G-lane section of one row;
    its 4 (literals) / 3 (LMD) interleaved tANS states sit in the section's
    first lanes. The previous layout (one block per sublane row, 64 rows)
    spent 8 vregs per elementwise op on the same 64 blocks — sectioning
    cuts that cost ~8x while total gather work stays constant.
  - tables are row-blocks of G concatenated per-section tables; lookups
    gather every section's 128-lane tiles and merge by hoisted chunk masks
    plus the static section mask (the only composition that respects the
    128-lane gather source limit)
  - the backwards bitstream is read through a per-section 256-word sliding
    chunk of the payload, refreshed every EPOCH steps by per-(row, section)
    dynamic slices; bit positions decrease monotonically (reverse-order
    stream, src/bits/bit_reader.rs), bounding consumption per epoch
  - outputs are packed int32 lanes (4 literals/word; l|m<<16 and d words).
    Each step inserts one word at each section head and shifts the rolling
    accumulator by one lane; a full 128-lane tile stores every 128/G steps
    at an aligned offset. The jitted wrappers untangle the section-major
    store layout (reshape / flip / transpose — cheap XLA) into per-block
    rows, so callers see the same (B, n) shapes as before.

Decode semantics are the spec layer's (spec/fse.py): state' = pull(k) + delta,
value = v_base + pull(v_bits), with zero-bits reads below position 0 and
validity checked by the caller via final states/positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..base import constants as C

EPOCH = 64   # steps between chunk refreshes; 64*54 bits = 108 words < 125
R_SUB = 8    # sublane rows per grid step (one vreg)
G_LIT = 8    # blocks (lane sections) per row, literal kernel
G_LMD = 4    # LMD kernel: bigger windows + two outputs bound VMEM

R_ROWS = R_SUB * G_LIT      # blocks per literal grid step (= 64)
R_ROWS_LMD = R_SUB * G_LMD  # blocks per LMD grid step (= 32)


def _lookup_sec(tab, state, n_states, g_sec, sec_id):
    """Sectioned gather: out[r, l] = tab_{sec(l)}[r, state[r, l]].

    tab is (R_SUB, g_sec*n_states) with section g's table at columns
    [g*n_states, (g+1)*n_states). Gathers every 128-lane tile of every
    section; merges by hoisted chunk masks + the static section mask.
    """
    lo = state & 127
    hi = state >> 7
    n_chunks = n_states // 128
    masks = [hi == c for c in range(1, n_chunks)]
    e = None
    for g in range(g_sec):
        eg = None
        for c in range(n_chunks):
            o = g * n_states + c * 128
            gv = jnp.take_along_axis(tab[:, o:o + 128], lo, axis=1)
            eg = gv if eg is None else jnp.where(masks[c - 1], gv, eg)
        e = eg if e is None else jnp.where(sec_id == g, eg, e)
    return e


def _chunk_word_sec(chunk, widx, g_sec, sec_id):
    """chunk: (R_SUB, g_sec*256); widx in [0, 255] per lane: per-section
    2-tile gather-select merged by the static section mask."""
    lo = widx & 127
    half = widx < 128
    w = None
    for g in range(g_sec):
        ga = jnp.take_along_axis(chunk[:, g * 256:g * 256 + 128], lo, axis=1)
        gb = jnp.take_along_axis(chunk[:, g * 256 + 128:g * 256 + 256], lo,
                                 axis=1)
        wg = jnp.where(half, ga, gb)
        w = wg if w is None else jnp.where(sec_id == g, wg, w)
    return w


def _extract_sec(chunk, base_vec, pos, n_bits, g_sec, sec_id):
    """Extract n_bits starting at bit position pos from the sliding chunk
    (zero when pos < 0, mirroring the reference's below-buffer zero reads,
    src/bits/bit_src.rs:35-45)."""
    p = jnp.maximum(pos, 0)
    widx = jnp.clip((p >> 5) - base_vec, 0, 254)
    wlo = _chunk_word_sec(chunk, widx, g_sec, sec_id).astype(jnp.uint32)
    whi = _chunk_word_sec(chunk, widx + 1, g_sec, sec_id).astype(jnp.uint32)
    sh = (p & 31).astype(jnp.uint32)
    val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                  whi << (jnp.uint32(32) - sh))
    nb = n_bits.astype(jnp.uint32)
    bits = (val & ((jnp.uint32(1) << nb) - 1)).astype(jnp.int32)
    return jnp.where(pos < 0, 0, bits)


def _masked_roll(x, shift, glane):
    """Within-section shift up: lane l reads lane l-shift, zeroed where the
    section-local lane index is < shift (no cross-section leakage)."""
    return jnp.where(glane >= shift, pltpu.roll(x, shift, 1), 0)


def _neg_roll(x, shift):
    """Lane l reads lane l+shift (wraps; wrapped lanes are unused)."""
    return pltpu.roll(x, 128 - shift, 1)


def _chunk_base(pos, w_words):
    """128-aligned word-index base of the 256-word sliding chunk.

    Alignment is a Mosaic requirement for dynamic lane loads; `w_words` must
    be a multiple of 128 so the clip bound stays aligned. The window covers
    >= 125 words below the current position — an epoch's consumption bound.
    """
    p = jnp.maximum(pos, 0)
    base = ((p >> 5) - 125) & ~127
    return jnp.clip(base, 0, w_words - 256)


def _refresh_sec(pos, win_ref, pos_s_ref, chunk_ref, g_sec, w_words):
    """Reload every (row, section) 256-word sliding chunk around its
    position. The per-section scalar offsets come from a VMEM round-trip of
    the position vector; the vector-side `base_vec` is recomputed with
    identical arithmetic so scalar and vector views agree exactly."""
    sw = 128 // g_sec
    pos_s_ref[:, :] = pos
    for r in range(R_SUB):
        for g in range(g_sec):
            base = _chunk_base(pos_s_ref[r, g * sw], w_words)
            src = pl.multiple_of(g * w_words + base, 128)
            chunk_ref[pl.ds(r, 1), pl.ds(g * 256, 256)] = \
                win_ref[pl.ds(r, 1), pl.ds(src, 256)]


def _literal_kernel(ns_ref, u_tab_ref, win_ref, s_init_ref, pos_ref, num_ref,
                    out_ref, fs_ref, fpos_ref,
                    chunk_ref, pos_s_ref, *, g_sec, w_words):
    sw = 128 // g_sec
    n_st = EPOCH // sw  # output tiles stored per superepoch
    lane = jax.lax.broadcasted_iota(jnp.int32, (R_SUB, 128), 1)
    glane = lane & (sw - 1)
    sec_id = lane >> (sw.bit_length() - 1)
    states0 = s_init_ref[:, :]
    pos0 = pos_ref[:, :]
    num = num_ref[:, :]
    zero_acc = jnp.zeros((R_SUB, 128), jnp.int32)

    def make_body(se, masked):
        """One superepoch (EPOCH steps); `masked=False` compiles the fast
        path for superepochs where every block in the group is fully active
        (the common case in size-sorted groups) — the activity compare and
        freeze-selects elide."""

        def body(carry):
            s, pos = carry
            _refresh_sec(pos, win_ref, pos_s_ref, chunk_ref, g_sec, w_words)
            base_vec = _chunk_base(pos, w_words)
            chunk = chunk_ref[:, :]

            def one_step(j, carry):
                s, pos, acc = carry
                ent = _lookup_sec(u_tab_ref[:, :], s, 1024, g_sec, sec_id)
                k = jnp.where(glane < 4, ent & 15, 0)
                sym = (ent >> 4) & 255
                delta = ent >> 12
                # inclusive prefix of k over each section's 4 stream lanes
                ksum = k + _masked_roll(k, 1, glane)
                ksum = ksum + _masked_roll(ksum, 2, glane)
                p_lane = pos - ksum
                bits = _extract_sec(chunk, base_vec, p_lane, ent & 15,
                                    g_sec, sec_id)
                # total bits consumed = inclusive k-prefix at section lane
                # 3; roll-tree broadcast to lanes 0..3 (cheaper than a
                # reduce; lanes >= 4 keep a stale pos, unused)
                t = jnp.where(glane == 3, ksum, 0)
                t = t + pltpu.roll(t, 127, 1)
                t = t + pltpu.roll(t, 126, 1)
                if masked:
                    active = ((se * EPOCH + j) * 4) < num
                    new_s = jnp.where(active, bits + delta, s)
                    new_pos = jnp.where(active, pos - t, pos)
                else:
                    new_s = bits + delta
                    new_pos = pos - t
                # pack 4 symbols into one int32 word (valid at each section
                # head) and shift it into the rolling accumulator; a full
                # tile stores every sw steps (wrapper untangles the layout)
                packed = (sym + (_neg_roll(sym, 1) << 8)
                          + (_neg_roll(sym, 2) << 16)
                          + (_neg_roll(sym, 3) << 24))
                acc = jnp.where(glane == 0, packed, pltpu.roll(acc, 1, 1))
                return (new_s, new_pos, acc)

            accs = []
            for q in range(n_st):
                def step(i, carry, q=q):
                    # 4x unroll amortizes loop control
                    carry = one_step(q * sw + i * 4, carry)
                    carry = one_step(q * sw + i * 4 + 1, carry)
                    carry = one_step(q * sw + i * 4 + 2, carry)
                    return one_step(q * sw + i * 4 + 3, carry)
                s, pos, acc = jax.lax.fori_loop(0, sw // 4, step,
                                                (s, pos, zero_acc))
                accs.append(acc)
            return (s, pos, *accs)

        return body

    n_full = ns_ref[pl.program_id(0), 1]

    def superepoch(se, carry):
        out = jax.lax.cond(se < n_full, make_body(se, False),
                           make_body(se, True), carry)
        s, pos = out[0], out[1]
        for q in range(n_st):
            off = pl.multiple_of((se * n_st + q) * 128, 128)
            out_ref[:, pl.ds(off, 128)] = out[2 + q]
        return (s, pos)

    # dynamic trip count: this group's blocks were sorted by size, so the
    # scalar-prefetched superepoch count skips the dead tail the static cap
    # would otherwise burn (corpus mean literal fill is ~29% of the cap)
    n_super = ns_ref[pl.program_id(0), 0]
    s, pos = jax.lax.fori_loop(0, n_super, superepoch, (states0, pos0))
    fs_ref[:, :] = s
    fpos_ref[:, :] = pos


def _lmd_kernel(ns_ref, v_tab_ref, d_base_ref, win_ref, s_init_ref, pos_ref,
                num_ref, out_lm_ref, out_d_ref, fs_ref, fpos_ref,
                chunk_ref, pos_s_ref, *, g_sec, w_words):
    sw = 128 // g_sec
    n_st = EPOCH // sw
    lane = jax.lax.broadcasted_iota(jnp.int32, (R_SUB, 128), 1)
    glane = lane & (sw - 1)
    sec_id = lane >> (sw.bit_length() - 1)
    d_base_row = d_base_ref[:, :]  # (R_SUB, 128): lanes 0..63 = D_BASE_VALUE
    states0 = s_init_ref[:, :]
    pos0 = pos_ref[:, :]
    num = num_ref[:, :]
    zero_acc = jnp.zeros((R_SUB, 128), jnp.int32)

    def make_body(se, masked):
        def body(carry):
            s, pos = carry
            _refresh_sec(pos, win_ref, pos_s_ref, chunk_ref, g_sec, w_words)
            base_vec = _chunk_base(pos, w_words)
            chunk = chunk_ref[:, :]

            def one_step(j, carry):
                s, pos, acc_lm, acc_d = carry
                ent = _lookup_sec(v_tab_ref[:, :], s, 384, g_sec, sec_id)
                k = jnp.where(glane < 3, ent & 15, 0)
                nb = jnp.where(glane < 3, (ent >> 4) & 15, 0)
                delta = (ent >> 8) & 0x1FF
                # value base: packed inline for the L/M lanes; the D lane
                # packs the D symbol, resolved via the shared 64-entry table
                hi = (ent >> 17) & 0x7FFF
                d_b = jnp.take_along_axis(d_base_row, hi & 63, axis=1)
                base = jnp.where(glane == 2, d_b, hi)
                # stream order per lane i: pull k_i then nb_i, lanes 0,1,2.
                # The pulls are bit-adjacent ([extra][state] upward), so one
                # (k+nb)-bit extract serves both (k+nb <= 23 fits a funnel).
                knb = k + nb
                # exclusive prefix: pre_i = sum_{j<i} knb_j
                pre = (_masked_roll(knb, 1, glane)
                       + _masked_roll(knb, 2, glane))
                p_state = pos - pre - k
                p_extra = p_state - nb
                both = _extract_sec(chunk, base_vec, p_extra, knb, g_sec,
                                    sec_id)
                nbu = nb.astype(jnp.uint32)
                vbits = (both.astype(jnp.uint32)
                         & ((jnp.uint32(1) << nbu) - 1)).astype(jnp.int32)
                sbits = jnp.where(
                    p_state < 0, 0,
                    (both.astype(jnp.uint32) >> nbu).astype(jnp.int32))
                value = base + vbits
                # total consumed = inclusive (k+nb)-prefix at section lane
                # 2; roll-tree broadcast to lanes 0..2 (see literal kernel)
                t = jnp.where(glane == 2, pre + knb, 0)
                t = t + pltpu.roll(t, 127, 1)
                t = t + pltpu.roll(t, 126, 1)
                if masked:
                    active = (se * EPOCH + j) < num
                    new_s = jnp.where(active, sbits + delta, s)
                    new_pos = jnp.where(active, pos - t, pos)
                    value = jnp.where(active, value, 0)
                else:
                    new_s = sbits + delta
                    new_pos = pos - t
                lm = value + (_neg_roll(value, 1) << 16)   # l | m << 16
                d_v = _neg_roll(value, 2)
                acc_lm = jnp.where(glane == 0, lm, pltpu.roll(acc_lm, 1, 1))
                acc_d = jnp.where(glane == 0, d_v, pltpu.roll(acc_d, 1, 1))
                return (new_s, new_pos, acc_lm, acc_d)

            accs = []
            for q in range(n_st):
                def step(i, carry, q=q):
                    carry = one_step(q * sw + i * 4, carry)
                    carry = one_step(q * sw + i * 4 + 1, carry)
                    carry = one_step(q * sw + i * 4 + 2, carry)
                    return one_step(q * sw + i * 4 + 3, carry)
                s, pos, acc_lm, acc_d = jax.lax.fori_loop(
                    0, sw // 4, step, (s, pos, zero_acc, zero_acc))
                accs.append(acc_lm)
                accs.append(acc_d)
            return (s, pos, *accs)

        return body

    n_full = ns_ref[pl.program_id(0), 1]

    def superepoch(se, carry):
        out = jax.lax.cond(se < n_full, make_body(se, False),
                           make_body(se, True), carry)
        s, pos = out[0], out[1]
        for q in range(n_st):
            off = pl.multiple_of((se * n_st + q) * 128, 128)
            out_lm_ref[:, pl.ds(off, 128)] = out[2 + 2 * q]
            out_d_ref[:, pl.ds(off, 128)] = out[3 + 2 * q]
        return (s, pos)

    n_super = ns_ref[pl.program_id(0), 0]
    s, pos = jax.lax.fori_loop(0, n_super, superepoch, (states0, pos0))
    fs_ref[:, :] = s
    fpos_ref[:, :] = pos


def _group_counts(steps, group, n_se_max):
    """Per-group dynamic superepoch counts. Column 0 is the trip count;
    column 1 counts the leading superepochs where EVERY block in the group
    is fully active (those run the maskless fast path). The caller sorts
    blocks by size so groups are homogeneous."""
    g2 = steps.reshape(-1, group)
    n_se = jnp.minimum((jnp.max(g2, axis=1) + EPOCH - 1) // EPOCH, n_se_max)
    n_full = jnp.minimum(jnp.min(g2, axis=1) // EPOCH, n_se)
    return jnp.stack([n_se, n_full], axis=1).astype(jnp.int32)


def _untangle(out, B, g_sec, n_se_max):
    """Section-major store layout -> per-block rows.

    out is (B/G, S*128) where store tile t, lane g*sw + j holds block
    (row*G + g)'s value for step t*sw + (sw-1-j)."""
    sw = 128 // g_sec
    s_tot = n_se_max * (EPOCH // sw)
    o = out.reshape(B // g_sec, s_tot, g_sec, sw)[:, :, :, ::-1]
    return o.transpose(0, 2, 1, 3).reshape(B, s_tot * sw)


def _to_sections(x, g_sec):
    """(B, 128) per-block vectors -> (B/G, 128) sectioned rows. Lanes
    [0, 128/G) of each input row land in the block's section; inputs are
    zero (or value-broadcast) there by construction."""
    sw = 128 // g_sec
    B = x.shape[0]
    return x[:, :sw].reshape(B // g_sec, 128)


def _widen(x, B, g_sec):
    """(B/G, 128) sectioned rows -> (B, 128) per-block vectors (sections'
    lanes land in lanes [0, 128/G); the rest zero-pad)."""
    sw = 128 // g_sec
    xb = x.reshape(B // g_sec, g_sec, sw).reshape(B, sw)
    return jnp.pad(xb, ((0, 0), (0, 128 - sw)))


@functools.partial(jax.jit, static_argnames=("n_steps",))
def decode_literals_pallas(u_tab, win_words, init_states, init_pos, num,
                           n_steps: int):
    """Batched 4-lane literal decode.

    u_tab: (B, 1024) packed int32; win_words: (B, W) uint32 LE words of the
    padded literal payload; init_states: (B, 128) int32 (lanes 0..3, zeros
    elsewhere); init_pos/num: (B, 128) int32 broadcast. B must be a
    multiple of R_ROWS. Returns (packed literals (B, >=n_steps) int32,
    final_states (B, 128), final_pos (B, 128))."""
    B, W = win_words.shape
    assert B % R_ROWS == 0
    G = G_LIT
    grid = (B // R_ROWS,)
    n_se_max = (n_steps + EPOCH - 1) // EPOCH
    n_cols = n_se_max * (EPOCH // (128 // G)) * 128
    steps = (num[:, 0] + 3) // 4
    ns = _group_counts(steps, R_ROWS, n_se_max)
    ns_shape = (B // R_ROWS, 2)
    kernel = functools.partial(_literal_kernel, g_sec=G, w_words=W)
    out, fs, fp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(ns_shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R_SUB, G * 1024), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, G * W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_SUB, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // G, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R_SUB, G * 256), jnp.int32),
            pltpu.VMEM((R_SUB, 128), jnp.int32),
        ],
    )(ns, u_tab.reshape(B // G, G * 1024),
      win_words.reshape(B // G, G * W), _to_sections(init_states, G),
      _to_sections(init_pos, G), _to_sections(num, G))
    return (_untangle(out, B, G, n_se_max), _widen(fs, B, G),
            _widen(fp, B, G))


@functools.partial(jax.jit, static_argnames=("n_steps",))
def decode_lmds_pallas(v_tab, win_words, init_states, init_pos, num,
                       n_steps: int):
    """Batched 3-lane LMD decode. Shapes as decode_literals_pallas; v tables
    are (B, 384) packed entries (value bases inline; the D lane resolves its
    base through a broadcast 64-entry table). Returns (lm_packed (B,
    >=n_steps) int32 = l | m << 16, d (B, >=n_steps) int32, final_states,
    final_pos)."""
    import numpy as _np

    from ..base import constants as _C

    B, W = win_words.shape
    assert B % R_ROWS_LMD == 0
    G = G_LMD
    grid = (B // R_ROWS_LMD,)
    n_se_max = (n_steps + EPOCH - 1) // EPOCH
    n_cols = n_se_max * (EPOCH // (128 // G)) * 128
    ns = _group_counts(num[:, 0], R_ROWS_LMD, n_se_max)
    d_base_host = _np.zeros((B // G, 128), _np.int32)
    d_base_host[:, :_C.D_SYMBOLS] = _C.D_BASE_VALUE
    d_base = jnp.asarray(d_base_host)
    ns_shape = (B // R_ROWS_LMD, 2)
    kernel = functools.partial(_lmd_kernel, g_sec=G, w_words=W)
    lm, dd, fs, fp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(ns_shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R_SUB, G * 384), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, G * W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_SUB, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, n_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_SUB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // G, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B // G, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R_SUB, G * 256), jnp.int32),
            pltpu.VMEM((R_SUB, 128), jnp.int32),
        ],
    )(ns, v_tab.reshape(B // G, G * 384), d_base,
      win_words.reshape(B // G, G * W), _to_sections(init_states, G),
      _to_sections(init_pos, G), _to_sections(num, G))
    return (_untangle(lm, B, G, n_se_max), _untangle(dd, B, G, n_se_max),
            _widen(fs, B, G), _widen(fp, B, G))
