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
    first lanes.
  - the grid is 2-D: (row group, superepoch). Output blocks are indexed by
    BOTH dims, so only one superepoch's tiles sit in VMEM at a time — that
    is what lets G reach 16 (128 blocks per vreg row) within the scoped
    VMEM limit. tANS states/positions carry across the inner superepoch
    grid dim in scratch; input blocks are indexed by the row group only,
    so Mosaic never refetches them within a group. Superepochs beyond a
    group's dynamic fill skip their body via pl.when (their output tiles
    are left unwritten — callers never read past each block's num).
  - G is chosen per call from the (bucketed) payload window width: 16 when
    the windows fit VMEM double-buffered, else 8. Window widths themselves
    are bucketed by the caller (decode_many) to the batch maximum, which
    is what makes G=16 typical: format-cap windows only force G=8 when a
    batch actually contains near-cap payloads.
  - the step cost is gather-issue bound (~4 ns per (8,128) gather measured
    via tools/microbench_step.py), so the design minimizes gathers/step:
      * literal U tables collapse to byte-packed symbols (256 words = 2
        tiles) + ONE aux word per SYMBOL (2 tiles) from which (k, delta)
        reconstruct arithmetically (_sym_aux_lookup; the identity
        A + B == 2048 >> k0 recovers the shift) = 4 gathers/section vs 6
        for the split per-state layout and 8 for full-word entries;
      * the backwards bitstream is read through a per-section COMPACTED
        window: the LMD kernel keeps a word-granular 2-tile window (one
        pull can span 33 bits), but the literal kernel compacts at
        HALFWORD granularity — slot i holds the 32 bits at halfword
        cstart16+i, so any <=17-bit pull is ONE gather (literal pulls are
        <=10 bits); EPOCH_LIT=48 keeps an epoch's consumption inside the
        128-slot coverage;
      * prefix/broadcast sums use independent roll trees (parallel rolls
        summed) rather than chained roll-accumulate — rolls are ~75 ns
        latency but overlap when independent.
  - bit positions decrease monotonically (reverse-order stream,
    src/bits/bit_reader.rs), bounding consumption per epoch below the
    126-word window coverage.
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

EPOCH = 64      # LMD steps between refreshes; 64*54 bits = 108 words < 126
EPOCH_LIT = 48  # literal steps between refreshes; 48*40 bits = 120
                # halfwords < 127 (the literal window is halfword-granular:
                # one gather per read instead of a two-word funnel)
R_SUB = 8    # sublane rows per grid step (one vreg)

# Batch granularity: B must be a multiple of every possible R_SUB * G, so
# callers round up to 128 (covers G in {8, 16} for both kernels).
R_ROWS = 128
R_ROWS_LMD = 128


def _pick_g(w_words: int, two_outputs: bool) -> int:
    """Sections per row: 16 when the double-buffered (8, G*W) windows plus
    tables fit the ~16MB scoped-VMEM budget, else 8. Measured on the
    corpus batch, G=16 beats G=8 for BOTH kernels despite worse group
    utilization (sorted-group trip counts run 1.97x vs 1.40x the needed
    literal steps): the per-step fixed cost (rolls, refresh, grid
    overhead) amortized over 2x blocks outweighs the extra dead steps
    (lit 7.9 vs 8.4 ms, lmd 9.6 vs 19 ms on the 256-block pass)."""
    limit = 8192 if two_outputs else 10240
    return 16 if w_words <= limit else 8


def _bit_merge(parts, key):
    """Balanced select-merge: parts[i] is the valid result where key == i.
    Level k selects on bit k of key, so the merge is a log2(len) DEPTH
    select tree with the same select COUNT as the serial
    where(key==i, ...) chain it replaces — the chain's len-1 dependent
    selects were a latency bottleneck at G=16 sections (~40% of kernel
    step time was select-chain)."""
    bit = 1
    while len(parts) > 1:
        m = (key & bit) != 0
        nxt = [jnp.where(m, parts[i + 1], parts[i])
               for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        bit <<= 1
        parts = nxt
    return parts[0]


def _lookup_sec(tab, state, n_states, g_sec, sec_id):
    """Sectioned gather: out[r, l] = tab_{sec(l)}[r, state[r, l]].

    tab is (R_SUB, g_sec*n_states) with section g's table at columns
    [g*n_states, (g+1)*n_states). Gathers every 128-lane tile of every
    section; merges chunks then sections via balanced select trees.
    """
    lo = state & 127
    hi = state >> 7
    n_chunks = n_states // 128
    secs = []
    for g in range(g_sec):
        chunks = [
            jnp.take_along_axis(
                tab[:, g * n_states + c * 128:g * n_states + (c + 1) * 128],
                lo, axis=1)
            for c in range(n_chunks)]
        secs.append(_bit_merge(chunks, hi))
    return _bit_merge(secs, sec_id)


def _sym_aux_lookup(u3, state, tot, g_sec, sec_id):
    """Literal U lookup on the compact sym+aux table: 3 gathers/section.

    Per section (384 words): columns [0, 256) hold byte-packed symbols
    (state i in byte i&3 of word i>>2); columns [256, 384) hold per-SYMBOL
    aux HALFWORDS B | (k0 << 11) with B = base + x (f = symbol weight,
    base = cumulative weight, x = head length; B <= 1024 fits 11 bits).
    (k, delta) reconstruct arithmetically:

      A     == (2048 >> k0) - B    (exact: A + B == 2048 >> k0)
      head  == state < B
      k     == head ? k0 : k0 - 1
      delta == head ? ((state + A) << k0) - 1024 : (state - B) << (k0 - 1)

    which reproduces the reference's per-state entries
    (src/fse/decoder.rs:299-335) without a per-state (k, delta) table.
    Halfword-packing the aux makes it ONE 128-word tile, so the aux read
    is a single gather (4 -> 3 gathers/section vs the v2 word layout).
    States >= tot are latch entries (k=0, delta=state, sym=0;
    decoder.rs:327-334). Returns (k, delta, sym)."""
    si_lo = (state >> 2) & 127
    si_hi = (state >> 9) & 1
    sy_secs = []
    for g in range(g_sec):
        o = g * 384
        sa = jnp.take_along_axis(u3[:, o:o + 128], si_lo, axis=1)
        sb = jnp.take_along_axis(u3[:, o + 128:o + 256], si_lo, axis=1)
        sy_secs.append(jnp.where(si_hi == 0, sa, sb))
    sy = _bit_merge(sy_secs, sec_id)
    sym = (sy.astype(jnp.uint32)
           >> ((state & 3) << 3).astype(jnp.uint32)).astype(jnp.int32) & 255
    ax_secs = []
    for g in range(g_sec):
        o = g * 384 + 256
        ax_secs.append(jnp.take_along_axis(u3[:, o:o + 128], sym >> 1,
                                           axis=1))
    aw = _bit_merge(ax_secs, sec_id).astype(jnp.uint32)
    aux = ((aw >> ((sym & 1) << 4).astype(jnp.uint32))
           & jnp.uint32(0x7FFF)).astype(jnp.int32)
    Bv = aux & 2047
    k0 = aux >> 11
    A = (2048 >> k0) - Bv
    head = state < Bv
    k = jnp.maximum(jnp.where(head, k0, k0 - 1), 0)
    delta = jnp.where(head,
                      ((state + A) << k0) - 1024,
                      (state - Bv) << jnp.maximum(k0 - 1, 0))
    latch = state >= tot
    k = jnp.where(latch, 0, k)
    delta = jnp.where(latch, state, delta)
    sym = jnp.where(latch, 0, sym)
    return k, delta, sym


def _chunk_word_c(chunk, widx, g_sec, sec_id, off):
    """Compacted-window word read: ONE gather per section. off=0 reads the
    c0 tiles (stream word start+widx), off=128 the c1 tiles (start+1+widx).
    widx must already be clipped to [0, 127]."""
    return _bit_merge(
        [jnp.take_along_axis(chunk[:, g * 256 + off:g * 256 + off + 128],
                             widx, axis=1)
         for g in range(g_sec)], sec_id)


def _extract_c(chunk, cstart, pos, n_bits, g_sec, sec_id):
    """Extract n_bits starting at bit position pos through the compacted
    window (zero when pos < 0, mirroring the reference's below-buffer zero
    reads, src/bits/bit_src.rs:35-45). cstart is the captured per-lane
    stream word index of compacted word 0."""
    p = jnp.maximum(pos, 0)
    widx = jnp.clip((p >> 5) - cstart, 0, 127)
    wlo = _chunk_word_c(chunk, widx, g_sec, sec_id, 0).astype(jnp.uint32)
    whi = _chunk_word_c(chunk, widx, g_sec, sec_id, 128).astype(jnp.uint32)
    sh = (p & 31).astype(jnp.uint32)
    val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                  whi << (jnp.uint32(32) - sh))
    nb = n_bits.astype(jnp.uint32)
    bits = (val & ((jnp.uint32(1) << nb) - 1)).astype(jnp.int32)
    return jnp.where(pos < 0, 0, bits)


def _cstart16(pos):
    """Halfword-granularity window origin: the stream HALFWORD index that
    compacted halfword-slot 0 maps to after a refresh at position `pos` —
    126 halfwords below the current one (clipped at 0). One literal epoch
    (EPOCH_LIT=48 steps x <= 40 bits) consumes <= 120 halfwords, so every
    in-epoch read stays inside the 128-slot window."""
    p = jnp.maximum(pos, 0)
    return jnp.maximum((p >> 4) - 126, 0)


def _chunk_word_h(chunk, hidx, g_sec, sec_id):
    """Halfword-window read: ONE gather per section. Slot i of section g's
    compacted tile holds the 32 stream bits starting at halfword
    cstart16 + i, so any <= 17-bit field needs a single gather. hidx must
    already be clipped to [0, 127]."""
    return _bit_merge(
        [jnp.take_along_axis(chunk[:, g * 256:g * 256 + 128], hidx, axis=1)
         for g in range(g_sec)], sec_id)


def _extract_h(chunk, cstart16, pos, n_bits, g_sec, sec_id):
    """Extract n_bits (<= 17) at bit position pos through the halfword-
    compacted window (zero when pos < 0, mirroring the reference's
    below-buffer zero reads, src/bits/bit_src.rs:35-45)."""
    p = jnp.maximum(pos, 0)
    hidx = jnp.clip((p >> 4) - cstart16, 0, 127)
    h = _chunk_word_h(chunk, hidx, g_sec, sec_id).astype(jnp.uint32)
    sh = (p & 15).astype(jnp.uint32)
    nb = n_bits.astype(jnp.uint32)
    bits = ((h >> sh) & ((jnp.uint32(1) << nb) - 1)).astype(jnp.int32)
    return jnp.where(pos < 0, 0, bits)


def _refresh_compact_h(pos, win_ref, pos_s_ref, chunk_ref, g_sec, w_words):
    """Reload + compact every (row, section) sliding window at HALFWORD
    granularity: after the refresh, slot i of section g's 128-slot tile is
    the 32-bit value at stream halfword cstart16 + i (straddling two words
    when cstart16 + i is odd). Scalar stage as _refresh_compact (128-aligned
    256-word raw slice into chunk_ref); the vector stage composes the
    halfword-shifted view in place over the first 128 words."""
    rs = pos_s_ref.shape[0]
    sw = 128 // g_sec
    pos_s_ref[:, :] = pos
    for r in range(rs):
        for g in range(g_sec):
            p0 = jnp.maximum(pos_s_ref[r, g * sw], 0)
            cs16 = jnp.maximum((p0 >> 4) - 126, 0)
            base = jnp.clip((cs16 >> 1) & ~127, 0, w_words - 256)
            src = pl.multiple_of(g * w_words + base, 128)
            chunk_ref[pl.ds(r, 1), pl.ds(g * 256, 256)] = \
                win_ref[pl.ds(r, 1), pl.ds(src, 256)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1)
    cs16_v = _cstart16(pos)
    base_v = jnp.clip((cs16_v >> 1) & ~127, 0, w_words - 256)
    o16_v = cs16_v - 2 * base_v  # valid at each section's lane 0
    for g in range(g_sec):
        og = jnp.take_along_axis(
            o16_v, jnp.full((rs, 128), g * sw, jnp.int32), axis=1)
        tA = chunk_ref[:, g * 256:g * 256 + 128]
        tB = chunk_ref[:, g * 256 + 128:g * 256 + 256]
        h = og + lane
        w = h >> 1
        w1 = w + 1
        cw = jnp.where(w < 128,
                       jnp.take_along_axis(tA, w & 127, axis=1),
                       jnp.take_along_axis(tB, w & 127, axis=1))
        cw1 = jnp.where(w1 < 128,
                        jnp.take_along_axis(tA, w1 & 127, axis=1),
                        jnp.take_along_axis(tB, w1 & 127, axis=1))
        odd = (h & 1) == 1
        comp = jnp.where(
            odd,
            ((cw.astype(jnp.uint32) >> 16)
             | (cw1.astype(jnp.uint32) << 16)).astype(jnp.int32),
            cw)
        chunk_ref[:, g * 256:g * 256 + 128] = comp


def _masked_roll(x, shift, glane):
    """Within-section shift up: lane l reads lane l-shift, zeroed where the
    section-local lane index is < shift (no cross-section leakage)."""
    return jnp.where(glane >= shift, pltpu.roll(x, shift, 1), 0)


def _neg_roll(x, shift):
    """Lane l reads lane l+shift (wraps; wrapped lanes are unused)."""
    return pltpu.roll(x, 128 - shift, 1)


def _cstart(pos):
    """Stream word index that compacted word 0 maps to after a refresh at
    position `pos`: 126 words below the current word (clipped at 0). The
    window then covers [cstart, cstart+128] — an epoch consumes at most
    ~102 words, so every in-epoch read stays inside. Identical arithmetic
    runs on the scalar side of _refresh_compact so both views agree."""
    p = jnp.maximum(pos, 0)
    return jnp.maximum((p >> 5) - 126, 0)


def _refresh_compact(pos, win_ref, pos_s_ref, chunk_ref, g_sec, w_words):
    """Reload + compact every (row, section) sliding window.

    Scalar stage: dynamic-slice the 128-aligned 256-word window [base,
    base+256) around each (row, section) position into chunk_ref (lane-axis
    offsets must be 128-aligned — a Mosaic requirement). Vector stage:
    gather-shift each section's two tiles by s = cstart - base so tile c0
    holds stream words start..start+127 and c1 holds start+1..start+128;
    per-step reads then cost one gather instead of a 2-tile gather+select.
    Amortized over EPOCH steps the 5 gathers/section here are noise."""
    sw = 128 // g_sec
    rs = pos_s_ref.shape[0]
    pos_s_ref[:, :] = pos
    for r in range(rs):
        for g in range(g_sec):
            p0 = jnp.maximum(pos_s_ref[r, g * sw], 0)
            start = jnp.maximum((p0 >> 5) - 126, 0)
            base = jnp.clip(start & ~127, 0, w_words - 256)
            src = pl.multiple_of(g * w_words + base, 128)
            chunk_ref[pl.ds(r, 1), pl.ds(g * 256, 256)] = \
                win_ref[pl.ds(r, 1), pl.ds(src, 256)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1)
    start_v = _cstart(pos)
    base_v = jnp.clip(start_v & ~127, 0, w_words - 256)
    s_v = start_v - base_v  # valid at each section's lane 0
    for g in range(g_sec):
        sg = jnp.take_along_axis(
            s_v, jnp.full((rs, 128), g * sw, jnp.int32), axis=1)
        tA = chunk_ref[:, g * 256:g * 256 + 128]
        tB = chunk_ref[:, g * 256 + 128:g * 256 + 256]
        ia = sg + lane
        ib = ia + 1
        c0 = jnp.where(ia < 128,
                       jnp.take_along_axis(tA, ia & 127, axis=1),
                       jnp.take_along_axis(tB, ia & 127, axis=1))
        c1 = jnp.where(ib < 128,
                       jnp.take_along_axis(tA, ib & 127, axis=1),
                       jnp.take_along_axis(tB, ib & 127, axis=1))
        chunk_ref[:, g * 256:g * 256 + 128] = c0
        chunk_ref[:, g * 256 + 128:g * 256 + 256] = c1


def _literal_kernel(ns_ref, u_tab_ref, win_ref, s_init_ref, pos_ref, num_ref,
                    out_ref, fs_ref, fpos_ref,
                    chunk_ref, pos_s_ref, s_c_ref, p_c_ref, *, g_sec,
                    w_words, epoch):
    sw = 128 // g_sec
    rs = s_init_ref.shape[0]
    n_st = epoch // sw  # output tiles stored per superepoch
    se = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1)
    glane = lane & (sw - 1)
    sec_id = lane >> (sw.bit_length() - 1)
    num = num_ref[:, :]
    # per-block latch threshold (U-weight total) rides in lanes 4..7 of the
    # init-states input; broadcast it onto the 4 state lanes once
    tot_v = jnp.where(glane < 4, _neg_roll(s_init_ref[:, :], 4),
                      jnp.int32(0x7FFFFFFF))
    zero_acc = jnp.zeros((rs, 128), jnp.int32)

    @pl.when(se == 0)
    def _init():
        # carry scratch init + final outputs for groups that never run a
        # superepoch (all-empty streams must report their initial states)
        s_c_ref[:, :] = s_init_ref[:, :]
        p_c_ref[:, :] = pos_ref[:, :]
        fs_ref[:, :] = s_init_ref[:, :]
        fpos_ref[:, :] = pos_ref[:, :]

    def make_body(masked):
        """One superepoch (EPOCH steps); `masked=False` compiles the fast
        path for superepochs where every block in the group is fully active
        (the common case in size-sorted groups) — the activity compare and
        freeze-selects elide."""

        def body(carry):
            s, pos = carry
            _refresh_compact_h(pos, win_ref, pos_s_ref, chunk_ref, g_sec,
                               w_words)
            cstart = _cstart16(pos)
            chunk = chunk_ref[:, :]

            def one_step(j, carry):
                s, pos, acc = carry
                k, delta, sym = _sym_aux_lookup(u_tab_ref[:, :], s, tot_v,
                                                g_sec, sec_id)
                k = jnp.where(glane < 4, k, 0)
                # independent roll trees: inclusive prefix over the 4
                # stream lanes + section total broadcast to lanes 0..3
                f1 = _masked_roll(k, 1, glane)
                f2 = _masked_roll(k, 2, glane)
                f3 = _masked_roll(k, 3, glane)
                b1 = jnp.where(glane < 3, _neg_roll(k, 1), 0)
                b2 = jnp.where(glane < 2, _neg_roll(k, 2), 0)
                b3 = jnp.where(glane < 1, _neg_roll(k, 3), 0)
                ksum = k + f1 + (f2 + f3)
                t = ksum + b1 + (b2 + b3)
                p_lane = pos - ksum
                bits = _extract_h(chunk, cstart, p_lane, k, g_sec, sec_id)
                if masked:
                    active = ((se * epoch + j) * 4) < num
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

    # dynamic trip: superepochs past this group's actual fill skip their
    # body (blocks were size-sorted into homogeneous groups); their output
    # tiles are left unwritten — callers never read past a block's num
    n_super = ns_ref[pl.program_id(0), 0]
    n_full = ns_ref[pl.program_id(0), 1]

    @pl.when(se < n_super)
    def _run():
        carry = (s_c_ref[:, :], p_c_ref[:, :])
        out = jax.lax.cond(se < n_full, make_body(False), make_body(True),
                           carry)
        s, pos = out[0], out[1]
        for q in range(n_st):
            out_ref[:, pl.ds(q * 128, 128)] = out[2 + q]
        s_c_ref[:, :] = s
        p_c_ref[:, :] = pos
        fs_ref[:, :] = s
        fpos_ref[:, :] = pos


def _lmd_kernel(ns_ref, v_tab_ref, win_ref, s_init_ref, pos_ref,
                num_ref, out_lm_ref, out_d_ref, fs_ref, fpos_ref,
                chunk_ref, pos_s_ref, s_c_ref, p_c_ref, *, g_sec, w_words,
                epoch):
    sw = 128 // g_sec
    rs = s_init_ref.shape[0]
    n_st = epoch // sw
    se = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1)
    glane = lane & (sw - 1)
    sec_id = lane >> (sw.bit_length() - 1)
    num = num_ref[:, :]
    zero_acc = jnp.zeros((rs, 128), jnp.int32)

    @pl.when(se == 0)
    def _init():
        s_c_ref[:, :] = s_init_ref[:, :]
        p_c_ref[:, :] = pos_ref[:, :]
        fs_ref[:, :] = s_init_ref[:, :]
        fpos_ref[:, :] = pos_ref[:, :]

    def make_body(masked):
        def body(carry):
            s, pos = carry
            _refresh_compact(pos, win_ref, pos_s_ref, chunk_ref, g_sec,
                             w_words)
            cstart = _cstart(pos)
            chunk = chunk_ref[:, :]

            def one_step(j, carry):
                s, pos, acc_lm, acc_d = carry
                ent = _lookup_sec(v_tab_ref[:, :], s, 384, g_sec, sec_id)
                k = jnp.where(glane < 3, ent & 15, 0)
                nb = jnp.where(glane < 3, (ent >> 4) & 15, 0)
                delta = (ent >> 8) & 0x1FF
                # value base: packed inline for the L/M lanes; the D lane
                # packs the D symbol j, whose base follows the closed form
                # base = ((4 + (j & 3)) << (j >> 2)) - 4 (extra bits
                # e = j >> 2) — verified against D_BASE_VALUE, replacing
                # the 64-entry table gather with three VPU ops.
                # (A/B'd r4: the literal kernel's sym+aux arithmetic
                # reconstruction at 2 gathers/section LOSES here — 25.5-27
                # vs 23.6 ms over three packing variants; this 384-state
                # per-state layout keeps the unpack at ~8 VPU ops, and the
                # kernel is not purely gather-issue bound at that margin.)
                hi = (ent >> 17) & 0x7FFF
                d_b = ((4 + (hi & 3)) << jnp.minimum(hi >> 2, 15)) - 4
                base = jnp.where(glane == 2, d_b, hi)
                # stream order per lane i: pull k_i then nb_i, lanes 0,1,2.
                # The pulls are bit-adjacent ([extra][state] upward), so one
                # (k+nb)-bit extract serves both (k+nb <= 23 fits a funnel).
                knb = k + nb
                # exclusive prefix (independent rolls); total broadcast to
                # lanes 0..2 via independent backward rolls
                x1 = _masked_roll(knb, 1, glane)
                x2 = _masked_roll(knb, 2, glane)
                b1 = jnp.where(glane < 2, _neg_roll(knb, 1), 0)
                b2 = jnp.where(glane < 1, _neg_roll(knb, 2), 0)
                pre = x1 + x2
                t = (pre + knb) + (b1 + b2)
                p_state = pos - pre - k
                p_extra = p_state - nb
                both = _extract_c(chunk, cstart, p_extra, knb, g_sec, sec_id)
                nbu = nb.astype(jnp.uint32)
                vbits = (both.astype(jnp.uint32)
                         & ((jnp.uint32(1) << nbu) - 1)).astype(jnp.int32)
                sbits = jnp.where(
                    p_state < 0, 0,
                    (both.astype(jnp.uint32) >> nbu).astype(jnp.int32))
                value = base + vbits
                if masked:
                    active = (se * epoch + j) < num
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

    n_super = ns_ref[pl.program_id(0), 0]
    n_full = ns_ref[pl.program_id(0), 1]

    @pl.when(se < n_super)
    def _run():
        carry = (s_c_ref[:, :], p_c_ref[:, :])
        out = jax.lax.cond(se < n_full, make_body(False), make_body(True),
                           carry)
        s, pos = out[0], out[1]
        for q in range(n_st):
            out_lm_ref[:, pl.ds(q * 128, 128)] = out[2 + 2 * q]
            out_d_ref[:, pl.ds(q * 128, 128)] = out[3 + 2 * q]
        s_c_ref[:, :] = s
        p_c_ref[:, :] = pos
        fs_ref[:, :] = s
        fpos_ref[:, :] = pos


def _group_counts(steps, group, n_se_max, epoch=EPOCH):
    """Per-group dynamic superepoch counts. Column 0 is the trip count;
    column 1 counts the leading superepochs where EVERY block in the group
    is fully active (those run the maskless fast path). The caller sorts
    blocks by size so groups are homogeneous."""
    g2 = steps.reshape(-1, group)
    n_se = jnp.minimum((jnp.max(g2, axis=1) + epoch - 1) // epoch, n_se_max)
    n_full = jnp.minimum(jnp.min(g2, axis=1) // epoch, n_se)
    return jnp.stack([n_se, n_full], axis=1).astype(jnp.int32)


def _untangle(out, B, g_sec, n_se_max, epoch=EPOCH):
    """Section-major store layout -> per-block rows.

    out is (B/G, S*128) where store tile t, lane g*sw + j holds block
    (row*G + g)'s value for step t*sw + (sw-1-j)."""
    sw = 128 // g_sec
    s_tot = n_se_max * (epoch // sw)
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


@functools.partial(jax.jit, static_argnames=("n_steps", "epoch"))
def decode_literals_pallas(u3, win_words, init_states, init_pos, num,
                           tot, n_steps: int, epoch: int = EPOCH_LIT):
    """Batched 4-lane literal decode.

    u3: (B, 384) int32 compact table (byte-packed symbols + per-symbol
    halfword aux — see table_build.build_decode_tables_v3); win_words:
    (B, W) int32 LE words of the padded literal payload (W >= 256,
    >= payload words + 3); init_states: (B, 128) int32 (lanes 0..3, zeros
    elsewhere); init_pos/num: (B, 128) int32 broadcast; tot: (B,) int32
    per-block U-weight totals (states >= tot self-latch,
    decoder.rs:327-334). B must be a multiple of R_ROWS. Returns (packed
    literals (B, >=n_steps) int32, final_states (B, 128),
    final_pos (B, 128))."""
    B, W = win_words.shape
    assert B % R_ROWS == 0
    assert W >= 256
    RS, G = R_SUB, _pick_g(W, False)
    rows = RS * G
    # rounded to 8 superepochs so the untangled width (n_se_max * 48) stays
    # 128-word divisible for downstream row compaction; the extra
    # superepochs never run (dynamic per-group trip counts). Single-epoch
    # calls (tests, tiny streams) skip the rounding — nothing compacts them
    n_se_max = (n_steps + epoch - 1) // epoch
    if n_steps > epoch:
        n_se_max = -(-n_se_max // 8) * 8
    n_st = epoch // (128 // G)
    n_cols = n_se_max * n_st * 128
    grid = (B // rows, n_se_max)
    steps = (num[:, 0] + 3) // 4
    ns = _group_counts(steps, rows, n_se_max, epoch)
    ns_shape = (B // rows, 2)
    # latch threshold rides in lanes 4..7 of the states input
    states_t = jax.lax.dynamic_update_slice(
        init_states,
        jnp.broadcast_to(tot.astype(jnp.int32)[:, None], (B, 4)), (0, 4))
    kernel = functools.partial(_literal_kernel, g_sec=G, w_words=W,
                               epoch=epoch)
    out, fs, fp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(ns_shape, lambda g, se: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RS, G * 384), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, G * W), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RS, n_st * 128), lambda g, se: (g, se),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // G, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RS, G * 256), jnp.int32),
            pltpu.VMEM((RS, 128), jnp.int32),
            pltpu.VMEM((RS, 128), jnp.int32),
            pltpu.VMEM((RS, 128), jnp.int32),
        ],
    )(ns, u3.reshape(B // G, G * 384),
      win_words.reshape(B // G, G * W), _to_sections(states_t, G),
      _to_sections(init_pos, G), _to_sections(num, G))
    return (_untangle(out, B, G, n_se_max, epoch), _widen(fs, B, G),
            _widen(fp, B, G))


@functools.partial(jax.jit, static_argnames=("n_steps", "epoch"))
def decode_lmds_pallas(v_tab, win_words, init_states, init_pos, num,
                       n_steps: int, epoch: int = EPOCH):
    """Batched 3-lane LMD decode. Shapes as decode_literals_pallas; v
    tables are (B, 384) packed per-state entries (value bases inline; the
    D lane packs the D symbol, whose base the kernel derives
    arithmetically — see table_build.build_decode_tables_v3). Returns
    (lm_packed (B, >=n_steps) int32 = l | m << 16, d (B, >=n_steps)
    int32, final_states, final_pos)."""
    B, W = win_words.shape
    assert B % R_ROWS_LMD == 0
    assert W >= 256
    RS, G = R_SUB, _pick_g(W, True)
    rows = RS * G
    # rounded to 2 superepochs (128-word-divisible width, as the literal
    # wrapper); single-epoch calls skip it
    n_se_max = (n_steps + epoch - 1) // epoch
    if n_steps > epoch:
        n_se_max = -(-n_se_max // 2) * 2
    n_st = epoch // (128 // G)
    n_cols = n_se_max * n_st * 128
    grid = (B // rows, n_se_max)
    ns = _group_counts(num[:, 0], rows, n_se_max, epoch)
    ns_shape = (B // rows, 2)
    kernel = functools.partial(_lmd_kernel, g_sec=G, w_words=W,
                               epoch=epoch)
    lm, dd, fs, fp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(ns_shape, lambda g, se: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RS, G * 384), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, G * W), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RS, n_st * 128), lambda g, se: (g, se),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, n_st * 128), lambda g, se: (g, se),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, 128), lambda g, se: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // G, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B // G, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
            jax.ShapeDtypeStruct((B // G, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((RS, G * 256), jnp.int32),
            pltpu.VMEM((RS, 128), jnp.int32),
            pltpu.VMEM((RS, 128), jnp.int32),
            pltpu.VMEM((RS, 128), jnp.int32),
        ],
    )(ns, v_tab.reshape(B // G, G * 384),
      win_words.reshape(B // G, G * W), _to_sections(init_states, G),
      _to_sections(init_pos, G), _to_sections(num, G))
    return (_untangle(lm, B, G, n_se_max, epoch),
            _untangle(dd, B, G, n_se_max, epoch),
            _widen(fs, B, G), _widen(fp, B, G))
