"""Pallas TPU kernels for batched tANS stream decode.

Why Pallas: XLA:TPU lowers gathers to ~11-cycle scalarized accesses (~85M
elem/s measured on v5e), which caps the pure-XLA scan pipeline. Mosaic's
within-tile dynamic gather (jnp.take_along_axis along the 128-lane axis)
moves whole (R, 128) lookups in a few cycles, so the full decode loop runs
on-chip at ~3ns per block-step.

Layout (per grid step, R blocks):
  - one block per sublane row; its 4 (literals) / 3 (LMD) interleaved tANS
    states occupy lanes 0..3 / 0..2 of that row
  - tables are (R, n_states) row-major; lookups gather 128-wide chunks and
    select by the state's high bits (the only way around the 128-lane gather
    source limit)
  - the backwards bitstream is read through a (R, 128)-word sliding chunk of
    the payload, refreshed every EPOCH steps by per-row dynamic slices; bit
    positions decrease monotonically (reverse-order stream,
    src/bits/bit_reader.rs), bounding consumption per epoch
  - outputs are packed int32 lanes (4 literals/word; l|m<<16 and d words)
    written with dynamic lane stores; XLA unpacks them elementwise afterwards

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

EPOCH = 64    # steps between chunk refreshes; 64*54 bits = 108 words < 125
SUPER = 128   # steps per aligned output store (two epochs)


def _lookup(tab_ref, state, n_chunks):
    """Gather packed entries: out[r, l] = tab[r, state[r, l]].

    tab_ref is (R, n_chunks*128); the 128-lane gather limit forces a
    chunked gather + select-by-high-bits composition.
    """
    lo = state & 127
    hi = state >> 7
    e = jnp.zeros(state.shape, jnp.int32)
    for c in range(n_chunks):
        g = jnp.take_along_axis(tab_ref[:, c * 128:(c + 1) * 128], lo, axis=1)
        e = jnp.where(hi == c, g, e)
    return e


def _chunk_word(chunk, widx):
    """chunk: (R, 256); widx in [0, 255]: 2-chunk gather-select (the gather
    source is limited to a 128-lane tile)."""
    g_lo = jnp.take_along_axis(chunk[:, :128], widx & 127, axis=1)
    g_hi = jnp.take_along_axis(chunk[:, 128:], widx & 127, axis=1)
    return jnp.where(widx < 128, g_lo, g_hi)


def _extract(chunk, base_vec, pos, n_bits):
    """Extract n_bits ending at bit position pos from the sliding chunk.

    chunk: (R, 256) int32 words covering payload word indices
    [base, base+256); returns int32 bits (zero when pos < 0, mirroring the
    reference's below-buffer zero reads, src/bits/bit_src.rs:35-45).
    """
    p = jnp.maximum(pos, 0)
    widx = jnp.clip((p >> 5) - base_vec, 0, 254)
    wlo = _chunk_word(chunk, widx).astype(jnp.uint32)
    whi = _chunk_word(chunk, widx + 1).astype(jnp.uint32)
    sh = (p & 31).astype(jnp.uint32)
    val = (wlo >> sh) | jnp.where(sh == 0, jnp.uint32(0),
                                  whi << (jnp.uint32(32) - sh))
    nb = n_bits.astype(jnp.uint32)
    bits = (val & ((jnp.uint32(1) << nb) - 1)).astype(jnp.int32)
    return jnp.where(pos < 0, 0, bits)


def _masked_roll(x, shift):
    """Shift lanes up by `shift` (lane l reads lane l-shift), zero-filling."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= shift, pltpu.roll(x, shift, 1), 0)


def _chunk_base(pos, w_words):
    """128-aligned word-index base of the 256-word sliding chunk.

    Alignment is a Mosaic requirement for dynamic lane loads; `w_words` must
    be a multiple of 128 so the clip bound stays aligned. The window covers
    >= 125 words below the current position — an epoch's consumption bound.
    """
    p = jnp.maximum(pos, 0)
    base = ((p >> 5) - 125) & ~127
    return jnp.clip(base, 0, w_words - 256)


def _refresh(pos, win_ref, pos_s_ref, chunk_ref, r_rows, w_words):
    """Reload each row's 256-word sliding chunk around its current position.

    The per-row scalar offsets come from a VMEM round-trip of the position
    vector; the vector-side `base_vec` is recomputed with identical arithmetic
    so scalar and vector views agree exactly.
    """
    pos_s_ref[:, :] = pos
    for r in range(r_rows):
        base = pl.multiple_of(_chunk_base(pos_s_ref[r, 0], w_words), 128)
        chunk_ref[pl.ds(r, 1), :] = win_ref[pl.ds(r, 1), pl.ds(base, 256)]


def _lane0_bcast(x, lane):
    """Broadcast each row's lane-0 value to all lanes (via a lane reduce)."""
    return jnp.sum(jnp.where(lane == 0, x, 0), axis=1, keepdims=True)


def _flip_lanes(x):
    """Reverse the 128 lanes of each row (one within-tile gather)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.take_along_axis(x, 127 - lane, axis=1)


def _literal_kernel(ns_ref, u_tab_ref, win_ref, s_init_ref, pos_ref, num_ref,
                    out_ref, fs_ref, fpos_ref,
                    chunk_ref, pos_s_ref, *, r_rows, n_steps, w_words):
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_rows, 128), 1)
    states0 = s_init_ref[:, :]
    pos0 = pos_ref[:, :]
    num = num_ref[:, :]
    zero_acc = jnp.zeros((r_rows, 128), jnp.int32)

    def make_body(se, masked):
        """One superepoch's compute; `masked=False` compiles the fast path
        for superepochs where every row in the group is fully active (the
        common case in size-sorted groups) — the activity compare and
        freeze-selects elide."""

        def half(h, carry):
            s, pos, acc = carry
            _refresh(pos, win_ref, pos_s_ref, chunk_ref, r_rows, w_words)
            base_vec = _chunk_base(pos, w_words)
            chunk = chunk_ref[:, :]

            def one_step(j, carry):
                s, pos, acc = carry
                ent = _lookup(u_tab_ref, s, 8)
                k = jnp.where(lane < 4, ent & 15, 0)
                sym = (ent >> 4) & 255
                delta = ent >> 12
                # inclusive prefix of k over the 4 stream lanes
                ksum = k + _masked_roll(k, 1)
                ksum = ksum + _masked_roll(ksum, 2)
                p_lane = pos - ksum
                bits = _extract(chunk, base_vec, p_lane, ent & 15)
                # total bits consumed = inclusive k-prefix at lane 3;
                # roll-tree broadcast to lanes 0..3 (cheaper than a full
                # lane min-reduce; lanes >= 4 keep a stale pos, unused)
                t = jnp.where(lane == 3, ksum, 0)
                t = t + pltpu.roll(t, 127, 1)
                t = t + pltpu.roll(t, 126, 1)
                if masked:
                    active = ((se * SUPER + j) * 4) < num
                    new_s = jnp.where(active, bits + delta, s)
                    new_pos = jnp.where(active, pos - t, pos)
                else:
                    new_s = bits + delta
                    new_pos = pos - t
                # pack 4 symbols into one int32 word (valid at lane 0) and
                # shift it into the rolling accumulator; the store flips the
                # lane order once per superepoch — cheaper than a per-step
                # lane-broadcast reduce
                packed = (sym + (_neg_roll(sym, 1) << 8)
                          + (_neg_roll(sym, 2) << 16)
                          + (_neg_roll(sym, 3) << 24))
                acc = jnp.where(lane == 0, packed, pltpu.roll(acc, 1, 1))
                return (new_s, new_pos, acc)

            def step(i, carry):
                # 4x unroll amortizes loop control
                carry = one_step(h * EPOCH + i * 4, carry)
                carry = one_step(h * EPOCH + i * 4 + 1, carry)
                carry = one_step(h * EPOCH + i * 4 + 2, carry)
                return one_step(h * EPOCH + i * 4 + 3, carry)

            return jax.lax.fori_loop(0, EPOCH // 4, step, (s, pos, acc))

        def body(carry):
            s, pos = carry
            return jax.lax.fori_loop(0, SUPER // EPOCH, half,
                                     (s, pos, zero_acc))
        return body

    n_full = ns_ref[pl.program_id(0), 1]

    def superepoch(se, carry):
        s, pos, acc = jax.lax.cond(se < n_full, make_body(se, False),
                                   make_body(se, True), carry)
        out_ref[:, pl.ds(pl.multiple_of(se * SUPER, SUPER), SUPER)] = \
            _flip_lanes(acc)
        return (s, pos)

    # dynamic trip count: this group's blocks were sorted by size, so the
    # scalar-prefetched superepoch count skips the dead tail the static cap
    # would otherwise burn (corpus mean literal fill is ~29% of the cap)
    n_super = ns_ref[pl.program_id(0), 0]
    s, pos = jax.lax.fori_loop(0, n_super, superepoch, (states0, pos0))
    fs_ref[:, :] = s
    fpos_ref[:, :] = pos


def _neg_roll(x, shift):
    """Lane l reads lane l+shift (wraps; wrapped lanes are unused)."""
    return pltpu.roll(x, 128 - shift, 1)


def _lmd_kernel(ns_ref, v_tab_ref, d_base_ref, win_ref, s_init_ref, pos_ref,
                num_ref, out_lm_ref, out_d_ref, fs_ref, fpos_ref,
                chunk_ref, pos_s_ref, *, r_rows, n_steps, w_words):
    lane = jax.lax.broadcasted_iota(jnp.int32, (r_rows, 128), 1)
    d_base_row = d_base_ref[:, :]  # (R, 128): lanes 0..63 = D_BASE_VALUE
    states0 = s_init_ref[:, :]
    pos0 = pos_ref[:, :]
    num = num_ref[:, :]
    zero_acc = jnp.zeros((r_rows, 128), jnp.int32)

    def make_body(se, masked):
        def half(h, carry):
            s, pos, acc_lm, acc_d = carry
            _refresh(pos, win_ref, pos_s_ref, chunk_ref, r_rows, w_words)
            base_vec = _chunk_base(pos, w_words)
            chunk = chunk_ref[:, :]

            def one_step(j, carry):
                s, pos, acc_lm, acc_d = carry
                ent = _lookup(v_tab_ref, s, 3)
                k = jnp.where(lane < 3, ent & 15, 0)
                nb = jnp.where(lane < 3, (ent >> 4) & 15, 0)
                delta = (ent >> 8) & 0x1FF
                # value base: packed inline for the L/M lanes; the D lane
                # packs the D symbol, resolved via the shared 64-entry table
                hi = (ent >> 17) & 0x7FFF
                d_b = jnp.take_along_axis(d_base_row, hi & 63, axis=1)
                base = jnp.where(lane == 2, d_b, hi)
                # stream order per lane i: pull k_i then nb_i, lanes 0,1,2.
                # The pulls are bit-adjacent ([extra][state] upward), so one
                # (k+nb)-bit extract serves both (k+nb <= 23 fits a funnel).
                knb = k + nb
                # exclusive prefix: pre_i = sum_{j<i} knb_j
                pre = _masked_roll(knb, 1) + _masked_roll(knb, 2)
                p_state = pos - pre - k
                p_extra = p_state - nb
                both = _extract(chunk, base_vec, p_extra, knb)
                nbu = nb.astype(jnp.uint32)
                vbits = (both.astype(jnp.uint32)
                         & ((jnp.uint32(1) << nbu) - 1)).astype(jnp.int32)
                sbits = jnp.where(
                    p_state < 0, 0,
                    (both.astype(jnp.uint32) >> nbu).astype(jnp.int32))
                value = base + vbits
                # total consumed = inclusive (k+nb)-prefix at lane 2;
                # roll-tree broadcast to lanes 0..2 (see literal kernel)
                t = jnp.where(lane == 2, pre + knb, 0)
                t = t + pltpu.roll(t, 127, 1)
                t = t + pltpu.roll(t, 126, 1)
                if masked:
                    active = (se * SUPER + j) < num
                    new_s = jnp.where(active, sbits + delta, s)
                    new_pos = jnp.where(active, pos - t, pos)
                    value = jnp.where(active, value, 0)
                else:
                    new_s = sbits + delta
                    new_pos = pos - t
                lm = value + (_neg_roll(value, 1) << 16)   # l | m << 16
                d_v = _neg_roll(value, 2)
                acc_lm = jnp.where(lane == 0, lm, pltpu.roll(acc_lm, 1, 1))
                acc_d = jnp.where(lane == 0, d_v, pltpu.roll(acc_d, 1, 1))
                return (new_s, new_pos, acc_lm, acc_d)

            def step(i, carry):
                carry = one_step(h * EPOCH + i * 4, carry)
                carry = one_step(h * EPOCH + i * 4 + 1, carry)
                carry = one_step(h * EPOCH + i * 4 + 2, carry)
                return one_step(h * EPOCH + i * 4 + 3, carry)

            return jax.lax.fori_loop(0, EPOCH // 4, step,
                                     (s, pos, acc_lm, acc_d))

        def body(carry):
            s, pos = carry
            return jax.lax.fori_loop(0, SUPER // EPOCH, half,
                                     (s, pos, zero_acc, zero_acc))
        return body

    n_full = ns_ref[pl.program_id(0), 1]

    def superepoch(se, carry):
        s, pos, acc_lm, acc_d = jax.lax.cond(
            se < n_full, make_body(se, False), make_body(se, True), carry)
        off = pl.multiple_of(se * SUPER, SUPER)
        out_lm_ref[:, pl.ds(off, SUPER)] = _flip_lanes(acc_lm)
        out_d_ref[:, pl.ds(off, SUPER)] = _flip_lanes(acc_d)
        return (s, pos)

    n_super = ns_ref[pl.program_id(0), 0]
    s, pos = jax.lax.fori_loop(0, n_super, superepoch, (states0, pos0))
    fs_ref[:, :] = s
    fpos_ref[:, :] = pos


R_ROWS = 64      # literal-kernel rows per grid step. Loop overhead
                 # amortizes with R up to ~64; R=96 measured ~10% slower
                 # per block; R=32 measured 0.43 vs 0.53 GB/s.
R_ROWS_LMD = 32  # the LMD kernel's larger payload window + two outputs
                 # exceed the 16MB scoped-VMEM limit double-buffered at
                 # R=64 (18.8MB); 32 rows fit with headroom.


@functools.partial(jax.jit, static_argnames=("n_steps",))
def decode_literals_pallas(u_tab, win_words, init_states, init_pos, num,
                           n_steps: int):
    """Batched 4-lane literal decode.

    u_tab: (B, 1024) packed int32; win_words: (B, W) uint32 LE words of the
    padded literal payload; init_states: (B, 128) int32 (lanes 0..3);
    init_pos/num: (B, 128) int32 broadcast. B must be a multiple of R_ROWS.
    Returns (packed literals (B, n_steps) int32, final_states (B, 128),
    final_pos (B, 128)).
    """
    B, W = win_words.shape
    assert B % R_ROWS == 0
    grid = (B // R_ROWS,)
    n_out = (n_steps + SUPER - 1) // SUPER * SUPER
    # per-group dynamic superepoch counts from the actual literal fill; the
    # caller sorts blocks by size so groups are homogeneous. Column 0 is the
    # trip count; column 1 counts the leading superepochs where EVERY row is
    # fully active (they run the maskless fast path).
    steps = (num[:, 0] + 3) // 4
    g2 = steps.reshape(-1, R_ROWS)
    n_sup = jnp.minimum((jnp.max(g2, axis=1) + SUPER - 1) // SUPER,
                        n_out // SUPER)
    n_full = jnp.minimum(jnp.min(g2, axis=1) // SUPER, n_sup)
    ns = jnp.stack([n_sup, n_full], axis=1).astype(jnp.int32)
    ns_shape = (B // R_ROWS, 2)
    kernel = functools.partial(_literal_kernel, r_rows=R_ROWS,
                               n_steps=n_steps, w_words=W)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(ns_shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R_ROWS, 1024), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_ROWS, n_out), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R_ROWS, 256), jnp.int32),
            pltpu.VMEM((R_ROWS, 128), jnp.int32),
        ],
    )(ns, u_tab, win_words, init_states, init_pos, num)


@functools.partial(jax.jit, static_argnames=("n_steps",))
def decode_lmds_pallas(v_tab, win_words, init_states, init_pos, num,
                       n_steps: int):
    """Batched 3-lane LMD decode. Shapes as decode_literals_pallas; v tables
    are (B, 384) packed entries (value bases inline; the D lane resolves its
    base through a broadcast 64-entry table). Returns (lm_packed (B,
    n_steps) int32 = l | m << 16, d (B, n_steps) int32, final_states,
    final_pos)."""
    import numpy as _np

    from ..base import constants as _C

    B, W = win_words.shape
    assert B % R_ROWS_LMD == 0
    grid = (B // R_ROWS_LMD,)
    n_out = (n_steps + SUPER - 1) // SUPER * SUPER
    g2 = num[:, 0].reshape(-1, R_ROWS_LMD)
    n_sup = jnp.minimum((jnp.max(g2, axis=1) + SUPER - 1) // SUPER,
                        n_out // SUPER)
    n_full = jnp.minimum(jnp.min(g2, axis=1) // SUPER, n_sup)
    ns = jnp.stack([n_sup, n_full], axis=1).astype(jnp.int32)
    d_base_host = _np.zeros((B, 128), _np.int32)
    d_base_host[:, :_C.D_SYMBOLS] = _C.D_BASE_VALUE
    d_base = jnp.asarray(d_base_host)
    ns_shape = (B // R_ROWS_LMD, 2)
    kernel = functools.partial(_lmd_kernel, r_rows=R_ROWS_LMD, n_steps=n_steps,
                               w_words=W)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(ns_shape, lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R_ROWS_LMD, 384), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_ROWS_LMD, n_out), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, n_out), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_ROWS_LMD, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_out), jnp.int32),
            jax.ShapeDtypeStruct((B, n_out), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R_ROWS_LMD, 256), jnp.int32),
            pltpu.VMEM((R_ROWS_LMD, 128), jnp.int32),
        ],
    )(ns, v_tab, d_base, win_words, init_states, init_pos, num)
