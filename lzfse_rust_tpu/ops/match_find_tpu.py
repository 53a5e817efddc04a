"""Device-side LZ77 match finding — the TPU encoder's front end.

Exploits the decision-independence of the reference's history table (see
spec/match_find.py): the candidate set of position i is exactly the last
HASH_WIDTH positions j < i hashing to i's bucket, a pure function of the
input. On device:

  1. u32 values + Knuth hash -> bucket per position (elementwise)
  2. stable argsort by bucket; a position's candidates are its 1..4
     predecessors in sorted order with equal bucket (shifted compares —
     no scatter; results stay in sorted order and the host reorders)
  3. forward/backward LCP via 64-byte *row* gathers (XLA:TPU moves gathered
     rows at ~1G rows/s vs ~70M elem/s for scalar gathers) with compare +
     argmax; rare >64-byte runs extend in a while_loop
  4. FIFO-order strict-max arbitration (frontend_bytes.rs:226-229)

Output: per probed position the winning (match_pos, fwd_len, back_max), in
bucket-sorted order. The cheap sequential greedy/lazy selection runs on host
(spec/frontend.py select_matches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..base import constants as C

WINDOW = 64      # bytes compared per LCP round
EXT_ROUNDS = 8   # bounded extension rounds (lax.while_loop over the full
                 # array faults the v5e runtime at >=512K elements; a fixed
                 # fori_loop does not — see CLAUDE.md)
DEV_LCP_MAX = WINDOW * (1 + EXT_ROUNDS)  # lens hitting this bound are
                                         # re-extended exactly on host


def _windows_fwd(src_pad: jnp.ndarray) -> jnp.ndarray:
    """(N,) uint8 -> (N, WINDOW) forward byte windows (materialized shifts)."""
    n = src_pad.shape[0]
    cols = [jnp.roll(src_pad, -k) for k in range(WINDOW)]
    return jnp.stack(cols, axis=1)


def _windows_bwd(src_pad: jnp.ndarray) -> jnp.ndarray:
    """(N, WINDOW) backward windows: row i holds src[i-1], src[i-2], ..."""
    cols = [jnp.roll(src_pad, k + 1) for k in range(WINDOW)]
    return jnp.stack(cols, axis=1)


def _first_mismatch(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    neq = a != b
    any_neq = neq.any(axis=1)
    return jnp.where(any_neq, jnp.argmax(neq, axis=1).astype(jnp.int32),
                     jnp.int32(WINDOW))


def _extend(wf, pos, cand, lens, cap, direction: int):
    """Extend LCPs that filled a whole window, via extra row-gather rounds.

    Bounded at EXT_ROUNDS; results hitting DEV_LCP_MAX are finished exactly
    on the host (models/encoder.py)."""
    def body(i, state):
        lens, active = state
        a = jnp.take(wf, jnp.where(active, pos + direction * lens, 0), axis=0)
        b = jnp.take(wf, jnp.where(active, cand + direction * lens, 0), axis=0)
        step = _first_mismatch(a, b)
        lens = jnp.where(active, jnp.minimum(lens + step, cap), lens)
        active = active & (step == WINDOW) & (lens < cap)
        return lens, active

    active = (lens == WINDOW) & (lens < cap)
    lens, _ = jax.lax.fori_loop(0, EXT_ROUNDS, body, (lens, active))
    return lens


@functools.partial(jax.jit, static_argnames=("vn",))
def find_matches_device(src_pad: jnp.ndarray, n_real: jnp.ndarray, vn: bool):
    """Match pipeline over one (padded) window of input.

    src_pad: (N,) uint8, zero-padded past n_real (N static, bucketable).
    Returns sorted-order arrays (pos, cand, fwd_len, back_max, valid), each
    (N,): `valid` marks real probed positions with a usable candidate match.
    """
    N = src_pad.shape[0]
    s = src_pad.astype(jnp.uint32)
    vals = (s | (jnp.roll(s, -1) << 8) | (jnp.roll(s, -2) << 16)
            | (jnp.roll(s, -3) << 24))
    hv = vals & jnp.uint32(0x00FFFFFF) if vn else vals
    bucket = ((hv * jnp.uint32(C.HASH_MUL))
              >> jnp.uint32(32 - C.HASH_BITS)).astype(jnp.int32)
    # probed positions: 0 .. n_real-4 (frontend_bytes.rs:171-183)
    idx = jnp.arange(N, dtype=jnp.int32)
    probed = idx <= (n_real - 4)
    # push un-probed positions into a reserved bucket so they never match
    bucket = jnp.where(probed, bucket, jnp.int32(1 << C.HASH_BITS))

    order = jnp.argsort(bucket, stable=True).astype(jnp.int32)
    b_sorted = jnp.take(bucket, order)
    pos = order  # position of sorted slot

    max_d = C.VN_MAX_D_VALUE if vn else C.MAX_D_VALUE
    best_len = jnp.zeros(N, dtype=jnp.int32)
    best_cand = jnp.zeros(N, dtype=jnp.int32)
    wf = _windows_fwd(src_pad)
    wb = _windows_bwd(src_pad)
    cap = n_real - pos  # LCP bound: block end (frontend_bytes.rs:253 `max`)

    a = jnp.take(wf, pos, axis=0)
    for r in range(1, C.HASH_WIDTH + 1):
        cand = jnp.roll(order, r)
        same = jnp.roll(b_sorted, r) == b_sorted
        same = same & (jnp.arange(N) >= r)
        ok = same & ((pos - cand) <= max_d) & (cand < pos)
        safe_cand = jnp.where(ok, cand, 0)
        b = jnp.take(wf, safe_cand, axis=0)
        lcp = jnp.minimum(_first_mismatch(a, b), cap)
        lcp = _extend(wf, pos, safe_cand, lcp, cap, 1)
        # match unit: FSE needs >=4; LZVN accepts ==3 (3-byte unit) but only
        # extends when the full u32 matched (vn/object.rs:50-59,
        # frontend_bytes.rs:247-258)
        if vn:
            mlen = jnp.where(lcp >= 4, lcp, jnp.where(lcp == 3, 3, 0))
        else:
            mlen = jnp.where(lcp >= 4, lcp, 0)
        mlen = jnp.where(ok, mlen, 0)
        # FIFO-order strict `>` (recency wins ties): r ascends, so a plain
        # greater-than replicates frontend_bytes.rs:226-229
        take_it = mlen > best_len
        best_len = jnp.where(take_it, mlen, best_len)
        best_cand = jnp.where(take_it, safe_cand, best_cand)

    valid = best_len > 0
    fwd_len = best_len
    # backward extension capped by match_index only; the emission-time
    # literal cap is applied by the host selection scan
    bcap = jnp.where(valid, jnp.minimum(best_cand, pos), 0)
    a = jnp.take(wb, jnp.where(valid, pos, 0), axis=0)
    b = jnp.take(wb, jnp.where(valid, best_cand, 0), axis=0)
    back = jnp.minimum(_first_mismatch(a, b), bcap)
    back = _extend(wb, pos, best_cand, back, bcap, -1)
    back = jnp.where(valid, back, 0)
    return pos, best_cand, fwd_len, back, valid
