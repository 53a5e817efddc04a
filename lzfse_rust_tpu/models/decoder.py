"""TpuDecoder — the batched TPU decode pipeline ("flagship model", decode side).

Architecture (TPU-first redesign of the reference's sequential
block-dispatch loop, src/decode/decoder.rs:72-99):

  host:   container walk -> block descriptors; weight-payload Huffman decode
          (tiny, <=708 bytes/block); LZVN/Raw blocks parsed to row streams
  device: batched tANS table build (ops/table_build.py)
          batched literal + LMD stream scans   (ops/fse_decode.py)
  host:   per-container row/literal flattening
  device: pointer-doubling LZ reconstruction   (ops/lz_rebuild.py)

Every FSE block across every container in the call decodes in parallel;
every output byte of every container resolves in parallel. Throughput scales
with the number of blocks in flight, which is the TPU-native replacement for
the reference's single sequential state machine.

Validity is checked with the same conditions the reference enforces
(final states == defaults, payload underflow, literal/raw-count bounds,
distance bounds); containers that fail any check are re-decoded through the
scalar spec layer so error semantics match exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..base import constants as C
from ..base.errors import BadBlock, DecodeError, PayloadOverflow, PayloadUnderflow
from ..spec import container as spec_container
from ..spec import fse as F
from ..spec import vn as V
from ..spec import weights as W

# Payload pads: fixed static shapes keep one XLA compilation alive across
# calls. Literal payload max = 50000B stream + 8 pad; LMD max = 67508.
LIT_PAYLOAD_PAD = 50016
LMD_PAYLOAD_PAD = 67520
_PAD_TAIL = 8  # window slack


@dataclass
class _FseBlockDesc:
    container: int
    order: int  # position among the container's blocks
    block: F.FseBlock
    weights: np.ndarray
    lit_payload: bytes  # includes leading 8 borrowed/pad bytes
    lmd_payload: bytes  # includes its own leading 8 pad bytes


@dataclass
class _ParsedContainer:
    # per-block entries in stream order: ("fse", fse_index) | rows/literals
    parts: list = field(default_factory=list)
    n_raw: int = 0


_NATIVE_W = None


def _native_mod():
    """The native runtime module, or None when the .so is absent."""
    global _NATIVE_W
    if _NATIVE_W is None:
        try:
            from ..runtime import native
            _NATIVE_W = native if native.available() else False
        except Exception:
            _NATIVE_W = False
    return _NATIVE_W or None


def _weights_v2(payload: bytes) -> np.ndarray:
    """V2 weight Huffman decode — native engine when built (the Python
    nibble loop costs ~0.3ms/block and dominated host parse)."""
    n = _native_mod()
    if n is not None:
        return n.load_weights_v2(payload)
    return W.load_v2(payload)


def _parse_container(src: bytes, ci: int, fse_blocks: list) -> _ParsedContainer:
    """Walk one container, collecting FSE payloads and host-parsed rows."""
    out = _ParsedContainer()
    pos = 0
    n = len(src)
    while True:
        if n - pos < 4:
            raise PayloadUnderflow("container truncated")
        magic = int.from_bytes(src[pos:pos + 4], "little")
        if magic == C.MAGIC_EOS:
            pos += 4
            break
        if magic in (C.MAGIC_VX2, C.MAGIC_VX1):
            if magic == C.MAGIC_VX2:
                block, nw = F.load_v2_header(
                    spec_container._take(src, pos, C.V2_HEADER_SIZE))
                weights = _weights_v2(
                    spec_container._take(src, pos + C.V2_HEADER_SIZE, nw))
                payload_start = pos + C.V2_HEADER_SIZE + nw
            else:
                block = F.load_v1_header(
                    spec_container._take(src, pos, C.V1_HEADER_SIZE))
                weights = W.load_v1(spec_container._take(
                    src, pos + C.V1_HEADER_SIZE, C.V1_WEIGHT_PAYLOAD_BYTES))
                payload_start = pos + C.V1_HEADER_SIZE + C.V1_WEIGHT_PAYLOAD_BYTES
            lit_payload = spec_container._take(
                src, payload_start - 8, block.literal.n_payload_bytes + 8)
            lmd_start = payload_start + block.literal.n_payload_bytes
            lmd_payload = spec_container._take(
                src, lmd_start, block.lmd.n_payload_bytes)
            # BitReader init padding checks (bit_reader.rs:25-27).
            for payload, bits in ((lit_payload, block.literal.bits),
                                  (lmd_payload, block.lmd.bits)):
                if bits and int.from_bytes(payload[-8:], "little") >> (64 - bits):
                    raise DecodeError("BadBitStream")
            out.parts.append(("fse", len(fse_blocks)))
            fse_blocks.append(_FseBlockDesc(
                ci, len(out.parts) - 1, block, weights, lit_payload,
                lmd_payload))
            out.n_raw += block.n_raw_bytes
            pos = lmd_start + block.lmd.n_payload_bytes
        elif magic == C.MAGIC_VXN:
            header = spec_container._take(src, pos, C.VN_HEADER_SIZE)
            n_raw_b = int.from_bytes(header[4:8], "little")
            n_pay = int.from_bytes(header[8:12], "little")
            payload = spec_container._take(src, pos + C.VN_HEADER_SIZE, n_pay)
            rows, lits = V.parse_vn_rows(payload, n_raw_b, n_pay)
            out.parts.append(("rows", rows, lits))
            out.n_raw += n_raw_b
            pos += C.VN_HEADER_SIZE + n_pay
        elif magic == C.MAGIC_RAW:
            header = spec_container._take(src, pos, C.RAW_HEADER_SIZE)
            n_raw_b = int.from_bytes(header[4:8], "little")
            data = spec_container._take(src, pos + C.RAW_HEADER_SIZE, n_raw_b)
            rows = np.array([[n_raw_b, 0, 0]], dtype=np.int32)
            out.parts.append(("rows", rows, data))
            out.n_raw += n_raw_b
            pos += C.RAW_HEADER_SIZE + n_raw_b
        else:
            raise BadBlock(magic)
    if n - pos != 0:
        raise PayloadOverflow("trailing bytes after EOS")
    return out


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bucket(x: int, lo: int = 1) -> int:
    """Round up to a power of two (>= lo) so jit shapes stay cacheable."""
    x = max(x, lo)
    return 1 << (x - 1).bit_length()


import functools


@functools.lru_cache(maxsize=1)
def _substitute_fn():
    import jax
    from ..ops.lz_rebuild import substitute_distances

    @jax.jit
    def go(x):
        return x.at[:, :, 2].set(substitute_distances(x[:, :, 2]))
    return go


def _substitute_jit(lmds):
    """Apply per-block distance zero-substitution on device (jitted)."""
    return _substitute_fn()(lmds)


_PREP_CACHE: dict = {}


def _prep_buffers(B: int, lw: int, mw: int):
    """Reusable host staging buffers for the pallas batch prep (zeroing
    ~60MB of payload arrays per call dominated prep time; stale bytes above
    each row's payload are provably never extracted). decode_many is not
    re-entrant — callers wanting concurrency use separate processes."""
    key = (B, lw, mw)
    bufs = _PREP_CACHE.get(key)
    if bufs is None:
        bufs = (np.zeros((B, C.N_WEIGHTS), np.int32),
                np.zeros((B, lw), np.int32),
                np.zeros((B, mw), np.int32),
                np.zeros((B, 128), np.int32),   # lit states (lanes >=4 stay 0)
                np.zeros((B, 128), np.int32),   # lmd states
                np.zeros(B, np.int32),          # lit pos
                np.zeros(B, np.int32),          # lmd pos
                np.zeros((B, 384), np.int32),   # packed v tables (sorted)
                np.zeros((B, 1024), np.int32))  # packed u tables (sorted)
        _PREP_CACHE[key] = bufs
    return bufs


@functools.lru_cache(maxsize=1)
def _take_rows_fn():
    """Jitted device row-gather (fast on TPU: ~1G rows/s, unlike element
    gathers) used to permute packed tables into size-sorted kernel order."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def take(x, idx):
        return jnp.take(x, idx, axis=0)
    return take


@functools.lru_cache(maxsize=1)
def _unpack_fn():
    """Jitted unpacker for the pallas kernels' packed outputs."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def unpack(lit_packed, lm, d):
        b = lit_packed[:, :, None]
        literals = jnp.concatenate(
            [(b >> 0) & 255, (b >> 8) & 255, (b >> 16) & 255,
             (b >> 24) & 255], axis=2).reshape(lit_packed.shape[0], -1)
        lmds = jnp.stack([lm & 0xFFFF, lm >> 16, d], axis=2)
        return literals.astype(jnp.uint8), lmds
    return unpack


class TpuDecoder:
    """Batched container decoder running the compute path on the JAX device.

    use_pallas selects the Mosaic kernels (ops/pallas_decode.py) for the tANS
    scans; the pure-XLA scans remain as the portable fallback (CPU backend,
    interpret-mode debugging).
    """

    def __init__(self, use_pallas: bool | None = None,
                 use_native_rebuild: bool | None = None):
        import jax
        import jax.numpy as jnp  # deferred so pure-spec users never pay
        self._jnp = jnp
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        if use_native_rebuild is None:
            try:
                from ..runtime import native
                use_native_rebuild = native.available()
            except Exception:
                use_native_rebuild = False
        self.use_native_rebuild = use_native_rebuild

    def decode_many(self, sources: list[bytes],
                    stats: dict | None = None) -> list[bytes]:
        """Decode a batch of containers, block-parallel across all of them.

        `stats`, when given, receives wall-clock seconds per pipeline stage
        (parse / prep / device / flatten / rebuild) — the honest accounting
        the benchmark driver reports. `device` includes the host<->device
        transfer sync, which on tunneled harnesses is dominated by link
        artifacts; bench.py substitutes an in-jit device measurement there.
        """
        import time as _time
        import jax.numpy as jnp
        from ..ops.fse_decode import (bytes_to_windows, decode_literals_batch,
                                      decode_lmds_batch)
        from ..ops.lz_rebuild import lz_rebuild_batch
        from ..ops.table_build import build_decode_tables

        _t0 = _time.perf_counter()

        def _mark(key):
            nonlocal _t0
            t = _time.perf_counter()
            if stats is not None:
                stats[key] = stats.get(key, 0.0) + (t - _t0)
            _t0 = t

        fse_blocks: list[_FseBlockDesc] = []
        parsed = [_parse_container(s, i, fse_blocks)
                  for i, s in enumerate(sources)]
        _mark("parse")

        lit_arr = np.zeros((max(len(fse_blocks), 1), 0), dtype=np.uint8)
        if fse_blocks and self.use_pallas:
            from ..ops.pallas_decode import (R_ROWS, decode_literals_pallas,
                                             decode_lmds_pallas)
            nb = len(fse_blocks)
            B = _bucket(nb, R_ROWS)
            # Sort blocks by per-kernel step count so each kernel row group
            # is homogeneous — the kernels run a dynamic per-group
            # superepoch count, skipping the dead tail of the static cap
            # (corpus literal fill is ~29%, LMD ~67% of the cap).
            lit_num = np.zeros(B, dtype=np.int32)
            lmd_num = np.zeros(B, dtype=np.int32)
            for i, d in enumerate(fse_blocks):
                lit_num[i] = d.block.literal.num
                lmd_num[i] = d.block.lmd.num
            perm_l = np.argsort(-((lit_num + 3) // 4),
                                kind="stable").astype(np.int32)
            perm_m = np.argsort(-lmd_num, kind="stable").astype(np.int32)
            inv_l = np.argsort(perm_l).astype(np.int32)
            inv_m = np.argsort(perm_m).astype(np.int32)

            # Cached np.empty buffers, payloads written straight into their
            # sorted slots. Stale bytes above a row's payload are never
            # extracted (the bit positions only run downward from the
            # stream head and reads are masked), so no bulk zeroing.
            lit_w_total = _round_up(LIT_PAYLOAD_PAD // 4 + 4, 128)
            lmd_w_total = _round_up(LMD_PAYLOAD_PAD // 4 + 4, 128)
            bufs = _prep_buffers(B, lit_w_total, lmd_w_total)
            (weights, lit_words, lmd_words, lit_states, lmd_states,
             lit_pos, lmd_pos, v_tabs, u_tabs) = bufs
            # packed decode tables build host-side at native speed, straight
            # into their sorted slots (they're ~5.6KB/block — cheaper to
            # upload than to build on device); device build is the fallback
            native_tables = _native_mod()
            if native_tables:
                sl_n = inv_l[:nb]
                sm_n = inv_m[:nb]
                lens_l = np.zeros(nb + 1, np.int64)
                lens_m = np.zeros(nb + 1, np.int64)
                lit_st = np.empty((nb, 4), np.int32)
                lmd_st = np.empty((nb, 3), np.int32)
                lit_bits = np.empty(nb, np.int32)
                lmd_bits = np.empty(nb, np.int32)
                for i, d in enumerate(fse_blocks):
                    blk = d.block
                    lens_l[i + 1] = len(d.lit_payload)
                    lens_m[i + 1] = len(d.lmd_payload)
                    lit_st[i] = blk.literal.state
                    lmd_st[i] = blk.lmd.state
                    lit_bits[i] = blk.literal.bits
                    lmd_bits[i] = blk.lmd.bits
                    native_tables.build_tables_into(
                        d.weights, v_tabs[inv_m[i]], u_tabs[inv_l[i]])
                offs_l = np.cumsum(lens_l)
                offs_m = np.cumsum(lens_m)
                native_tables.scatter_rows(
                    b"".join(d.lit_payload for d in fse_blocks), offs_l,
                    sl_n, lit_words)
                native_tables.scatter_rows(
                    b"".join(d.lmd_payload for d in fse_blocks), offs_m,
                    sm_n, lmd_words)
                lit_pos[sl_n] = (lens_l[1:] * 8 - lit_bits).astype(np.int32)
                lmd_pos[sm_n] = (lens_m[1:] * 8 - lmd_bits).astype(np.int32)
                lit_states[sl_n, :4] = lit_st
                lmd_st[:, 1] += C.L_STATES
                lmd_st[:, 2] += C.L_STATES + C.M_STATES
                lmd_states[sm_n, :3] = lmd_st
            else:
                lit_u8 = lit_words.view(np.uint8)
                lmd_u8 = lmd_words.view(np.uint8)
                for i, d in enumerate(fse_blocks):
                    weights[i] = d.weights
                    lp, mp = d.lit_payload, d.lmd_payload
                    sl = inv_l[i]
                    lit_u8[sl, :len(lp)] = np.frombuffer(lp, dtype=np.uint8)
                    lit_u8[sl, len(lp):len(lp) + 8] = 0
                    lit_pos[sl] = len(lp) * 8 - d.block.literal.bits
                    lit_states[sl, :4] = d.block.literal.state
                    sm = inv_m[i]
                    lmd_u8[sm, :len(mp)] = np.frombuffer(mp, dtype=np.uint8)
                    lmd_u8[sm, len(mp):len(mp) + 8] = 0
                    ls = d.block.lmd.state
                    lmd_states[sm, :3] = (ls[0], ls[1] + C.L_STATES,
                                          ls[2] + C.L_STATES + C.M_STATES)
                    lmd_pos[sm] = len(mp) * 8 - d.block.lmd.bits

            def bcast(x):
                return jnp.asarray(
                    np.ascontiguousarray(
                        np.broadcast_to(x[:, None], (B, 128))))

            take = _take_rows_fn()
            if native_tables:
                u_sorted = jnp.asarray(u_tabs)
                v_sorted = jnp.asarray(v_tabs)
            else:
                v_packed, v_base, u_packed = build_decode_tables(
                    jnp.asarray(weights))
                u_sorted = take(u_packed, jnp.asarray(perm_l))
                v_sorted = take(v_packed, jnp.asarray(perm_m))
            lit_pk, lit_fs128, lit_fp128 = decode_literals_pallas(
                u_sorted,
                jnp.asarray(lit_words), jnp.asarray(lit_states),
                bcast(lit_pos), bcast(lit_num[perm_l]),
                C.LITERALS_PER_BLOCK // 4)
            lm_pk, d_pk, lmd_fs128, lmd_fp128 = decode_lmds_pallas(
                v_sorted,
                jnp.asarray(lmd_words), jnp.asarray(lmd_states),
                bcast(lmd_pos), bcast(lmd_num[perm_m]),
                C.LMDS_PER_BLOCK)
            literals, lmds = _unpack_fn()(
                take(lit_pk, jnp.asarray(inv_l)),
                take(lm_pk, jnp.asarray(inv_m)),
                take(d_pk, jnp.asarray(inv_m)))
            lmds = _substitute_jit(lmds)
            _mark("prep")

            # Stream validity (fse_core.rs:132-140 + literals.rs:79-87):
            # final states at defaults, no payload underflow (>= 64 bits of
            # pad remain).
            lit_fs = np.asarray(lit_fs128)[inv_l, :4]
            lit_fp = np.asarray(lit_fp128)[inv_l, 0]
            lit_ok = (lit_fs == 0).all(axis=1)
            lit_ok &= lit_fp >= 64
            lmd_fs_np = np.asarray(lmd_fs128)[inv_m, :3]
            lmd_fp = np.asarray(lmd_fp128)[inv_m, 0]
            lmd_ok = ((lmd_fs_np[:, 0] == 0)
                      & (lmd_fs_np[:, 1] == C.L_STATES)
                      & (lmd_fs_np[:, 2] == C.L_STATES + C.M_STATES))
            lmd_ok &= lmd_fp >= 64
            fse_ok = lit_ok & lmd_ok
            lit_arr = np.asarray(literals)
            lmd_arr = np.asarray(lmds)
            _mark("device")
        elif fse_blocks:
            B = _bucket(len(fse_blocks), 1)
            weights = np.zeros((B, C.N_WEIGHTS), dtype=np.int32)
            weights[:len(fse_blocks)] = np.stack(
                [d.weights for d in fse_blocks])
            litp = np.zeros((B, LIT_PAYLOAD_PAD + _PAD_TAIL), dtype=np.uint8)
            lmdp = np.zeros((B, LMD_PAYLOAD_PAD + _PAD_TAIL), dtype=np.uint8)
            lit_pos = np.full(B, 64, dtype=np.int32)
            lmd_pos = np.full(B, 64, dtype=np.int32)
            lit_states = np.zeros((B, 4), dtype=np.int32)
            lmd_states = np.zeros((B, 3), dtype=np.int32)
            lit_num = np.zeros(B, dtype=np.int32)
            lmd_num = np.zeros(B, dtype=np.int32)
            for i, d in enumerate(fse_blocks):
                lp, mp = d.lit_payload, d.lmd_payload
                litp[i, :len(lp)] = np.frombuffer(lp, dtype=np.uint8)
                lmdp[i, :len(mp)] = np.frombuffer(mp, dtype=np.uint8)
                lit_pos[i] = len(lp) * 8 - d.block.literal.bits
                lmd_pos[i] = len(mp) * 8 - d.block.lmd.bits
                lit_states[i] = d.block.literal.state
                ls = d.block.lmd.state
                lmd_states[i] = (ls[0], ls[1] + C.L_STATES,
                                 ls[2] + C.L_STATES + C.M_STATES)
                lit_num[i] = d.block.literal.num
                lmd_num[i] = d.block.lmd.num

            v_packed, v_base, u_packed = build_decode_tables(
                jnp.asarray(weights))
            if True:
                lit_w = bytes_to_windows(jnp.asarray(litp))
                lmd_w = bytes_to_windows(jnp.asarray(lmdp))
                literals, lit_fs, lit_fp = decode_literals_batch(
                    u_packed, lit_w, jnp.asarray(lit_states),
                    jnp.asarray(lit_pos), jnp.asarray(lit_num),
                    C.LITERALS_PER_BLOCK // 4)
                lmds, lmd_fs, lmd_fp = decode_lmds_batch(
                    v_packed, v_base, lmd_w, jnp.asarray(lmd_states),
                    jnp.asarray(lmd_pos), jnp.asarray(lmd_num),
                    C.LMDS_PER_BLOCK)
            lmds = _substitute_jit(lmds)
            _mark("prep")

            # Stream validity (fse_core.rs:132-140 + literals.rs:79-87):
            # final states at defaults, no payload underflow (>= 64 bits of
            # pad remain).
            lit_ok = (np.asarray(lit_fs) == 0).all(axis=1)
            lit_ok &= np.asarray(lit_fp) >= 64
            lmd_fs_np = np.asarray(lmd_fs)
            lmd_ok = ((lmd_fs_np[:, 0] == 0)
                      & (lmd_fs_np[:, 1] == C.L_STATES)
                      & (lmd_fs_np[:, 2] == C.L_STATES + C.M_STATES))
            lmd_ok &= np.asarray(lmd_fp) >= 64
            fse_ok = lit_ok & lmd_ok
            lit_arr = np.asarray(literals)
            lmd_arr = np.asarray(lmds)
            _mark("device")
        else:
            fse_ok = np.zeros(0, dtype=bool)

        # Flatten each container's parts into one row stream + literal pool.
        results: list[bytes | None] = [None] * len(sources)
        conts: list[tuple[int, np.ndarray, np.ndarray]] = []
        native_jobs: list[tuple[int, np.ndarray, np.ndarray]] = []
        for ci, pc in enumerate(parsed):
            rows_list, lit_list = [], []
            valid = True
            for part in pc.parts:
                if part[0] == "fse":
                    bi = part[1]
                    if not fse_ok[bi]:
                        valid = False
                        break
                    d = fse_blocks[bi]
                    nl = d.block.lmd.num
                    rows = lmd_arr[bi, :nl]
                    # literal-count consistency (fse_core.rs:133)
                    consumed = int(rows[:, 0].sum())
                    if consumed > d.block.literal.num:
                        valid = False
                        break
                    rows_list.append(rows)
                    # Only the literals the rows actually consume enter the
                    # pool: the stored literal count is padded to 4
                    # (literals.rs:135-145) and trailing pads are never
                    # referenced; keeping them would misalign the flattened
                    # cross-block literal indexing.
                    lit_list.append(lit_arr[bi, :consumed])
                else:
                    rows_list.append(part[1])
                    lit_list.append(np.frombuffer(part[2], dtype=np.uint8))
            if not valid:
                # exact error semantics via the scalar spec layer
                if stats is not None:
                    stats["fallbacks"] = stats.get("fallbacks", 0) + 1
                results[ci] = spec_container.decode_bytes(sources[ci])
                continue
            rows = (np.concatenate(rows_list) if rows_list
                    else np.zeros((0, 3), dtype=np.int32))
            lits = (np.concatenate(lit_list) if lit_list
                    else np.zeros(0, dtype=np.uint8))
            if self.use_native_rebuild:
                # hybrid path: entropy decode came from the device, the
                # memory-bound copy-back runs in the native engine
                native_jobs.append((ci, rows, lits))
                continue
            conts.append((ci, rows, lits))

        _mark("flatten")
        if native_jobs:
            # containers are independent — rebuild them in parallel (the
            # ctypes call releases the GIL); the reference is single-threaded
            # here, host parallelism is free capability headroom
            import os
            from concurrent.futures import ThreadPoolExecutor
            from ..runtime import native

            def _job(t):
                ci, rows, lits = t
                try:
                    out = native.rebuild(rows, lits.tobytes(), parsed[ci].n_raw)
                    return ci, (out if len(out) == parsed[ci].n_raw else None)
                except Exception:
                    return ci, None

            if len(native_jobs) == 1:
                it = map(_job, native_jobs)
            else:
                pool = ThreadPoolExecutor(
                    max_workers=min(os.cpu_count() or 1, len(native_jobs)))
                it = pool.map(_job, native_jobs)
            for ci, out in it:
                if out is None:
                    if stats is not None:
                        stats["fallbacks"] = stats.get("fallbacks", 0) + 1
                    out = spec_container.decode_bytes(sources[ci])
                results[ci] = out
            if len(native_jobs) > 1:
                pool.shutdown()
            _mark("rebuild")

        if conts:
            Bc = _bucket(len(conts))
            r_max = _bucket(max(len(r) for _, r, _ in conts), 256)
            l_max = _bucket(max(max(len(li) for _, _, li in conts), 1), 4096)
            n_out = _bucket(max(parsed[ci].n_raw for ci, _, _ in conts) or 1,
                            4096)
            rows_b = np.zeros((Bc, r_max, 3), dtype=np.int32)
            lits_b = np.zeros((Bc, l_max), dtype=np.uint8)
            n_raw_b = np.zeros(Bc, dtype=np.int32)
            for k, (ci, rows, lits) in enumerate(conts):
                rows_b[k, :len(rows)] = rows
                lits_b[k, :len(lits)] = lits
                n_raw_b[k] = parsed[ci].n_raw
            out, ok = lz_rebuild_batch(jnp.asarray(lits_b),
                                       jnp.asarray(rows_b),
                                       jnp.asarray(n_raw_b), n_out)
            out_np = np.asarray(out)
            ok_np = np.asarray(ok)
            for k, (ci, _, _) in enumerate(conts):
                if ok_np[k]:
                    results[ci] = out_np[k, :parsed[ci].n_raw].tobytes()
                else:
                    if stats is not None:
                        stats["fallbacks"] = stats.get("fallbacks", 0) + 1
                    results[ci] = spec_container.decode_bytes(sources[ci])
            _mark("rebuild")
        return results  # type: ignore[return-value]

    def decode_bytes(self, src: bytes) -> bytes:
        return self.decode_many([src])[0]
