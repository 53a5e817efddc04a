"""TpuEncoder — the TPU encode pipeline ("flagship model", encode side).

Division of labor:
  device: match finding — hashing, bucket-sorted candidate generation,
          row-gather LCP extension, FIFO arbitration (ops/match_find_tpu.py).
          This is the reference encoder's hot loop 1 (SURVEY.md §3.1), ~80%
          of encode time, and it is embarrassingly parallel once the
          history-table decision-independence is exploited.
  host:   the cheap sequential greedy/lazy selection scan and block emission
          (spec/frontend.py), preserving the reference's exact semantics —
          output is byte-identical to the scalar encoder's.

Inputs above WINDOW_CAP are chunked into independent match windows (the
streaming-engine semantics: matches confined to a window), keeping device
memory bounded; each window's blocks concatenate in order.
"""

from __future__ import annotations

import numpy as np

from ..base import constants as C
from ..spec import frontend as FE
from ..spec.match_find import MatchStream

# Device match-window geometry. The padded device array N is static (one
# compiled kernel per bucket); chunks leave 128 bytes of pad headroom.
# 1 MiB windows cover the format's max match distance (262139) with room to
# spare. (The earlier v5e runtime faults at >=512K were lax.while_loop in
# the LCP extension, since replaced by a bounded fori_loop.)
WINDOW_N = 1 << 20
WINDOW_CAP = WINDOW_N - 128


def _bucket_pow2(x: int, lo: int = 4096) -> int:
    x = max(x, lo)
    return 1 << (x - 1).bit_length()


class TpuEncoder:
    """Container encoder with device-side match finding."""

    def __init__(self):
        import jax.numpy as jnp
        self._jnp = jnp

    def _device_matches(self, chunk: bytes, vn: bool) -> MatchStream:
        import jax.numpy as jnp
        from ..ops.match_find_tpu import find_matches_device

        n = len(chunk)
        N = min(_bucket_pow2(n + 128), WINDOW_N)
        assert n + 128 <= N
        src_pad = np.zeros(N, dtype=np.uint8)
        src_pad[:n] = np.frombuffer(chunk, dtype=np.uint8)
        pos, cands, lcps = find_matches_device(
            jnp.asarray(src_pad), jnp.int32(n), vn)
        pos = np.asarray(pos).astype(np.int64)
        cands = np.asarray(cands).astype(np.int64)
        lcps = np.asarray(lcps).astype(np.int64)
        src_arr = src_pad[:n]
        from ..ops.match_find_tpu import WINDOW
        from ..spec.match_find import _lcp_backward, _lcp_forward

        # Finish window-saturated LCPs exactly, then arbitrate with the
        # reference's FIFO strict-`>` rule over the 4 recency levels.
        best_len = np.zeros(len(pos), np.int64)
        best_cand = np.zeros(len(pos), np.int64)
        for r in range(cands.shape[0]):
            cand_r, lcp_r = cands[r], lcps[r]
            sat = np.flatnonzero((lcp_r == WINDOW) & (cand_r >= 0)
                                 & (pos + WINDOW < n))
            if len(sat):
                lcp_r[sat] = _lcp_forward(
                    src_arr, pos[sat], cand_r[sat], lcp_r[sat],
                    (n - pos[sat]).astype(np.int64))
            if vn:
                mlen = np.where(lcp_r >= 4, lcp_r,
                                np.where(lcp_r == 3, 3, 0))
            else:
                mlen = np.where(lcp_r >= 4, lcp_r, 0)
            mlen = np.where(cand_r >= 0, mlen, 0)
            take = mlen > best_len
            best_len[take] = mlen[take]
            best_cand[take] = cand_r[take]

        keep = best_len > 0
        pos_k, cand_k, fwd_k = pos[keep], best_cand[keep], best_len[keep]
        back_k = _lcp_backward(src_arr, pos_k, cand_k,
                               np.minimum(cand_k, pos_k))
        order = np.argsort(pos_k, kind="stable")
        return MatchStream(
            pos=pos_k[order], match_pos=cand_k[order],
            fwd_len=fwd_k[order], back_max=back_k[order],
        )

    def encode_bytes(self, src: bytes) -> bytes:
        if len(src) <= C.VN_CUTOFF:
            # small inputs: LZVN/raw host paths (blocks <= 4 KiB by design)
            return FE.encode_bytes(src)
        chunks = [src[i:i + WINDOW_CAP] for i in range(0, len(src), WINDOW_CAP)]
        out = []
        for chunk in chunks:
            if len(chunk) <= C.VN_CUTOFF:
                body = FE.encode_bytes(chunk)[:-4]  # strip EOS
                out.append(body)
                continue
            stream = self._device_matches(chunk, vn=False)
            out.append(self._select_emit(chunk, stream))
        return b"".join(out) + C.MAGIC_EOS.to_bytes(4, "little")

    def _select_emit(self, chunk: bytes, stream: MatchStream) -> bytes:
        """Selection scan + block emission (native fast path, spec fallback).
        Both preserve the reference semantics exactly."""
        try:
            from ..runtime import native
            if native.available():
                rows = np.stack([stream.pos, stream.match_pos,
                                 stream.fwd_len, stream.back_max], axis=1)
                return native.select_emit_fse(chunk, rows)
        except Exception:
            pass
        matches = FE.select_matches(stream, len(chunk))
        arr = np.frombuffer(chunk, dtype=np.uint8)
        blocks: list[bytes] = []

        def emit_block(literals, lmds, n_raw):
            from ..spec import fse as F
            blocks.append(F.encode_block(literals, lmds, n_raw))

        buf = FE.FseBuffer(arr, emit_block)
        FE.emit_lmd_stream(arr, matches, buf)
        return b"".join(blocks)
