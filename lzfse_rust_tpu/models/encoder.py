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
        pos, cand, fwd, back, valid = find_matches_device(
            jnp.asarray(src_pad), jnp.int32(n), vn)
        pos = np.asarray(pos)
        valid = np.asarray(valid)
        keep = valid
        pos_k = pos[keep].astype(np.int64)
        cand_k = np.asarray(cand)[keep].astype(np.int64)
        fwd_k = np.asarray(fwd)[keep].astype(np.int64)
        back_k = np.asarray(back)[keep].astype(np.int64)
        # Host fix-up: device LCPs are bounded at DEV_LCP_MAX; finish the
        # rare long runs exactly (spec/match_find galloping LCP).
        from ..ops.match_find_tpu import DEV_LCP_MAX
        from ..spec.match_find import _lcp_backward, _lcp_forward
        src_arr = src_pad[:n]
        long_f = np.flatnonzero((fwd_k >= DEV_LCP_MAX)
                                & (pos_k + fwd_k < n))
        if len(long_f):
            fwd_k[long_f] = _lcp_forward(
                src_arr, pos_k[long_f], cand_k[long_f], fwd_k[long_f],
                (n - pos_k[long_f]).astype(np.int64))
        long_b = np.flatnonzero((back_k >= DEV_LCP_MAX)
                                & (back_k < np.minimum(cand_k, pos_k)))
        if len(long_b):
            back_k[long_b] = _lcp_backward(
                src_arr, pos_k[long_b], cand_k[long_b],
                np.minimum(cand_k, pos_k)[long_b])
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
            matches = FE.select_matches(stream, len(chunk))
            arr = np.frombuffer(chunk, dtype=np.uint8)
            blocks: list[bytes] = []

            def emit_block(literals, lmds, n_raw):
                from ..spec import fse as F
                blocks.append(F.encode_block(literals, lmds, n_raw))

            buf = FE.FseBuffer(arr, emit_block)
            FE.emit_lmd_stream(arr, matches, buf)
            out.append(b"".join(blocks))
        return b"".join(out) + C.MAGIC_EOS.to_bytes(4, "little")
