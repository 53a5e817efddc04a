"""Test-kit generators + validating sinks (role of the reference's
test_kit crate: cycle.rs, useq.rs, zeros.rs, seq.rs).

Each generator yields a deterministic byte stream in chunks and doubles as
a validating sink (`expect`) so round-trips can be checked without
materializing the stream — the mechanism behind the reference's huge-data
process tests (test/src/huge.rs)."""

from __future__ import annotations

import numpy as np


class GenBase:
    """Chunked generator + validating-sink protocol."""

    def read(self, n: int) -> bytes:
        raise NotImplementedError

    def expect(self, data: bytes) -> bool:
        """Validating sink: True iff `data` matches the next stream bytes."""
        return self.read(len(data)) == data


class Cycle(GenBase):
    """Repeats 1, 2, ..., 255, 0 (test_kit cycle.rs: wrapping increment)."""

    def __init__(self):
        self._pos = 0

    def read(self, n: int) -> bytes:
        out = (np.arange(self._pos + 1, self._pos + n + 1) % 256
               ).astype(np.uint8)
        self._pos += n
        return out.tobytes()


class Zeros(GenBase):
    def read(self, n: int) -> bytes:
        return bytes(n)


class Useq(GenBase):
    """Up to ~10.9M bytes where every 4-byte subslice is unique
    (test_kit useq.rs — incompressible for the LZ layer by design)."""

    def __init__(self):
        self.u = [1, 2, 3, 0]
        self.n = 0
        self.done = False

    def _next(self):
        if self.n == 4:
            self.u[2] = (self.u[2] + 1) & 0xFF
            if self.u[2] == 0:
                self.u[1] += 1
                self.u[2] = self.u[1] + 1
                if self.u[1] == 0xFE:
                    self.u[0] += 1
                    if self.u[0] == 0xFD:
                        self.done = True
                        return None
                    self.u[1] = self.u[0] + 1
                    self.u[2] = self.u[1] + 1
            self.n = 0
        v = self.u[self.n]
        self.n += 1
        return v

    def read(self, n: int) -> bytes:
        out = bytearray()
        for _ in range(n):
            v = self._next()
            if v is None:
                break
            out.append(v & 0xFF)
        return bytes(out)


class Fibonacci(GenBase):
    """Byte stream of the u32 Fibonacci sequence, little-endian
    (test_kit fibonacci.rs), restarting when the sequence overflows."""

    def __init__(self):
        self._u, self._v = 0, 1
        self._buf = b""

    def read(self, n: int) -> bytes:
        out = bytearray(self._buf)
        while len(out) < n:
            self._u, self._v = self._v, (self._u + self._v) & 0xFFFFFFFF
            if self._u == 0:
                self._u, self._v = 0, 1
                continue
            out += self._u.to_bytes(4, "little")
        self._buf = bytes(out[n:])
        return bytes(out[:n])


class WordSeq(GenBase):
    """Compressible word stream (Seq-with-dictionary spirit; the repo's
    canonical gen_stream shape as a resumable generator)."""

    def __init__(self, seed: int = 9, n_words: int = 64):
        rng = np.random.default_rng(seed)
        self._words = [bytes(rng.integers(97, 123, int(rng.integers(2, 9)),
                                          dtype=np.uint8)) + b" "
                       for _ in range(n_words)]
        self._rng = np.random.default_rng(seed + 1)
        self._buf = b""

    def read(self, n: int) -> bytes:
        out = bytearray(self._buf)
        while len(out) < n:
            out += self._words[int(self._rng.integers(0, len(self._words)))]
        self._buf = bytes(out[n:])
        return bytes(out[:n])


FAMILIES = [("cycle", Cycle), ("zeros", Zeros), ("useq", Useq),
            ("fibonacci", Fibonacci), ("words", WordSeq)]
