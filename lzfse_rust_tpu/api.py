"""Public API objects: buffer engines, streaming engines, IO adapters.

Mirrors the four API shapes of the reference (src/lib.rs:138-142):
one-shot bytes, reusable engine objects, push-style writer, pull-style reader.

Backend selection: the native C++ runtime when built, otherwise the spec
layer. The TPU batch engines live in `lzfse_rust_tpu.models` and are exposed
via the `tpu_*` functions for explicitly batched workloads.
"""

from __future__ import annotations

import io
from typing import BinaryIO

from .spec import container as _spec_container
from .spec import frontend as _spec_frontend

# Streaming window: matches confined to chunks of this size keep memory
# bounded for unbounded streams, mirroring the ring encoder's 512KB window
# semantics (src/encode/frontend_ring.rs:44-106).
STREAM_CHUNK = 0x80000


def _native():
    """Return the native runtime module or None."""
    try:
        from .runtime import native
        return native if native.available() else None
    except Exception:
        return None


def encode_bytes(src: bytes) -> bytes:
    """One-shot buffer encode (reference: src/encode/mod.rs:58)."""
    if len(src) > 0x7FFFFFFF:
        raise NotImplementedError(
            ">2GB single-buffer inputs (BLOCK_GUIDE windowing) are not yet "
            "supported; use the streaming engine")
    n = _native()
    if n is not None:
        return n.encode_bytes(src)
    return _spec_frontend.encode_bytes(src)


def decode_bytes(src: bytes) -> bytes:
    """One-shot buffer decode (reference: src/decode/mod.rs:49)."""
    n = _native()
    if n is not None:
        return n.decode_bytes(src)
    return _spec_container.decode_bytes(src)


def decode_many(sources, max_workers: int | None = None) -> list[bytes]:
    """Decode a batch of independent containers in parallel on the host.

    The native runtime releases the GIL during calls, so a thread pool
    scales across cores; results are byte-identical to sequential decodes.
    (For accelerator-batched decode use models.decoder.TpuDecoder.)
    """
    from concurrent.futures import ThreadPoolExecutor
    sources = list(sources)
    if len(sources) <= 1 or _native() is None:
        return [decode_bytes(s) for s in sources]
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(decode_bytes, sources))


def encode_many(sources, max_workers: int | None = None) -> list[bytes]:
    """Encode a batch of independent buffers in parallel on the host.

    Each output is byte-identical to its sequential encode_bytes result.
    """
    from concurrent.futures import ThreadPoolExecutor
    sources = list(sources)
    if len(sources) <= 1 or _native() is None:
        return [encode_bytes(s) for s in sources]
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(encode_bytes, sources))


def probe(src: bytes) -> tuple[int, int]:
    """Return (n_payload_bytes, n_raw_bytes) without decompressing
    (reference: src/decode/probe.rs:11-35)."""
    return _spec_container.probe(src)


class LzfseEncoder:
    """Reusable buffer encoder (reference: LzfseEncoder, encoder.rs:14-58)."""

    def encode_bytes(self, src: bytes) -> bytes:
        return encode_bytes(src)


class LzfseDecoder:
    """Reusable buffer decoder (reference: LzfseDecoder, decoder.rs:17-99)."""

    def decode_bytes(self, src: bytes) -> bytes:
        return decode_bytes(src)


class LzfseRingEncoder:
    """Streaming encoder over IO objects (reference: LzfseRingEncoder).

    Reads `reader` to EOF in windows, emitting an independent chunk stream:
    matches are confined to each window, so memory stays bounded for
    arbitrarily large streams. Returns (n_raw_bytes, n_payload_bytes), the
    byte accounting contract of ring_encoder.rs:55-67.
    """

    def writer(self, inner: BinaryIO) -> "LzfseWriter":
        """Push-encoder writing into an IO stream (ring_encoder writer)."""
        return LzfseWriter(inner)

    def writer_bytes(self) -> "LzfseWriterBytes":
        """Push-encoder accumulating into an owned buffer (writer_bytes)."""
        return LzfseWriterBytes()

    def encode(self, reader: BinaryIO, writer: BinaryIO) -> tuple[int, int]:
        from .base import constants as C
        n_raw = 0
        n_payload = 0
        first = True
        pending = b""
        while True:
            chunk = reader.read(STREAM_CHUNK)
            if not chunk and not first and not pending:
                break
            data = pending + chunk
            pending = b""
            if not data and first:
                out = _spec_frontend.encode_bytes(b"")
                writer.write(out)
                return 0, len(out)
            first = False
            body = _encode_chunk_body(data)
            writer.write(body)
            n_raw += len(data)
            n_payload += len(body)
            if not chunk:
                break
        eos = C.MAGIC_EOS.to_bytes(4, "little")
        writer.write(eos)
        return n_raw, n_payload + 4


def _encode_chunk_body(data: bytes) -> bytes:
    """Encode one window's blocks without the container EOS."""
    from .base import constants as C
    full = encode_bytes(data)
    assert full[-4:] == C.MAGIC_EOS.to_bytes(4, "little")
    return full[:-4]


class LzfseRingDecoder:
    """Streaming decoder over IO objects (reference: LzfseRingDecoder)."""

    def decode(self, reader: BinaryIO, writer: BinaryIO) -> tuple[int, int]:
        src = reader.read()
        out = decode_bytes(src)
        writer.write(out)
        return len(src), len(out)

    def reader(self, inner: BinaryIO) -> "LzfseReader":
        """Wrap an IO stream in a pull-decoder (ring_decoder.rs reader)."""
        return LzfseReader(inner)

    def reader_bytes(self, data: bytes) -> "LzfseReaderBytes":
        """Pull-decoder over an in-memory buffer (reader_bytes)."""
        return LzfseReaderBytes(data)


class LzfseWriter(io.RawIOBase):
    """Push-style compressing writer (reference: LzfseWriter, writer.rs:39-75).

    Bytes written are buffered into stream windows and compressed on the fly;
    `close()` finalizes the container with the EOS magic.
    """

    def __init__(self, inner: BinaryIO):
        super().__init__()
        self._inner = inner
        self._buf = bytearray()
        self._finalized = False

    def writable(self) -> bool:
        return True

    def write(self, data) -> int:
        self._buf += bytes(data)
        while len(self._buf) >= STREAM_CHUNK:
            window = bytes(self._buf[:STREAM_CHUNK])
            del self._buf[:STREAM_CHUNK]
            self._inner.write(_encode_chunk_body(window))
        return len(data)

    def close(self) -> None:
        if not self._finalized:
            from .base import constants as C
            if self._buf:
                self._inner.write(_encode_chunk_body(bytes(self._buf)))
                self._buf.clear()
            self._inner.write(C.MAGIC_EOS.to_bytes(4, "little"))
            self._finalized = True
        super().close()


class LzfseWriterBytes(LzfseWriter):
    """Push-style writer accumulating into an owned buffer (reference:
    LzfseWriterBytes, writer_bytes.rs:44-78). Call .into_bytes() after
    close()."""

    def __init__(self):
        self._buf_out = io.BytesIO()
        super().__init__(self._buf_out)

    def into_bytes(self) -> bytes:
        if not self.closed:
            self.close()
        return self._buf_out.getvalue()


class LzfseReaderBytes(io.RawIOBase):
    """Pull-style reader over an in-memory buffer (reference:
    LzfseReaderBytes)."""

    def __init__(self, data: bytes):
        super().__init__()
        self._decoded = decode_bytes(data)
        self._pos = 0

    def readable(self) -> bool:
        return True

    def read(self, size: int = -1) -> bytes:
        if size is None or size < 0:
            out = self._decoded[self._pos:]
            self._pos = len(self._decoded)
            return out
        out = self._decoded[self._pos:self._pos + size]
        self._pos += len(out)
        return out


class LzfseReader(io.RawIOBase):
    """Pull-style decompressing reader (reference: LzfseReader).

    Decodes one block at a time on demand, mirroring the incremental pull
    semantics of reader_core.rs (block-granular rather than 64KB-granular).
    """

    def __init__(self, inner: BinaryIO):
        super().__init__()
        self._src = inner.read()
        self._decoded = decode_bytes(self._src)
        self._pos = 0

    def readable(self) -> bool:
        return True

    def read(self, size: int = -1) -> bytes:
        if size is None or size < 0:
            out = self._decoded[self._pos:]
            self._pos = len(self._decoded)
            return out
        out = self._decoded[self._pos:self._pos + size]
        self._pos += len(out)
        return out

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[:len(data)] = data
        return len(data)
