"""Spec-layer encoder validation.

Golden byte outputs for tiny inputs mirror the reference's frontend unit tests
(frontend_bytes.rs:455-531: exact encoded bytes for 0/1/20/21/4096/4097 zeros
covering the Raw/Vxn/Vx2 selection cutoffs). Corpus roundtrips enforce
decode-identity and compressed size <= the Apple-encoded fixtures.
"""

import pathlib

import numpy as np
import pytest

from lzfse_rust_tpu.spec import container
from lzfse_rust_tpu.spec.frontend import encode_bytes

GOLDEN = {
    0: bytes([0x62, 0x76, 0x78, 0x2D, 0x00, 0x00, 0x00, 0x00,
              0x62, 0x76, 0x78, 0x24]),
    1: bytes([0x62, 0x76, 0x78, 0x2D, 0x01, 0x00, 0x00, 0x00, 0x00,
              0x62, 0x76, 0x78, 0x24]),
    20: bytes([0x62, 0x76, 0x78, 0x2D, 0x14, 0x00, 0x00, 0x00] + [0] * 20
              + [0x62, 0x76, 0x78, 0x24]),
    21: bytes([0x62, 0x76, 0x78, 0x6E, 0x15, 0x00, 0x00, 0x00, 0x0C, 0x00,
               0x00, 0x00, 0x68, 0x01, 0x00, 0xFC, 0x06, 0x00, 0x00, 0x00,
               0x00, 0x00, 0x00, 0x00, 0x62, 0x76, 0x78, 0x24]),
    4096: bytes([0x62, 0x76, 0x78, 0x6E, 0x00, 0x10, 0x00, 0x00, 0x2B, 0x00,
                 0x00, 0x00, 0x68, 0x01, 0x00] + [0xF0, 0xFF] * 15
                + [0xF0, 0x06, 0x06, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
                   0x62, 0x76, 0x78, 0x24]),
    4097: bytes([0x62, 0x76, 0x78, 0x32, 0x01, 0x10, 0x00, 0x00, 0x04, 0x00,
                 0x00, 0x00, 0x00, 0x02, 0x00, 0x70, 0x00, 0x00, 0x00, 0x00,
                 0x00, 0x0C, 0x00, 0x10, 0x83, 0x00, 0x00, 0x00, 0x20, 0x00,
                 0x00, 0x08, 0x8F, 0xC0, 0x23, 0x00, 0x00, 0x00, 0x00, 0x00,
                 0x00, 0x00, 0x00, 0x00, 0xC0, 0xA3, 0xF0, 0x68, 0x3C, 0x1A]
                + [0] * 15 + [0xF0, 0xE8, 0x03, 0x00, 0x00] + [0] * 69
                + [0x22, 0xCB, 0xFF, 0x01, 0x62, 0x76, 0x78, 0x24]),
}


@pytest.mark.parametrize("n", sorted(GOLDEN))
def test_golden_zeros(n):
    assert encode_bytes(b"\x00" * n) == GOLDEN[n]


def test_roundtrip_patterns():
    rng = np.random.default_rng(42)
    cases = [
        b"",
        b"test",
        b"a" * 100,
        bytes(rng.integers(0, 256, 50, dtype=np.uint8)),       # raw
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),     # vn->raw rework
        bytes(rng.integers(0, 4, 3000, dtype=np.uint8)),       # vn compressible
        bytes(rng.integers(0, 4, 30000, dtype=np.uint8)),      # fse
        (b"the quick brown fox " * 3000),                      # fse repetitive
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),    # fse incompressible
    ]
    # period sweep (pattern_5.rs style, small)
    for period in (2, 3, 7, 16, 63):
        base = bytes(rng.integers(0, 256, period, dtype=np.uint8))
        cases.append((base * (9000 // period + 1))[:9000])
    for data in cases:
        enc = encode_bytes(data)
        assert container.decode_bytes(enc) == data


def test_length_sweep():
    # len.rs-style sweep across the raw/vn cutoffs with compressible data.
    pattern = (b"abcabcabcabc" * 400)
    for n in list(range(0, 64)) + [100, 500, 4095, 4096, 4097]:
        data = pattern[:n]
        enc = encode_bytes(data)
        assert container.decode_bytes(enc) == data, n


@pytest.mark.parametrize("name", ["html", "alice29.txt", "fireworks.jpeg"])
def test_corpus_roundtrip_and_size(snappy_dir, name):
    apple = (snappy_dir / f"{name}.lzfse").read_bytes()
    raw = container.decode_bytes(apple)
    enc = encode_bytes(raw)
    assert container.decode_bytes(enc) == raw
    # BASELINE contract: our compressed size <= the reference encoder's.
    assert len(enc) <= len(apple)


def test_api_shapes(tmp_path):
    import io
    import lzfse_rust_tpu as lz
    data = b"hello hello hello hello world" * 1000
    enc = lz.encode_bytes(data)
    assert lz.decode_bytes(enc) == data
    assert lz.probe(enc) == (len(enc), len(data))
    # engine objects
    assert lz.LzfseDecoder().decode_bytes(lz.LzfseEncoder().encode_bytes(data)) == data
    # streaming
    out = io.BytesIO()
    n_raw, n_payload = lz.LzfseRingEncoder().encode(io.BytesIO(data), out)
    assert (n_raw, n_payload) == (len(data), len(out.getvalue()))
    back = io.BytesIO()
    lz.LzfseRingDecoder().decode(io.BytesIO(out.getvalue()), back)
    assert back.getvalue() == data
    # writer/reader adapters
    sink = io.BytesIO()
    w = lz.LzfseWriter(sink)
    for i in range(0, len(data), 777):
        w.write(data[i:i + 777])
    w.close()
    r = lz.LzfseRingDecoder().reader(io.BytesIO(sink.getvalue()))
    got = bytearray()
    while True:
        chunk = r.read(1234)
        if not chunk:
            break
        got += chunk
    assert bytes(got) == data
    # owned-buffer adapters + parallel batch APIs
    wb = lz.LzfseWriterBytes()
    wb.write(data)
    owned = wb.into_bytes()
    assert lz.LzfseReaderBytes(owned).read() == data
    batch = [data, b"", b"abc" * 500]
    encs = lz.encode_many(batch)
    assert encs == [lz.encode_bytes(b) for b in batch]
    assert lz.decode_many(encs) == batch
