"""Generator-family round-trips with validating sinks (test_kit tier).

Streams each family through the streaming encoder and back through the
streaming decoder into a validating sink — nothing materialized whole,
mirroring the reference's generator/validator pattern (test/src/huge.rs
buddy loop at modest sizes). Sizes straddle block and window boundaries.
"""

import io

import pytest

import lzfse_rust_tpu as lz

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from kit import FAMILIES


@pytest.mark.parametrize("name,cls", FAMILIES)
@pytest.mark.parametrize("size", [0, 1, 4000, 70_000, 1_500_000])
def test_family_stream_roundtrip_validated(name, cls, size):
    gen = cls()
    enc_sink = io.BytesIO()
    w = lz.LzfseWriterBytes()
    left = size
    while left:
        chunk = gen.read(min(left, 61_441))
        if not chunk:
            break
        w.write(chunk)
        left -= len(chunk)
    produced = size - left
    enc = w.into_bytes()

    validator = cls()
    r = lz.LzfseRingDecoder().reader_bytes(enc)
    total = 0
    while True:
        chunk = r.read(49_999)
        if not chunk:
            break
        assert validator.expect(chunk), \
            f"{name}: stream diverged near byte {total}"
        total += len(chunk)
    assert total == produced


@pytest.mark.parametrize("name,cls", FAMILIES)
def test_family_one_shot_matches_engines(name, cls):
    """One-shot encode of each family agrees across engines and sizes stay
    sane (zeros/cycle compress massively; useq is LZ-incompressible)."""
    data = cls().read(120_000)
    enc = lz.encode_bytes(data)
    assert lz.decode_bytes(enc) == data
    from lzfse_rust_tpu.spec import container as spec
    assert spec.decode_bytes(enc) == data
    if name in ("zeros", "cycle"):
        assert len(enc) < len(data) // 50
