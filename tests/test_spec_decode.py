"""Spec-layer decode validation against the reference fixtures.

These fixtures were produced by Apple's reference C lzfse (the external
oracle); hashes are SHA-256 of the decompressed bytes. Passing these pins
bit-exact decode parity. Mirrors the reference's corpus tier
(test/src/data.rs:33-100).
"""

import hashlib
import pathlib

import pytest

from lzfse_rust_tpu.base.errors import DecodeError, FseError
from lzfse_rust_tpu.spec import container


def check_file(path: pathlib.Path):
    want = path.with_suffix(".hash").read_bytes()[:32].hex()
    data = path.read_bytes()
    dec = container.decode_bytes(data)
    assert hashlib.sha256(dec).hexdigest() == want, path.name
    n_payload, n_raw = container.probe(data)
    assert n_payload == len(data)
    assert n_raw == len(dec)


@pytest.mark.parametrize("name", ["raw", "vxn", "vx1", "vx2"])
def test_mutate_fixture_roundtrip(mutate_dir, name):
    check_file(mutate_dir / f"{name}.lzfse")


@pytest.mark.parametrize("name", ["compound", "null"])
def test_special(special_dir, name):
    check_file(special_dir / f"{name}.lzfse")


def test_special_null_vx2_rejected(special_dir):
    # Adversarial fixture: Vx2 header advertising zero weight payload bytes.
    # The reference rejects it in Weights::load_v2 (weights.rs:98-99).
    data = (special_dir / "null.vx2.lzfse").read_bytes()
    with pytest.raises(FseError):
        container.decode_bytes(data)


@pytest.mark.parametrize("name", [
    "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf", "html_x_4",
    "alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
    "geo.protodata", "kppkn.gtb", "Mark.Twain-Tom.Sawyer.txt",
])
def test_snappy_corpus(snappy_dir, name):
    check_file(snappy_dir / f"{name}.lzfse")


def test_synth_corpus(synth_dir):
    for p in sorted(synth_dir.glob("*.lzfse")):
        data = p.read_bytes()
        dec = container.decode_bytes(data)
        n_payload, n_raw = container.probe(data)
        assert n_payload == len(data) and n_raw == len(dec), p.name


def test_trailing_bytes_rejected(mutate_dir):
    data = (mutate_dir / "raw.lzfse").read_bytes()
    with pytest.raises(DecodeError):
        container.decode_bytes(data + b"x")


def test_truncation_rejected(mutate_dir):
    data = (mutate_dir / "vx2.lzfse").read_bytes()
    for cut in (0, 1, 3, 10, 31, 100, len(data) - 1):
        with pytest.raises(DecodeError):
            container.decode_bytes(data[:cut])


def test_empty_container():
    import struct
    from lzfse_rust_tpu.base import constants as C
    assert container.decode_bytes(struct.pack("<I", C.MAGIC_EOS)) == b""
