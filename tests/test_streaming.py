"""Streaming/process tier tests (the reference's tier 3, scaled down).

huge.rs pipes a deterministic generated stream through two real lzfoo OS
processes with a validating sink; here we pipe a multi-window deterministic
stream through two CLI subprocesses and validate, keeping memory constant.
"""

import hashlib
import io
import pathlib
import subprocess
import sys

import numpy as np

import lzfse_rust_tpu as lz

REPO = pathlib.Path(__file__).resolve().parents[1]


def gen_stream(n: int, seed: int = 9) -> bytes:
    """Deterministic compressible byte stream (test_kit::Seq spirit)."""
    rng = np.random.default_rng(seed)
    words = [bytes(rng.integers(97, 123, rng.integers(2, 9), dtype=np.uint8))
             for _ in range(64)]
    out = bytearray()
    while len(out) < n:
        out += words[int(rng.integers(0, 64))]
        out += b" "
    return bytes(out[:n])


def test_multi_window_stream_roundtrip():
    # > STREAM_CHUNK so several windows are emitted
    data = gen_stream(3 * 0x80000 + 12345)
    sink = io.BytesIO()
    n_raw, n_payload = lz.LzfseRingEncoder().encode(io.BytesIO(data), sink)
    assert n_raw == len(data)
    enc = sink.getvalue()
    assert len(enc) == n_payload
    assert lz.decode_bytes(enc) == data
    # pull-reader drains identically
    r = lz.LzfseRingDecoder().reader(io.BytesIO(enc))
    got = bytearray()
    while True:
        chunk = r.read(65537)
        if not chunk:
            break
        got += chunk
    assert bytes(got) == data


def test_cli_two_process_pipe():
    """gen -> lzfoo -encode -> lzfoo -decode -> hash check across real
    process boundaries (huge.rs:27-43 analog)."""
    data = gen_stream(1 << 20)
    enc = subprocess.run(
        [sys.executable, str(REPO / "lzfoo"), "-encode"], input=data,
        capture_output=True, check=True).stdout
    dec = subprocess.run(
        [sys.executable, str(REPO / "lzfoo"), "-decode"], input=enc,
        capture_output=True, check=True).stdout
    assert hashlib.sha256(dec).digest() == hashlib.sha256(data).digest()
    assert len(enc) < len(data) // 2  # stream is compressible


def test_fuzzed_read_write_boundaries():
    """Random-length read()/write() chunking stresses window edges
    (fuzz_read.rs:8-33, ops.rs:60-71 analog)."""
    rng = np.random.default_rng(17)
    data = gen_stream(300_000, seed=3)
    sink = io.BytesIO()
    w = lz.LzfseWriter(sink)
    pos = 0
    while pos < len(data):
        n = int(rng.integers(1, 50_000))
        w.write(data[pos:pos + n])
        pos += n
    w.close()
    r = lz.LzfseRingDecoder().reader(io.BytesIO(sink.getvalue()))
    got = bytearray()
    while True:
        n = int(rng.integers(1, 70_000))
        chunk = r.read(n)
        if not chunk:
            break
        got += chunk
    assert bytes(got) == data
