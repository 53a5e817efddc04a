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
import threading

import numpy as np
import pytest

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


def _stream_decoders():
    """Every available incremental decoder implementation."""
    from lzfse_rust_tpu.spec.streaming import SpecStreamDecoder
    out = [("spec", SpecStreamDecoder)]
    from lzfse_rust_tpu.runtime import native
    if native.available():
        out.append(("native", native.StreamDecoder))
    return out


def _stream_decode(mk, src: bytes, chunk: int) -> bytes:
    dec = mk()
    out = bytearray()
    i = 0
    while i < len(src):
        piece = src[i:i + chunk]
        used = dec.push(piece)
        i += used
        while True:
            got = dec.pull()
            if not got:
                break
            out += got
    while True:
        got = dec.pull()
        if not got:
            break
        out += got
    dec.finish()
    return bytes(out)


def test_incremental_stream_decoders_match_oneshot(snappy_dir, mutate_dir,
                                                   special_dir):
    """Every incremental engine, odd chunk sizes, vs one-shot decode; error
    parity on invalid fixtures (reader_core.rs fill-loop semantics)."""
    files = (sorted(snappy_dir.glob("*.lzfse"))[:4]
             + sorted(mutate_dir.glob("*.lzfse"))
             + sorted(special_dir.glob("*.lzfse")))
    for name, mk in _stream_decoders():
        for p in files:
            src = p.read_bytes()
            try:
                want = lz.decode_bytes(src)
            except Exception:
                want = None
            for chunk in (997, 1 << 16):
                if want is None:
                    try:
                        _stream_decode(mk, src, chunk)
                        raise AssertionError(
                            f"{name}:{p.name} stream missed the error")
                    except AssertionError:
                        raise
                    except Exception:
                        pass  # error parity
                else:
                    got = _stream_decode(mk, src, chunk)
                    assert got == want, f"{name}:{p.name} chunk={chunk}"


def test_stream_decoder_truncation_and_trailing():
    data = gen_stream(200_000, seed=5)
    enc = lz.encode_bytes(data)
    for name, mk in _stream_decoders():
        # truncated: finish() must fail
        dec = mk()
        dec.push(enc[:len(enc) - 7])
        while dec.pull():
            pass
        try:
            dec.finish()
            raise AssertionError(f"{name}: truncation not detected")
        except AssertionError:
            raise
        except Exception:
            pass
        # trailing garbage after EOS must fail
        try:
            _stream_decode(mk, enc + b"xyzw", 4096)
            raise AssertionError(f"{name}: trailing bytes not detected")
        except AssertionError:
            raise
        except Exception:
            pass


def test_reader_is_incremental():
    """The pull reader must not decode ahead of demand: after reading one
    byte of a multi-block container, most of the input must be unconsumed
    (the reference's block-granular ReaderCore pull contract)."""

    class CountingIO(io.BytesIO):
        def __init__(self, data):
            super().__init__(data)
            self.consumed = 0

        def read(self, n=-1):
            out = super().read(n)
            self.consumed += len(out)
            return out

    data = gen_stream(3 * 0x80000)
    enc = lz.encode_bytes(data)
    src = CountingIO(enc)
    r = lz.LzfseRingDecoder().reader(src)
    first = r.read(1)
    assert first == data[:1]
    # one 64KB io chunk (plus one) is the most the reader may have pulled in
    assert src.consumed <= 2 * 65536, (
        f"reader consumed {src.consumed} of {len(enc)} bytes for a 1-byte read")


def test_ring_encode_goldilocks_cross_chunk_matches(snappy_dir):
    """Streaming encode must find matches across chunk boundaries up to the
    format's maximum distance (frontend_ring.rs:44-106 Goldilocks reach):
    on data whose period spans several IO chunks, the streamed output must
    stay within 1% of the one-shot encoder, where window-confined matching
    would be several times larger."""
    from lzfse_rust_tpu.runtime import native

    if not native.available():
        pytest.skip("spec fallback is window-chunked by design")
    base = lz.decode_bytes((snappy_dir / "alice29.txt.lzfse").read_bytes())
    data = (base * 14)[:2_000_000]  # 152KB period crosses 64KB io chunks
    sink = io.BytesIO()
    n_raw, n_payload = lz.LzfseRingEncoder().encode(io.BytesIO(data), sink)
    assert n_raw == len(data) and n_payload == len(sink.getvalue())
    one_shot = lz.encode_bytes(data)
    assert lz.decode_bytes(sink.getvalue()) == data
    assert n_payload <= len(one_shot) * 1.01, \
        f"stream {n_payload} vs one-shot {len(one_shot)}"
    # writer path agrees with the reader path bytes
    w = lz.LzfseWriterBytes()
    for i in range(0, len(data), 50_021):
        w.write(data[i:i + 50_021])
    assert w.into_bytes() == sink.getvalue()


_RSS_CHILD = r"""
import resource, sys, hashlib
sys.path.insert(0, sys.argv[1])
from lzfse_rust_tpu.cli import main
main(sys.argv[2:])
rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
sys.stderr.write(f"PEAK_RSS_KB {rss_kb}\n")
"""


@pytest.mark.slow
def test_huge_stream_constant_memory():
    """4.3 GB generated stream through encode and decode lzfoo processes;
    both must hold peak RSS under 192 MB (huge.rs:19-83 analog — the
    reference decodes 64 GB in 512 KB of state; our bound covers the
    Python interpreter + numpy + the O(1) native stream)."""
    total = 4_300_000_000
    # compressible deterministic block, mutated per-tile so windows differ
    rng = np.random.default_rng(11)
    words = gen_stream(1 << 20, seed=23)
    tile = bytearray(words)

    enc_p = subprocess.Popen(
        [sys.executable, "-c", _RSS_CHILD, str(REPO), "-encode"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE)
    dec_p = subprocess.Popen(
        [sys.executable, "-c", _RSS_CHILD, str(REPO), "-decode"],
        stdin=enc_p.stdout, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE)
    enc_p.stdout.close()

    h_in = hashlib.sha256()
    h_out = hashlib.sha256()
    n_out = 0
    done = threading.Event()

    def drain():
        nonlocal n_out
        while True:
            chunk = dec_p.stdout.read(1 << 20)
            if not chunk:
                break
            h_out.update(chunk)
            n_out += len(chunk)
        done.set()

    t = threading.Thread(target=drain)
    t.start()
    sent = 0
    i = 0
    while sent < total:
        tile[i % len(tile)] = int(rng.integers(0, 256))
        chunk = bytes(tile[:min(len(tile), total - sent)])
        enc_p.stdin.write(chunk)
        h_in.update(chunk)
        sent += len(chunk)
        i += 1
    enc_p.stdin.close()
    t.join(timeout=600)
    assert done.is_set(), "decode pipeline stalled"
    enc_err = enc_p.stderr.read().decode()
    dec_err = dec_p.stderr.read().decode()
    assert enc_p.wait() == 0 and dec_p.wait() == 0

    assert n_out == total
    assert h_out.digest() == h_in.digest()
    for name, err in (("encode", enc_err), ("decode", dec_err)):
        rss_kb = int(err.rsplit("PEAK_RSS_KB", 1)[1].split()[0])
        assert rss_kb < 192 * 1024, f"{name} peak RSS {rss_kb} KB"


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
