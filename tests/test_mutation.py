"""Container-level mutation battery (reference tier 2, test/src/mutate_0.rs).

Bit-flips over canonical fixtures of every block type, through the spec
decoder: every mutation must either decode (flips in don't-care bits) or
raise a typed DecodeError — never crash, hang, or produce unchecked state.
The dense battery (every position x all 8 bits, cross-engine decision
parity) runs under --runslow; the default samples positions.
"""

import pathlib

import pytest

from lzfse_rust_tpu.base.errors import DecodeError
from lzfse_rust_tpu.spec import container as spec


def battery(data: bytes, positions, bits=(0, 3, 7)):
    data = bytearray(data)
    n_err = n_ok = 0
    for i in positions:
        for bit in bits:
            data[i] ^= 1 << bit
            try:
                spec.decode_bytes(bytes(data))
                n_ok += 1
            except DecodeError:
                n_err += 1
            data[i] ^= 1 << bit
    return n_ok, n_err


@pytest.mark.slow
@pytest.mark.parametrize("name", ["raw", "vxn", "vx1", "vx2"])
def test_bit_flip_every_position_dense(mutate_dir, name):
    """Dense battery: every byte position, all 8 bits (mutate_0.rs:24-71).

    Runs through the native engine for speed with decision parity against
    the spec oracle on a deterministic subsample: identical accept/reject
    outcome and identical bytes on accept.
    """
    from lzfse_rust_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime not built")
    data = bytearray((mutate_dir / f"{name}.lzfse").read_bytes())
    n_err = 0
    for i in range(len(data)):
        for bit in range(8):
            data[i] ^= 1 << bit
            mutated = bytes(data)
            try:
                out_n = native.decode_bytes(mutated)
            except DecodeError:
                out_n = None
                n_err += 1
            if (i * 8 + bit) % 17 == 0:  # cross-engine decision parity
                try:
                    out_s = spec.decode_bytes(mutated)
                except DecodeError:
                    out_s = None
                assert (out_n is None) == (out_s is None), \
                    f"{name}@{i}.{bit}: native/spec disagree"
                if out_n is not None:
                    assert out_n == out_s, f"{name}@{i}.{bit}: bytes differ"
            data[i] ^= 1 << bit
    assert n_err > 0


@pytest.mark.parametrize("name", ["raw", "vxn", "vx1", "vx2"])
def test_bit_flip_sampled(mutate_dir, name):
    data = (mutate_dir / f"{name}.lzfse").read_bytes()
    step = max(1, len(data) // 40)
    n_ok, n_err = battery(data, range(0, len(data), step))
    # sanity: the battery exercised both accept and reject paths
    assert n_err > 0


def test_byte_xor_header_region(mutate_dir):
    # dense flips across the header + weight region of the Vx2 fixture —
    # the adversarial surface (header validation, weight totals, latches)
    data = (mutate_dir / "vx2.lzfse").read_bytes()
    battery(data, range(0, min(120, len(data))), bits=(0, 1, 4, 7))


def test_truncations_every_prefix_sampled(mutate_dir):
    data = (mutate_dir / "vxn.lzfse").read_bytes()
    for cut in range(0, len(data), max(1, len(data) // 64)):
        with pytest.raises(DecodeError):
            spec.decode_bytes(data[:cut])


def test_adversarial_fse_states():
    """Craft a Vx2 header advertising out-of-range states/counts; the
    validator must reject before any table work (block.rs:218-341 parity)."""
    from lzfse_rust_tpu.base import constants as C
    from lzfse_rust_tpu.spec import fse as F

    good = F.FseBlock(
        literal=F.LiteralParam(num=4, n_payload_bytes=16, bits=0,
                               state=(0, 0, 0, 0)),
        lmd=F.LmdParam(num=1, n_payload_bytes=12, bits=0, state=(0, 0, 0)),
        n_raw_bytes=4)
    hdr = F.store_v2_header(good, 8)
    F.load_v2_header(hdr)  # sanity

    bad_cases = [
        F.FseBlock(F.LiteralParam(num=5, n_payload_bytes=16, bits=0,
                                  state=(0, 0, 0, 0)), good.lmd, 4),  # %4
        F.FseBlock(good.literal,
                   F.LmdParam(num=1, n_payload_bytes=2, bits=0,
                              state=(0, 0, 0)), 4),  # pay < 8
        F.FseBlock(good.literal,
                   F.LmdParam(num=1, n_payload_bytes=12, bits=0,
                              state=(0, 65, 0)), 4),  # M state range
        F.FseBlock(good.literal, good.lmd, 99999999),  # raw count
    ]
    for blk in bad_cases:
        with pytest.raises(F.FseError):
            blk.validate()
