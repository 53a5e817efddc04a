"""Exhaustive LZVN opcode-space decode sweep (reference: src/vn/opc.rs:242-388).

Every first-byte opcode 0..=255 is exercised with several operand variants
inside a real container. A minimal local grammar model (mirroring the
opcode table the reference tests against) predicts the op's class and
output size; the assertions are:

  - ops the grammar defines decode to the model-predicted byte count, and
    the spec + native one-shot + native streaming engines agree bytewise;
  - Udef ops and malformed operands error in EVERY engine (decision parity).
"""

import pytest

from lzfse_rust_tpu.base.errors import DecodeError
from lzfse_rust_tpu.spec import container as spec


def _op_class(op: int):
    """(kind, consumed_extra, l, m, d_source) per the LZVN grammar.

    kind: 'eos' | 'nop' | 'udef' | 'lit' | 'match' | 'dmatch'
    d_source: 'small' | 'medium' | 'large' | 'prev' | None
    """
    if op >= 0xF0:
        if op == 0xF0:
            return ("match", 1, 0, None, None)  # m = b1 + 16
        return ("match", 0, 0, op & 0xF, None)
    if op >= 0xE0:
        if op == 0xE0:
            return ("lit", 1, None, 0, None)    # l = b1 + 16
        return ("lit", 0, op & 0xF, 0, None)
    if 0xA0 <= op <= 0xBF:
        return ("dmatch", 2, (op >> 3) & 3, None, "medium")
    if (0x70 <= op <= 0x7F) or (0xD0 <= op <= 0xDF):
        return ("udef", 0, 0, 0, None)
    if (op & 7) == 7:
        return ("dmatch", 2, (op >> 6) & 3, ((op >> 3) & 7) + 3, "large")
    if (op & 7) == 6:
        if op == 0x06:
            return ("eos", 7, 0, 0, None)
        if op in (0x0E, 0x16):
            return ("nop", 0, 0, 0, None)
        if op in (0x1E, 0x26, 0x2E, 0x36, 0x3E):
            return ("udef", 0, 0, 0, None)
        return ("dmatch", 0, (op >> 6) & 3, ((op >> 3) & 7) + 3, "prev")
    return ("dmatch", 1, (op >> 6) & 3, ((op >> 3) & 7) + 3, "small")


def _engines():
    from lzfse_rust_tpu.runtime import native
    out = [("spec", spec.decode_bytes)]
    if native.available():
        out.append(("native", native.decode_bytes))

        def stream(src):
            d = native.StreamDecoder()
            outb = bytearray()
            i = 0
            while i < len(src):
                i += d.push(src[i:i + 97])
                while True:
                    g = d.pull()
                    if not g:
                        break
                    outb += g
            while True:
                g = d.pull()
                if not g:
                    break
                outb += g
            d.finish()
            return bytes(outb)

        out.append(("stream", stream))
    return out


def _prelude():
    """Ops producing ~17.6KB of output and a previous distance of 1."""
    p = bytearray()
    p += bytes([0xE0, 0xFF]) + bytes(range(256)) + bytes(15)  # LrgL 271
    p += bytes([0x00, 0x01])  # SmlD: l=0 m=3 d=1
    produced = 271 + 3
    for _ in range(64):
        p += bytes([0xF0, 0xFF])  # LrgM m=271 at d=1
        produced += 271
    return bytes(p), produced, 1


def _build(op: int, operands: bytes):
    """Container with the op under test; returns (bytes, expected_n_raw or
    None if the op/operands are malformed by the grammar model)."""
    pre, produced, dist = _prelude()
    kind, extra, l, m, dsrc = _op_class(op)
    body = bytearray(pre)
    expect = produced
    ok = True
    opbytes = bytes([op]) + operands[:extra]
    if kind == "eos":
        # EOS mid-payload: trailing ops after it must make every engine error
        ok = False
        body += bytes([op]) + bytes(7)
    elif kind == "udef":
        ok = False
        body += opbytes
    elif kind == "nop":
        body += opbytes
    elif kind == "lit":
        n_l = (operands[0] + 16) if extra else l
        body += opbytes + bytes((i * 7) & 0xFF for i in range(n_l))
        expect += n_l
    elif kind == "match":
        n_m = (operands[0] + 16) if extra else m
        if n_m == 0 and op != 0xF0:
            n_m = m
        body += opbytes
        expect += n_m
    else:  # dmatch
        if dsrc == "medium":
            opu = op | (operands[0] << 8) | (operands[1] << 16)
            m = (((opu & 7) << 2) | ((opu >> 8) & 3)) + 3
            d = (opu >> 10) & 0x3FFF
        elif dsrc == "large":
            d = operands[0] | (operands[1] << 8)
        elif dsrc == "small":
            d = ((op & 7) << 8) | operands[0]
        else:
            d = dist
        body += opbytes + bytes((i * 3) & 0xFF for i in range(l))
        expect += l + m
        if d == 0 or d > produced + l:
            ok = False
    body += bytes([0x06]) + bytes(7)  # EOS op
    n_raw = expect
    hdr = (0x6E76787662 & 0).to_bytes(0, "little")  # placeholder
    import lzfse_rust_tpu.base.constants as C
    container = (C.MAGIC_VXN.to_bytes(4, "little")
                 + n_raw.to_bytes(4, "little")
                 + len(body).to_bytes(4, "little")
                 + bytes(body)
                 + C.MAGIC_EOS.to_bytes(4, "little"))
    return container, (n_raw if ok else None)


VARIANTS = [bytes([0x01, 0x00]), bytes([0x20, 0x01]), bytes([0xFF, 0x03])]


@pytest.mark.parametrize("opbase", range(0, 256, 32))
def test_vn_opcode_space(opbase):
    engines = _engines()
    for op in range(opbase, opbase + 32):
        for operands in VARIANTS:
            src, expect = _build(op, operands)
            results = []
            for name, fn in engines:
                try:
                    results.append((name, fn(src)))
                except (DecodeError, Exception) as e:
                    if not isinstance(e, DecodeError):
                        raise
                    results.append((name, None))
            base = results[0][1]
            for name, got in results[1:]:
                assert (got is None) == (base is None), \
                    f"op {op:#x} {operands.hex()}: {name} disagrees with spec"
                if base is not None:
                    assert got == base, f"op {op:#x}: {name} bytes differ"
            if expect is None:
                assert base is None, \
                    f"op {op:#x} {operands.hex()}: model says error, decoded"
            else:
                assert base is not None and len(base) == expect, \
                    f"op {op:#x} {operands.hex()}: size {len(base) if base else None} != {expect}"
