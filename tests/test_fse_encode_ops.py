"""Device tANS encode building blocks vs the spec encoder (byte-identical)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lzfse_rust_tpu.base import constants as C
from lzfse_rust_tpu.ops.fse_encode import (build_encode_tables,
                                           encode_literals_batch,
                                           pack_bits_host)
from lzfse_rust_tpu.spec import fse as F
from lzfse_rust_tpu.spec import weights as W
from lzfse_rust_tpu.spec.tables import EncoderTables


def _weights_for(literals):
    return W.weights_from_block(np.zeros((0, 3), np.int32), literals)


def test_e_tables_match_spec():
    rng = np.random.default_rng(8)
    lits = rng.integers(0, 40, 4000).astype(np.uint8)
    w = _weights_for(lits)
    spec_t = EncoderTables(w)
    e_l, e_m, e_d, e_u = build_encode_tables(jnp.asarray(w[None, :], jnp.int32))
    for packed, tab in ((e_l, spec_t.l), (e_m, spec_t.m), (e_d, spec_t.d),
                        (e_u, spec_t.u)):
        p = np.asarray(packed)[0]
        assert ((p & 0x7FFF) - 2048 == tab[:, 0]).all()
        assert (p >> 15 == tab[:, 1]).all()


@pytest.mark.parametrize("n", [4, 400, 4001, 9999])
def test_literal_encode_byte_identical(n):
    rng = np.random.default_rng(n)
    lits = rng.integers(0, 50, n).astype(np.uint8)
    pad = (-n) % 4
    padded = np.concatenate([lits, np.full(pad, lits[0], np.uint8)])
    w = _weights_for(lits)
    want_payload, want_param = F.encode_literals(padded, EncoderTables(w))

    _, _, _, e_u = build_encode_tables(jnp.asarray(w[None, :], jnp.int32))
    n_steps = (len(padded) + 3) // 4
    buf = np.zeros((1, n_steps * 4), np.uint8)
    buf[0, :len(padded)] = padded
    outs, states = encode_literals_batch(
        e_u, jnp.asarray(buf), jnp.asarray([len(padded)], np.int32), n_steps)
    stream = np.asarray(outs)[0].reshape(-1, 2)
    stream = stream[np.asarray(outs)[0].reshape(-1, 2)[:, 1] >= 0]
    payload, off = pack_bits_host(stream)
    assert payload == want_payload
    assert off == want_param.bits
    assert tuple(np.asarray(states)[0]) == want_param.state


@pytest.mark.parametrize("n", [1, 57, 2000])
def test_lmd_encode_byte_identical(n):
    rng = np.random.default_rng(n + 100)
    lmds = np.zeros((n, 3), np.int32)
    lmds[:, 0] = rng.integers(0, C.MAX_L_VALUE + 1, n)
    lmds[:, 1] = rng.integers(0, C.MAX_M_VALUE + 1, n)
    lmds[:, 2] = rng.integers(0, C.MAX_D_VALUE + 1, n)
    lmds[0, 2] = max(lmds[0, 2], 1)
    w = W.weights_from_block(lmds, np.zeros(0, np.uint8))
    want_payload, want_param = F.encode_lmds(lmds, EncoderTables(w))

    from lzfse_rust_tpu.ops.fse_encode import encode_lmds_batch
    e_l, e_m, e_d, _ = build_encode_tables(jnp.asarray(w[None, :], jnp.int32))
    buf = np.zeros((1, n, 3), np.int32)
    buf[0] = lmds
    outs, states = encode_lmds_batch(
        e_l, e_m, e_d, jnp.asarray(buf), jnp.asarray([n], np.int32), n)
    stream = np.asarray(outs)[0].reshape(-1, 2)
    payload, off = pack_bits_host(stream)
    assert b"\x00" * 8 + payload == want_payload
    assert off == want_param.bits
    assert tuple(np.asarray(states)[0]) == want_param.state
