"""In-suite Pallas kernel coverage via interpreter mode.

The fast tier forces the CPU backend, so the Mosaic kernels never compile
here; interpret=True executes the same kernel logic (rolls, within-tile
gathers, SMEM dynamic trip counts) in the Pallas interpreter, validating it
against the scalar spec decode of a real reference block. Hardware
bit-exactness over the full corpus is tools/check_corpus_tpu.py.
"""

import pathlib

import numpy as np
import pytest

from lzfse_rust_tpu.base import constants as C

FIXTURE = pathlib.Path("/root/reference/data/mutate/vx2.lzfse")


@pytest.fixture(scope="module")
def block():
    import lzfse_rust_tpu.models.decoder as M
    fse = []
    M._parse_container(FIXTURE.read_bytes(), 0, fse)
    return fse[0]


def _interp(monkeypatch_module, fn_name):
    """Call the pallas wrapper with pallas_call forced to interpret mode."""
    from jax.experimental import pallas as pl
    real = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return real(*a, **k)

    return real, patched


def test_pallas_kernels_interpret_match_spec(block, monkeypatch):
    jnp = pytest.importorskip("jax.numpy")
    import jax
    from jax.experimental import pallas as pl

    import lzfse_rust_tpu.ops.pallas_decode as P
    from lzfse_rust_tpu.spec import fse as F
    from lzfse_rust_tpu.spec import tables as T

    real_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: real_call(*a, **{**k, "interpret": True}))
    # the wrappers are jitted with static n_steps; jit of interpret-mode
    # pallas_call works on CPU
    d = block
    B = P.R_ROWS
    W = 512  # words; enough for this fixture's payloads

    from lzfse_rust_tpu.ops.table_build import build_decode_tables_v3
    weights = np.tile(d.weights.astype(np.int32), (B, 1))
    v_packed, u3, tot = build_decode_tables_v3(jnp.asarray(weights))

    def prep(payload, states, bits, num, n_states_off):
        p = np.zeros((B, W * 4), np.uint8)
        p[:, :len(payload)] = np.frombuffer(payload, np.uint8)
        words = p.view("<i4")
        pos = np.full(B, len(payload) * 8 - bits, np.int32)
        st = np.zeros((B, 128), np.int32)
        st[:, :len(states)] = [s + o for s, o in zip(states, n_states_off)]
        return (jnp.asarray(words.copy()), jnp.asarray(st),
                jnp.asarray(np.repeat(pos[:, None], 128, 1)),
                jnp.asarray(np.full((B, 128), num, np.int32)))

    lw, ls, lp, ln = prep(d.lit_payload, d.block.literal.state,
                          d.block.literal.bits, d.block.literal.num,
                          (0, 0, 0, 0))
    n_steps = (d.block.literal.num + 3) // 4
    lit_pk, fs, fp = P.decode_literals_pallas(u3, lw, ls, lp, ln, tot,
                                              n_steps)
    lit_pk = np.asarray(lit_pk)
    fs = np.asarray(fs)

    # spec oracle
    tabs = T.DecoderTables(d.weights)
    lits = F.decode_literals(d.lit_payload, tabs, d.block.literal)

    got = np.zeros(d.block.literal.num, np.uint8)
    for i in range(d.block.literal.num // 4):
        w = lit_pk[0, i]
        got[4 * i:4 * i + 4] = [(w >> s) & 0xFF for s in (0, 8, 16, 24)]
    assert (fs[0, :4] == 0).all()
    assert np.array_equal(got, np.asarray(lits, np.uint8))

    mw, ms, mp, mn = prep(d.lmd_payload, d.block.lmd.state,
                          d.block.lmd.bits, d.block.lmd.num,
                          (0, C.L_STATES, C.L_STATES + C.M_STATES))
    n_steps_m = d.block.lmd.num
    lm, dd, mfs, mfp = P.decode_lmds_pallas(v_packed, mw, ms, mp, mn,
                                            n_steps_m)
    lm = np.asarray(lm)
    dd = np.asarray(dd)
    mfs = np.asarray(mfs)
    rows = F.decode_lmds(d.lmd_payload, tabs, d.block.lmd)
    nl = d.block.lmd.num
    assert mfs[0, 0] == 0 and mfs[0, 1] == C.L_STATES \
        and mfs[0, 2] == C.L_STATES + C.M_STATES
    assert np.array_equal(lm[0, :nl] & 0xFFFF, rows[:, 0])
    assert np.array_equal(lm[0, :nl] >> 16, rows[:, 1])
    assert np.array_equal(dd[0, :nl], rows[:, 2])


def test_pallas_encode_kernels_interpret_match_payload(block, monkeypatch):
    """Encode kernels (interpret mode) must reproduce the block's exact
    payload bytes: spec-decode the fixture block's literals/rows, re-encode
    with the Pallas scans + host group packer, compare against the original
    payloads (the spec encoder round-trips this block identically)."""
    jnp = pytest.importorskip("jax.numpy")
    from jax.experimental import pallas as pl

    import lzfse_rust_tpu.ops.pallas_encode as PE
    from lzfse_rust_tpu.ops.fse_encode import (build_encode_tables,
                                               pack_group_stream)
    from lzfse_rust_tpu.spec import fse as F
    from lzfse_rust_tpu.spec import tables as T

    real_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: real_call(*a, **{**k, "interpret": True}))

    d = block
    tabs = T.DecoderTables(d.weights)
    lits = np.asarray(F.decode_literals(d.lit_payload, tabs, d.block.literal),
                      np.uint8)
    rows = np.asarray(F.decode_lmds(d.lmd_payload, tabs, d.block.lmd))
    # packed d: zero when repeating the previous distance (the stored form)
    B = PE.R_ROWS
    weights = np.tile(d.weights.astype(np.int32), (B, 1))
    e_l, e_m, e_d, e_u = build_encode_tables(jnp.asarray(weights))

    # literals: right-justified packed words
    n_lit = d.block.literal.num
    G = (n_lit + 3) // 4
    n_cols = (G + PE.SUPER - 1) // PE.SUPER * PE.SUPER
    lw = np.zeros((B, n_cols * 4), np.uint8)
    lw[:, n_cols * 4 - G * 4:n_cols * 4 - G * 4 + n_lit] = lits
    if n_lit % 4:  # spec pads the tail group with lits[0]
        lw[:, n_cols * 4 - G * 4 + n_lit:] = lits[0]
    words = jnp.asarray(lw.view("<i4").copy())
    numv = jnp.asarray(np.full((B, 128), n_lit, np.int32))
    glo, gmeta, fs = PE.encode_literals_pallas(e_u, words, numv, n_cols)
    payload, off = pack_group_stream(np.asarray(glo)[0], np.asarray(gmeta)[0],
                                     G, 8)
    # ground truth via the validated spec path
    etabs = T.EncoderTables(d.weights)
    want_payload, want_param = F.encode_literals(
        np.concatenate([lits, np.full((-n_lit) % 4, lits[0], np.uint8)]),
        etabs)
    assert payload == want_payload
    assert off == want_param.bits
    assert tuple(np.asarray(fs)[0, :4] - 1024) == want_param.state

    # LMD rows
    nr = len(rows)
    n_cols_m = (nr + PE.SUPER - 1) // PE.SUPER * PE.SUPER
    lmv = np.zeros((B, n_cols_m), np.int32)
    dv = np.zeros((B, n_cols_m), np.int32)
    lmv[:, n_cols_m - nr:] = rows[:, 0] | (rows[:, 1] << 16)
    dv[:, n_cols_m - nr:] = rows[:, 2]
    numm = jnp.asarray(np.full((B, 128), nr, np.int32))
    mlo, mmeta, mfs = PE.encode_lmds_pallas(
        e_l, e_m, e_d, jnp.asarray(lmv), jnp.asarray(dv), numm, n_cols_m)
    pay_m, off_m = pack_group_stream(np.asarray(mlo)[0], np.asarray(mmeta)[0],
                                     nr, 22)
    want_pay_m, want_param_m = F.encode_lmds(rows, etabs)
    # spec LMD payload carries its 8-byte leading pad
    assert b"\x00" * 8 + pay_m == want_pay_m
    assert off_m == want_param_m.bits
    got_states = (int(np.asarray(mfs)[0, 0]) - C.L_STATES,
                  int(np.asarray(mfs)[0, 1]) - C.M_STATES,
                  int(np.asarray(mfs)[0, 2]) - C.D_STATES)
    assert got_states == want_param_m.state


def test_tpu_encoder_device_emission_identity(monkeypatch):
    """Full TpuEncoder with the device emission plane (interpret mode) must
    be byte-identical to the scalar spec encoder on a real corpus file."""
    pytest.importorskip("jax")
    from jax.experimental import pallas as pl

    from lzfse_rust_tpu.models.encoder import TpuEncoder
    from lzfse_rust_tpu.runtime import native
    from lzfse_rust_tpu.spec import frontend as FE

    if not native.available():
        pytest.skip("native runtime not built (select_blocks)")
    real_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: real_call(*a, **{**k, "interpret": True}))
    data = native.decode_bytes(
        pathlib.Path("/root/reference/data/snappy/html_x_4.lzfse")
        .read_bytes())[:300_000]
    want = FE.encode_bytes(data)
    # both front ends: the serving default (native frontend + pooled
    # device emission) and the fully offloaded device match finder
    for fe in ("native", "device"):
        enc = TpuEncoder(device_emission=True, frontend=fe)
        got = enc.encode_bytes(data)
        assert enc.last_emission == "device", (fe, enc.last_emission)
        assert got == want, fe


def test_tpu_encoder_device_emission_period_split(monkeypatch):
    """Device emission must apply the emit_best period-split decision:
    on short-period data (reps13-style) the pooled pass emits both row
    forms and picks the smaller, byte-identical to the host engines."""
    pytest.importorskip("jax")
    from jax.experimental import pallas as pl

    from lzfse_rust_tpu.models.encoder import TpuEncoder
    from lzfse_rust_tpu.runtime import native

    if not native.available():
        pytest.skip("native runtime not built (select_blocks)")
    real_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: real_call(*a, **{**k, "interpret": True}))
    data = native.decode_bytes(
        pathlib.Path("/root/reference/data/synth/reps13.lzfse").read_bytes())
    enc = TpuEncoder(device_emission=True)
    got = enc.encode_bytes(data)
    assert enc.last_emission == "device"
    want = native.encode_bytes(data)
    assert got == want
    # and the split must actually have won somewhere: emit_best beats the
    # as-is emission on this fixture by construction (reps13 regression)
    ref_size = pathlib.Path(
        "/root/reference/data/synth/reps13.lzfse").stat().st_size
    assert len(got) <= ref_size


def test_decode_many_pallas_path_interpret(monkeypatch):
    """The full TpuDecoder pallas path (sorted slots, cached buffers,
    dynamic group steps, unsort) in interpret mode on small fixtures."""
    pytest.importorskip("jax")
    from jax.experimental import pallas as pl

    from lzfse_rust_tpu.models.decoder import TpuDecoder
    from lzfse_rust_tpu.spec import container as spec

    real_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: real_call(*a, **{**k, "interpret": True}))
    files = [pathlib.Path("/root/reference/data/mutate/vx2.lzfse"),
             pathlib.Path("/root/reference/data/mutate/vx1.lzfse"),
             pathlib.Path("/root/reference/data/mutate/vxn.lzfse"),
             pathlib.Path("/root/reference/data/special/compound.lzfse")]
    srcs = [p.read_bytes() for p in files]
    want = [spec.decode_bytes(s) for s in srcs]
    dec = TpuDecoder(use_pallas=True, use_native_rebuild=True)
    stats = {}
    got = dec.decode_many(srcs, stats=stats)
    assert got == want
    assert stats.get("fallbacks", 0) == 0
    # second call reuses the cached staging buffers; results must not bleed
    got2 = dec.decode_many(list(reversed(srcs)))
    assert got2 == list(reversed(want))


def test_pallas_literal_latch_states_interpret(monkeypatch):
    """Adversarial weights whose U total is BELOW 1024 leave latch states
    (k=0, sym=0, delta=state — decoder.rs:327-334). The literal kernel
    reconstructs (k, delta) arithmetically from per-symbol aux words, so
    the latch must come from the explicit state >= tot override; walk a
    stream that starts INSIDE the latch region plus lanes that stay valid,
    and require exact agreement with the spec tables' scalar walk."""
    jnp = pytest.importorskip("jax.numpy")
    from jax.experimental import pallas as pl

    import lzfse_rust_tpu.ops.pallas_decode as P
    from lzfse_rust_tpu.ops.table_build import build_decode_tables_v3
    from lzfse_rust_tpu.spec import tables as T
    from lzfse_rust_tpu.spec.bits import BitReader

    real_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: real_call(*a, **{**k, "interpret": True}))

    rng = np.random.default_rng(7)
    w = np.zeros(360, np.int64)
    w[:16] = 4            # L total 64
    w[20:36] = 4          # M total 64
    w[40:104] = 4         # D total 256
    # U: total 512 < 1024 -> states 512..1023 are latch entries
    w[104:104 + 64] = 8
    tabs = T.DecoderTables(w)
    payload = b"\x00" * 8 + rng.integers(0, 256, 64, np.uint8).tobytes()
    num = 64
    init = (700, 3, 130, 511)  # lane 0 latched from the start

    # scalar oracle: the spec latch tables, raw walk (no validity raise)
    reader = BitReader(payload, 0)
    states = list(init)
    want = np.empty(num, np.uint8)
    for i in range(0, num, 4):
        for lane in range(4):
            k, sym, delta = tabs.u[states[lane]]
            states[lane] = reader.pull(int(k)) + int(delta)
            want[i + lane] = sym

    B = P.R_ROWS
    W = 512
    weights = np.tile(w.astype(np.int32), (B, 1))
    _vp, u3, tot = build_decode_tables_v3(jnp.asarray(weights))
    assert int(np.asarray(tot)[0]) == 512
    p = np.zeros((B, W * 4), np.uint8)
    p[:, :len(payload)] = np.frombuffer(payload, np.uint8)
    st = np.zeros((B, 128), np.int32)
    st[:, :4] = init
    lit_pk, fs, _fp = P.decode_literals_pallas(
        u3, jnp.asarray(p.view("<i4").copy()), jnp.asarray(st),
        jnp.asarray(np.full((B, 128), len(payload) * 8, np.int32)),
        jnp.asarray(np.full((B, 128), num, np.int32)),
        tot, (num + 3) // 4)
    got = np.zeros(num, np.uint8)
    pk = np.asarray(lit_pk)
    for i in range(num // 4):
        wd = pk[0, i]
        got[4 * i:4 * i + 4] = [(wd >> s) & 0xFF for s in (0, 8, 16, 24)]
    assert np.array_equal(got, want)
    assert tuple(np.asarray(fs)[0, :4]) == tuple(states)
