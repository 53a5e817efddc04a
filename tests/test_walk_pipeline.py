"""CPU coverage of the walk-based TpuDecoder fast path.

decode_many's production path (native walk -> native prep -> Pallas
kernels -> fused packed-row rebuild) normally needs TPU hardware; here the
kernels run in Pallas interpreter mode so the ENTIRE pipeline — staging,
table upload, kernel semantics, validity checks, VN/RAW source-direct
parts, spec fallback — executes in-suite. Hardware bit-exactness over the
full corpus is tools/check_corpus_tpu.py."""

import pathlib

import numpy as np
import pytest

FIXTURE = pathlib.Path("/root/reference/data/mutate/vx2.lzfse")


@pytest.fixture()
def interp(monkeypatch):
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **k: real_call(*a, **{**k, "interpret": True}))


def test_walk_pipeline_interpret(interp):
    import lzfse_rust_tpu.models.decoder as M
    from lzfse_rust_tpu import api
    from lzfse_rust_tpu.spec import container as spec_container

    native = M._native_mod()
    if native is None:
        pytest.skip("native runtime not built")

    fse_src = FIXTURE.read_bytes()
    vn_src = api.encode_bytes(b"hello world, hello world, hello")
    raw_src = api.encode_bytes(bytes(np.random.default_rng(3).integers(
        0, 256, 600, dtype=np.uint8)))
    empty_src = b"bvx$"
    bad_src = b"bvx2" + b"\x00" * 40  # malformed: spec fallback must raise

    dec = M.TpuDecoder(use_pallas=True, use_native_rebuild=True)
    sources = [fse_src, vn_src, raw_src, empty_src, fse_src]
    stats: dict = {}
    outs = dec.decode_many(sources, stats=stats)
    assert stats.get("fallbacks", 0) == 0
    for src, out in zip(sources, outs):
        assert bytes(out) == spec_container.decode_bytes(src)

    # malformed containers raise exactly like the Python parse
    with pytest.raises(Exception):
        dec.decode_many([fse_src, bad_src])
