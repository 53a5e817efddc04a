"""Mesh-sharded pipeline tests on the virtual 8-device CPU mesh.

Exercises the data-parallel block sharding, container-parallel rebuild and
the ordered all-gather epilogue (SURVEY.md §2.3 capabilities) end-to-end
against the spec oracle. The driver's dryrun_multichip covers the same path
standalone; this keeps it in the regression suite.
"""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

FIXTURE = pathlib.Path("/root/reference/data/mutate/vx2.lzfse")


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    from lzfse_rust_tpu.parallel.mesh import make_mesh
    return make_mesh(jax.devices()[:4])


def _arrays(B):
    import lzfse_rust_tpu.models.decoder as M
    fse_blocks = []
    M._parse_container(FIXTURE.read_bytes(), 0, fse_blocks)
    d = fse_blocks[0]
    lit = np.zeros((B, M.LIT_PAYLOAD_PAD + M._PAD_TAIL), np.uint8)
    lmd = np.zeros((B, M.LMD_PAYLOAD_PAD + M._PAD_TAIL), np.uint8)
    lit[:, :len(d.lit_payload)] = np.frombuffer(d.lit_payload, np.uint8)
    lmd[:, :len(d.lmd_payload)] = np.frombuffer(d.lmd_payload, np.uint8)
    ls = d.block.lmd.state
    return dict(
        weights=np.tile(d.weights.astype(np.int32), (B, 1)),
        lit_payload=lit, lmd_payload=lmd,
        lit_states=np.tile(np.array(d.block.literal.state, np.int32), (B, 1)),
        lit_pos=np.full(B, len(d.lit_payload) * 8 - d.block.literal.bits,
                        np.int32),
        lit_num=np.full(B, d.block.literal.num, np.int32),
        lmd_states=np.tile(np.array((ls[0], ls[1] + 64, ls[2] + 128),
                                    np.int32), (B, 1)),
        lmd_pos=np.full(B, len(d.lmd_payload) * 8 - d.block.lmd.bits,
                        np.int32),
        lmd_num=np.full(B, d.block.lmd.num, np.int32),
    ), d


def test_sharded_pipeline_matches_oracle(mesh):
    from lzfse_rust_tpu.parallel.mesh import (gather_compressed,
                                              sharded_entropy_decode,
                                              sharded_rebuild)
    from lzfse_rust_tpu.spec import container as spec

    B = 8
    arrays, d = _arrays(B)
    literals, lmds, ok = sharded_entropy_decode(
        mesh, arrays, n_lit_steps=(d.block.literal.num + 3) // 4,
        n_lmd_steps=d.block.lmd.num)
    assert np.asarray(ok).all()

    nl = d.block.lmd.num
    rows = np.asarray(lmds)[:, :nl]
    consumed = int(rows[0, :, 0].sum())
    out, rok = sharded_rebuild(
        mesh, np.asarray(literals)[:, :max(consumed, 1)], rows,
        np.full(B, d.block.n_raw_bytes, np.int32),
        n_out=(d.block.n_raw_bytes + 4095) // 4096 * 4096)
    assert np.asarray(rok).all()
    want = spec.decode_bytes(FIXTURE.read_bytes())
    for b in range(B):
        assert np.asarray(out)[b, :d.block.n_raw_bytes].tobytes() == want

    import jax.numpy as jnp
    blocks = np.arange(B * 16, dtype=np.uint8).reshape(B, 16)
    lens = np.arange(B, dtype=np.int32)
    g_blocks, g_lens = gather_compressed(mesh, jnp.asarray(blocks),
                                         jnp.asarray(lens))
    assert (np.asarray(g_blocks) == blocks).all()
    assert (np.asarray(g_lens) == lens).all()
