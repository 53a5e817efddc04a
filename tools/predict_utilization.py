"""Analytic kernel-utilization model vs serving batch size (REPS).

The decode kernels execute, per 128-block sorted group, ceil(max_steps /
EPOCH) superepochs of EPOCH vector steps — every vector step serves all
128 blocks, so per-replica device cost is proportional to the total
vector-step count. That count is pure shape math: this tool computes it
for a sweep of corpus replica counts, predicting the REPS hardware A/B
(tools/run_hw_queue.sh bench8/16/24) without a chip.

Validated against hardware at REPS=8 (lit 1.97x needed, lmd 1.38x —
STATUS.md). The LMD kernel's blocks are homogeneous (9992 steps), so its
waste floor is low; the literal kernel's size spread is what the bigger
batch packs away.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import lzfse_rust_tpu.models.decoder as M
    from lzfse_rust_tpu.ops.pallas_decode import EPOCH

    files = sorted(pathlib.Path("/root/reference/data/snappy")
                   .glob("*.lzfse"))
    fse = []
    for i, p in enumerate(files):
        M._parse_container(p.read_bytes(), i, fse)
    lit_steps = np.array([(d.block.literal.num + 3) // 4 for d in fse])
    lmd_steps = np.array([d.block.lmd.num for d in fse])

    def util(steps, reps, rows=128, epoch=EPOCH):
        s = np.tile(steps, reps)
        B = (len(s) + rows - 1) // rows * rows
        pad = np.zeros(B)
        pad[:len(s)] = s
        g = np.sort(pad)[::-1].reshape(-1, rows)
        vec_steps = np.ceil(g.max(axis=1) / epoch).sum() * epoch
        return vec_steps / (s.sum() / rows), vec_steps

    print(f"{'REPS':>4} {'lit x-needed':>12} {'lmd x-needed':>12} "
          f"{'vsteps/rep (lit+lmd)':>20} {'rel device cost':>16}")
    base = None
    for reps in (8, 16, 24, 32, 48, 64):
        wl, vl = util(lit_steps, reps)
        wm, vm = util(lmd_steps, reps)
        per = (vl + vm) / reps
        base = base or per
        print(f"{reps:>4} {wl:>12.3f} {wm:>12.3f} {per:>20.1f} "
              f"{per / base:>16.3f}")


if __name__ == "__main__":
    main()
