"""Measure raw Pallas grid-step overhead on the real chip.

A kernel that only sums its streamed input block into a (1,1) accumulator,
swept over block sizes / grid lengths at constant total data.  If time
scales with n_steps instead of bytes, per-step overhead dominates.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=7864320)  # 262144 rays x 30
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((8, args.rows)).astype(np.float32))
          for _ in range(2)]

    def make(block, n_out_dummy):
        def kernel(x_ref, o_ref, *dummies):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
                for d in dummies:
                    d[...] = jnp.zeros(d.shape, d.dtype)

            s = jnp.sum(x_ref[...], axis=1, keepdims=True)
            o_ref[...] += jnp.sum(s, axis=0, keepdims=True)[0:1, 0:1]

        n_tiles = args.rows // block
        out_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        for _ in range(n_out_dummy):
            out_specs.append(pl.BlockSpec((3, 40, 40), lambda i: (0, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((3, 40, 40), jnp.float32))

        def run(x):
            outs = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec((8, block), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=out_specs,
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
            )(x)
            return outs[0]

        return jax.jit(run), n_tiles

    for block, ndum in [(3840, 0), (3840, 2), (15360, 0), (61440, 0),
                        (122880, 0)]:
        fn, n_tiles = make(block, ndum)
        try:
            for x in xs:
                jax.block_until_ready(fn(x))
        except Exception as e:
            print(f"block={block:6d}: FAILED {str(e)[:120]}", flush=True)
            continue
        ts = []
        for i in range(args.reps * 2):
            x = xs[i % 2]
            t0 = time.perf_counter()
            _ = float(fn(x)[0, 0])
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"block={block:6d} dummies={ndum} n_steps={n_tiles:5d}: "
              f"{med*1e3:7.2f} ms -> {med/n_tiles*1e6:6.2f} us/step",
              flush=True)


if __name__ == "__main__":
    main()
