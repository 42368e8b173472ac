"""Time the XLA-side ray-layout prep ALONE (no pallas call, real chip).

The enc_only / enc_nocat / enc_notrans ablations all cost ~16.7 ms/step
(artifacts/r3_enc_ablate.log) — identical, so the 'encode stage' floor is
NOT the in-kernel encode.  What those ablations share is the jnp input
prep traced into the same jit: building (8, rows) pts^T via a transpose
whose minor dim is 3 (a pathological TPU relayout), plus the (8, rows)
tgt^T repeat+transpose.  This script times exactly that prep, scanned K
times with evolving inputs, RTT-amortized like bench.py.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--config", default="small", choices=["small", "full"],
                    help="small = parity (transposed-layout prep); full = "
                         "flagship (row-major packed-layout prep)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lomanerf_tpu.core import sample_along_rays
    from lomanerf_tpu.models import NeRFConfig
    from lomanerf_tpu.ops import fused_nerf

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(215)
    cfg = {"small": NeRFConfig.small, "full": NeRFConfig.full}[args.config]()
    if args.config == "full":
        args.rays = min(args.rays, 16384)  # the flagship bench batch
    S = cfg.num_samples
    N = args.rays
    o = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    _, t, dists = sample_along_rays(o, d, cfg.near, cfg.far, S)
    # the ray-major layouts under measurement take per-ray (N, S) depths
    t = jnp.broadcast_to(t, (N, S))
    dists = jnp.broadcast_to(dists, (N, S))
    tg = jnp.asarray(rng.random((N, 3)).astype(np.float32))
    K = args.inner

    variants = {
        "ptsT only": lambda oo: fused_nerf._transposed_ray_layout(
            oo, d, t, dists, S, args.tile)[0][:1, :1],
        "full prep": lambda oo: _full(oo),
    }
    if args.config == "full":
        # flagship path: the row-major kernels' packed (8, rows) layout
        variants = {
            "pk packed": lambda oo: fused_nerf._packed_ray_layout(
                oo, d, t, dists, S, 8)[0][:1, :1],
        }

    def _full(oo):
        ptsT, distsT, n_pad, pad_rays = fused_nerf._transposed_ray_layout(
            oo, d, t, dists, S, args.tile)
        tgt_rows = jnp.repeat(pad_rays(tg.astype(jnp.float32)), S, axis=0)
        tgtT = jnp.pad(tgt_rows.T, ((0, 5), (0, 0)))
        return ptsT[:1, :1] + distsT[:1, :1] + tgtT[:1, :1]

    for name, fn in variants.items():
        @jax.jit
        def run_k(salt, fn=fn):
            def body(acc, _):
                probe = fn(o * (1.0 + acc))
                v = jnp.sum(probe)
                return acc + jnp.float32(1e-4) + v * 1e-20, v

            _, vs = jax.lax.scan(body, salt, None, length=K)
            return vs[-1]

        _ = float(run_k(jnp.float32(0.0)))
        _ = float(run_k(jnp.float32(0.5)))
        ts, seen = [], []
        for i in range(args.outer):
            t0 = time.perf_counter()
            v = float(run_k(jnp.float32(0.1 * (i + 1))))
            ts.append((time.perf_counter() - t0) / K)
            seen.append(v)
        assert len(set(seen)) == len(seen), (name, seen)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:12s}: {med*1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
