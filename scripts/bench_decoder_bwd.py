"""Microbench: implicit-decoder grid-sample fwd+bwd at train shapes.

Round-2 profiles left two open costs (VERDICT item 10): the f32 staging
grid the sampler VJP zero-inits + scatters into (~1.1 GB per batch row at
128^3 x 16ch x 8 corners), and ~20 ms of non-conv UNet overhead. This
script isolates the sampler fwd+bwd so staging-dtype / layout experiments
can be measured without the full train step.

Usage: python scripts/bench_decoder_bwd.py [--n 400000] [--patches 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400000)
    ap.add_argument("--patches", type=int, default=4)
    ap.add_argument("--dhw", type=int, default=128)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="vol/cotangent dtype; bfloat16 engages the half-"
                         "width staging grid in the custom VJP")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from semantic_abstraction_tpu.ops.sampling import grid_sample_3d_cl

    s, c = args.dhw, args.c
    dt_ = jnp.dtype(args.dtype)
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.randn(args.patches, s, s, s, c).astype(np.float32),
                      dt_)
    coords = jnp.asarray(
        rs.uniform(-1, 1, (args.patches, args.n, 3)).astype(np.float32))

    def loss(vol, coords):
        return grid_sample_3d_cl(vol, coords).sum(dtype=jnp.float32)

    f = jax.jit(jax.grad(loss, argnums=(0,)))
    (g,) = f(vol, coords)
    np.asarray(g[0, 0, 0, 0, :1])  # sync (tunnel: only readback waits)

    t0 = time.perf_counter()
    for _ in range(args.reps):
        (g,) = f(vol, coords)
    np.asarray(g[0, 0, 0, 0, :1])
    dt = (time.perf_counter() - t0) / args.reps
    print(f"fwd+bwd {args.patches}x{args.n} pts, {s}^3 x {c}ch {args.dtype}: "
          f"{dt * 1e3:.1f} ms/call")


if __name__ == "__main__":
    main()
