#!/usr/bin/env python3
"""Time ONE jit(denoise_window) execution at 720p shapes (68x120 latent,
T=22) — the direct harness for iterating on the denoise program's device
time (docs/PROFILE_720p.md round-5 dissection). Chains N executions
inside the timed region so the ~27 ms tunnel sync amortizes; prints
per-execution wall.

Usage: python scripts/bench_denoise.py [--reps 4] [--t 22]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--t", type=int, default=22)
    ap.add_argument("--h8", type=int, default=68)
    ap.add_argument("--w8", type=int, default=120)
    ap.add_argument("--attn-reuse", action="store_true",
                    help="measure with cfg.spatial_attn_reuse=True")
    args = ap.parse_args()

    from videovanish_tpu.core.runtime import apply_compilation_cache
    apply_compilation_cache()

    import jax.numpy as jnp

    from videovanish_tpu.models.diffueraser import DiffuEraser

    if args.attn_reuse:
        import dataclasses

        from videovanish_tpu.config import default_config
        cfg = dataclasses.replace(default_config().diffueraser,
                                  spatial_attn_reuse=True)
        m = DiffuEraser(config=cfg)
    else:
        m = DiffuEraser()
    dn = m._get_jitted(args.t)[3]
    T, h8, w8 = args.t, args.h8, args.w8
    params = m.params
    z = jnp.zeros((T, h8, w8, 4), jnp.float32)
    mk = jnp.zeros((T, h8, w8, 1), jnp.float32)
    emb = params["null_text_emb"]

    def once():
        return dn(params, z, z, mk, z, emb, guidance=0.0)

    t0 = time.perf_counter()
    out = once()
    float(jnp.sum(out))  # block (block_until_ready doesn't through axon)
    print(f"first call (compile or cache load): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.reps):
            acc = once()
        float(jnp.sum(acc))
        dt = (time.perf_counter() - t0) / args.reps
        best = min(best, dt)
    print(f"denoise_window {h8}x{w8} T={T}: {best * 1e3:.1f} ms/exec "
          f"(best-of-3 x {args.reps} chained)")


if __name__ == "__main__":
    main()
