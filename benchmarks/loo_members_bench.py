"""Hardware scaling check for the problem-tiled fused LOO EM kernel.

Round-2 finding: the monolithic [n_p, n_p, tile] kernel stalled Mosaic for
minutes at n_p=96 (231 s end-to-end) and could not run the 100-450 member
range at all.  This bench times the problem-axis-tiled kernel
(ops/pallas_emmaf.py) across that range on the real chip, including compile
time, and prints one JSON line per configuration.

Usage: python benchmarks/loo_members_bench.py [--m 131072] [--iters 50]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--members", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax

    from wgsassign_tpu.ops.pallas_emmaf import (
        MAX_FUSED_LOO_MEMBERS,
        _loo_block_sizes,
        em_maf_loo_group_fused,
    )

    members = args.members or [96, 180, 256, MAX_FUSED_LOO_MEMBERS]
    dev = jax.devices()[0]
    for n_p in members:
        rng = np.random.default_rng(0)
        raw = rng.dirichlet(np.ones(3), size=(args.m, n_p)).astype(np.float32)
        g0p = np.ascontiguousarray(raw[:, :, 0].T)
        g1p = np.ascontiguousarray(raw[:, :, 1].T)
        np_pad, tile = _loo_block_sizes(args.m, n_p)
        t0 = time.time()
        f, iters, conv = em_maf_loo_group_fused(
            g0p, g1p, args.m, args.iters, 1e-4, chunk=8
        )
        f.block_until_ready()
        t1 = time.time()
        f2, _, _ = em_maf_loo_group_fused(
            g0p, g1p, args.m, args.iters, 1e-4, chunk=8
        )
        f2.block_until_ready()
        t2 = time.time()
        mean_iters = float(np.asarray(iters).mean())
        updates = float(args.m) * n_p * n_p * mean_iters
        print(json.dumps({
            "metric": "fused_loo_members_scaling",
            "n_p": n_p, "m": args.m,
            "block": {"np_pad": np_pad, "tile": tile},
            "first_run_s": round(t1 - t0, 2),
            "steady_run_s": round(t2 - t1, 3),
            "mean_iters": round(mean_iters, 1),
            "pairwise_updates_per_sec": float(f"{updates / max(t2 - t1, 1e-9):.4g}"),
            "device_kind": dev.device_kind,
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
