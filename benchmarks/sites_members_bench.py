"""Hardware validation of the sites-batch kernel's member-depth bound.

``MAX_FUSED_SITES_MEMBERS`` (ops/pallas_emmaf.py) — the largest gathered
member-panel depth P the z-score sites-batch EM will run fused — was a
paper bound from ``_sites_step_bytes``.  The same class of VMEM estimate
was 4-6x conservative for the reference-AF kernel (hardware-measured in
round 4) and 2.5x off in round 2, so this bench sweeps P up to and past
the bound on the chip exactly the way ``emmaf_n_bench.py`` swept the EM
N bound (VERDICT r4 next #5): per P it runs the fused driver end-to-end,
recording compile wall-clock, steady-state pairwise updates/s, and
whether Mosaic compiles at all.  The cliff is the measured bound.

Usage: python benchmarks/sites_members_bench.py [--s 16384] [--b 4]
           [--members 512 1024 2048 3072 4096]
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
    ap.add_argument("--s", type=int, default=16384,
                    help="kept-site axis length per problem")
    ap.add_argument("--b", type=int, default=4, help="problems per batch")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--members", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wgsassign_tpu.ops.pallas_emmaf import (
        MAX_FUSED_SITES_MEMBERS,
        _mosaic_warmup,
        em_maf_sites_batch_fused,
    )
    from wgsassign_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    _mosaic_warmup(False)
    bound = MAX_FUSED_SITES_MEMBERS
    members = args.members or [
        512, 1024, bound // 2, bound, bound + 512, 2 * bound,
    ]
    b, s = args.b, args.s
    for p in sorted(set(members)):
        rng = np.random.default_rng(0)
        raw = rng.dirichlet(np.ones(3), size=(b, p, s)).astype(np.float32)
        g0 = jnp.asarray(raw[:, :, :, 0])
        g1 = jnp.asarray(raw[:, :, :, 1])
        mask = jnp.ones((b, 1, p), jnp.float32)
        sw = jnp.ones((b, 1, s), jnp.float32)
        jax.block_until_ready(g0)
        row = {"metric": "sites_batch_member_bound", "b": b, "p": p, "s": s,
               "paper_bound": bound}
        try:
            t0 = time.perf_counter()
            f, iters, conv = em_maf_sites_batch_fused(
                g0, g1, mask, sw, np.full(b, float(s)), args.iters, -1.0,
            )
            np.asarray(f[:, :8])
            row["first_call_s"] = round(time.perf_counter() - t0, 1)
            # steady state: re-run with a fresh tol value (defeats caching)
            t0 = time.perf_counter()
            f, iters, conv = em_maf_sites_batch_fused(
                g0, g1, mask, sw, np.full(b, float(s)), args.iters, -2.0,
            )
            np.asarray(f[:, :8])
            dt = time.perf_counter() - t0
            row["steady_s"] = round(dt, 2)
            row["updates_per_s"] = round(b * p * s * args.iters / dt / 1e9, 2)
            row["updates_per_s_unit"] = "1e9 pairwise site-member updates/s"
            row["ok"] = True
        except Exception as e:  # noqa: BLE001 — the cliff IS the datum
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
