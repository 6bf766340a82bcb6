"""Hardware validation of the fused reference-AF EM's individual-axis bound.

``MAX_FUSED_EM_INDIVIDUALS`` (ops/pallas_emmaf.py) was derived on paper
from the T-unrolled kernel's VMEM working set; round 2 showed a paper
bound for the LOO kernel was 2.5x off on real silicon, so this bench
sweeps N up to and past the bound on the chip (VERDICT r3 item 4): for
each N it runs the fused chunk kernel end-to-end, records compile time,
steady-state updates/s, and whether Mosaic compiles at all — the cliff
(compile failure, pathological compile time, or a throughput collapse)
is the measured bound.

Usage: python benchmarks/emmaf_n_bench.py [--m 262144] [--iters 24]
           [--inds 512 1024 2048 4096 5120 6144]
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
    ap.add_argument("--m", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--inds", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax

    from wgsassign_tpu.ops.pallas_emmaf import (
        MAX_FUSED_EM_INDIVIDUALS,
        _mosaic_warmup,
        _tile_m,
        em_maf_pops_fused,
    )
    from wgsassign_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    _mosaic_warmup(False)
    b = MAX_FUSED_EM_INDIVIDUALS
    inds = args.inds or [512, 1024, 2048, b // 2, b, b + 1024, 2 * b]
    dev = jax.devices()[0]
    for n in sorted(set(inds)):
        # scale M down as N grows so the problem fits HBM and each config
        # runs in comparable wall-clock; keep site alignment
        m = max(args.m // max(n // 512, 1), 512)
        m = (m // 256) * 256
        rng = np.random.default_rng(0)
        raw = rng.dirichlet(np.ones(3), size=(m, n)).astype(np.float32)
        # pin the panels to device BEFORE timing: host-numpy operands pay a
        # full tunnel upload per driver call (~30 MB/s here), which would
        # swamp the kernel by 1000x
        import jax.numpy as jnp

        g0 = jnp.asarray(np.ascontiguousarray(raw[:, :, 0]))
        g1 = jnp.asarray(np.ascontiguousarray(raw[:, :, 1]))
        jax.block_until_ready((g0, g1))
        pop_index = (np.arange(n) % args.k).astype(np.int32)
        membership = np.zeros((n, args.k), dtype=np.float32)
        membership[np.arange(n), pop_index] = 1.0
        sw = np.ones(m, dtype=np.float32)
        row = {
            "metric": "fused_em_individuals_scaling",
            "n": n, "m": m, "k": args.k,
            "tile_m": _tile_m(m, n),
            "paper_bound": b,
            "device_kind": dev.device_kind,
        }
        try:
            t0 = time.time()
            f, iters, conv = em_maf_pops_fused(
                g0, g1, membership, sw, m, args.iters, 0.0, chunk=8
            )
            np.asarray(f[0, 0])  # force completion through the tunnel
            t1 = time.time()
            f2, _, _ = em_maf_pops_fused(
                g0, g1, membership, sw, m, args.iters, 0.0, chunk=8
            )
            np.asarray(f2[0, 0])
            t2 = time.time()
            updates = float(m) * n * args.iters
            row.update({
                "ok": True,
                "first_run_s": round(t1 - t0, 2),
                "steady_run_s": round(t2 - t1, 3),
                "updates_per_sec": float(
                    f"{updates / max(t2 - t1, 1e-9):.4g}"),
            })
        except Exception as e:  # noqa: BLE001 — the failure IS the datum
            row.update({"ok": False,
                        "error": f"{type(e).__name__}: {str(e)[:300]}"})
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
