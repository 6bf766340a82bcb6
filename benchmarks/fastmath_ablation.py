"""MFU ablation: canonical vs algebraically-reduced EM update (VERDICT r3
item 8 — the EM divide/multiply mix is the VPU bottleneck at 0.665 MFU).

Times the fused chunk kernel with ``fast_math`` off (canonical op order)
and on (``w = (u + p2)/(p0 + 2u + p2)`` with ``u = g1*f*(1-f)``, two
fewer multiplies per element, power-of-two-rescaled rounding order),
using the same two-point slope method as bench.py to isolate
per-iteration time.  Also reports the max AF divergence after the run so
the accuracy cost of the reordering is on record.

Prints one JSON line.  The reduced form is the PRODUCTION DEFAULT
(``Runtime.fast_math=True``; bit-identical to canonical for normal-range
operands) — ``--no_fast_em`` / ``fast_math=False`` is the ablation arm.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

M = 1 << 20
N = 128
EM_ITERS = 50


def main():
    import jax
    import jax.numpy as jnp

    from bench import NOMINAL_VPU_F32_GFLOPS, _synthetic_gl
    from wgsassign_tpu.ops.pallas_emmaf import em_chunk_pallas
    from wgsassign_tpu.parallel.mesh import (
        enable_compilation_cache,
        make_runtime,
    )

    enable_compilation_cache()
    np.asarray(jnp.ones(8).sum())  # tunnel session establishment
    rt = make_runtime(jax.devices()[:1])
    interpret = rt.pallas_interpret()
    device_kind = jax.devices()[0].device_kind
    g0, g1 = _synthetic_gl(M, N)
    g0d = rt.shard_sites(g0)
    g1d = rt.shard_sites(g1)
    f0 = jnp.full((1, M), 0.25, jnp.float32)
    onehot = jnp.ones((1, N), jnp.float32)
    inv_counts = (1.0 / N,)
    rep = [0]

    def timed(T, fast):
        def once():
            rep[0] += 1
            lim = jnp.asarray([[float(T) - 1e-7 * rep[0]]], jnp.float32)
            t0 = time.perf_counter()
            _, sq = em_chunk_pallas(
                g0d, g1d, f0, onehot, inv_counts, lim, T,
                interpret=interpret, fast_math=fast,
            )
            np.asarray(sq[-1])
            return time.perf_counter() - t0

        once()
        return min(once() for _ in range(3))

    out = {"metric": "fused_em_fastmath_ablation", "m": M, "n": N,
           "device_kind": device_kind}
    short, long_ = EM_ITERS // 5, EM_ITERS
    per_iter = {}
    for fast in (False, True):
        t_s, t_l = timed(short, fast), timed(long_, fast)
        per_iter[fast] = max((t_l - t_s) / (long_ - short), 1e-9)
        key = "fast" if fast else "canonical"
        out[f"{key}_updates_per_sec"] = float(
            f"{M * N / per_iter[fast]:.5g}")
    out["speedup"] = round(per_iter[False] / per_iter[True], 4)
    # canonical MFU anchor (16 flops/update estimate, as in bench.py)
    nominal = NOMINAL_VPU_F32_GFLOPS.get(device_kind)
    if nominal:
        out["canonical_mfu"] = round(
            16 * M * N / per_iter[False] / (nominal * 1e9), 3)
        out["fast_mfu_equiv"] = round(
            16 * M * N / per_iter[True] / (nominal * 1e9), 3)

    # accuracy cost of the rounding-order change after a full run
    lim = jnp.asarray([[float(EM_ITERS)]], jnp.float32)
    fa, _ = em_chunk_pallas(g0d, g1d, f0, onehot, inv_counts, lim,
                            EM_ITERS, interpret=interpret, fast_math=False)
    fb, _ = em_chunk_pallas(g0d, g1d, f0, onehot, inv_counts, lim,
                            EM_ITERS, interpret=interpret, fast_math=True)
    out["max_abs_af_divergence"] = float(
        f"{np.max(np.abs(np.asarray(fa) - np.asarray(fb))):.3g}")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
