"""North-star benchmark: SNP-individual GL updates/sec/chip in the MAF EM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against an estimated 64-thread CPU WGSassign
throughput: the reference EM inner loop (emMAF_cy.pyx:10-23) is measured
here as a single-core vectorized NumPy pass over the same update (NumPy's
C loops are a faithful stand-in for the Cython kernel's per-core
throughput), scaled by 64 assuming perfect OpenMP scaling — a *generous*
baseline.  BASELINE.md target: >= 10x this number per chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Benchmark shape: large enough to saturate the chip, small enough to fit
# easily in HBM (2 x M x N float32 = 1 GiB).
M = 1 << 20
N = 128
EM_ITERS = 50
CAL_M = 1 << 15  # CPU calibration runs a smaller site count


def _synthetic_gl(m, n, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.dirichlet(np.ones(3), size=(m, n)).astype(np.float32)
    return raw[:, :, 0], raw[:, :, 1]


def cpu_reference_updates_per_sec():
    """Single-core NumPy throughput of the reference EM update."""
    g0, g1 = _synthetic_gl(CAL_M, N, seed=1)
    g2 = 1.0 - g0 - g1
    f = np.full((CAL_M, 1), 0.25, dtype=np.float32)
    # warmup + measure
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        omf = 1.0 - f
        p0 = g0 * omf * omf
        p1 = g1 * 2.0 * f * omf
        p2 = g2 * f * f
        w = (p1 + 2.0 * p2) / (2.0 * (p0 + p1 + p2))
        f = w.mean(axis=1, keepdims=True, dtype=np.float32)
        best = min(best, time.perf_counter() - t0)
    return CAL_M * N / best


def tpu_updates_per_sec():
    import jax
    import jax.numpy as jnp

    from wgsassign_tpu.ops.pallas_emmaf import em_chunk_pallas
    from wgsassign_tpu.parallel.mesh import make_runtime

    # First device round trip can be very slow on tunneled platforms
    # (session establishment) — do a tiny one before timing anything.
    np.asarray(jnp.ones(8).sum())

    rt = make_runtime(jax.devices()[:1])
    interpret = rt.pallas_interpret()  # capability probe, not a name test
    g0, g1 = _synthetic_gl(M, N)
    g0d = rt.shard_sites(g0)
    g1d = rt.shard_sites(g1)
    f0 = jnp.full((1, M), 0.25, jnp.float32)  # [K, M] transposed panel
    onehot = jnp.ones((1, N), jnp.float32)
    inv_counts = (1.0 / N,)

    # The fused Pallas kernel runs T EM iterations per HBM read of the GL
    # panels.  A per-repetition-unique limit value defeats any
    # execution-result caching keyed on argument values; fetching the tiny
    # `sq` output forces completion.  The two-point slope (long minus short
    # chunk) cancels dispatch + transfer overhead.
    rep = [0]

    def timed(T):
        def once():
            rep[0] += 1
            lim = jnp.asarray([[float(T) - 1e-7 * rep[0]]], jnp.float32)
            t0 = time.perf_counter()
            _, sq = em_chunk_pallas(
                g0d, g1d, f0, onehot, inv_counts, lim, T,
                interpret=interpret,
            )
            np.asarray(sq[-1])
            return time.perf_counter() - t0

        once()  # warmup/compile for this chunk length
        return min(once() for _ in range(3))

    short, long_ = EM_ITERS // 5, EM_ITERS
    per_iter = max((timed(long_) - timed(short)) / (long_ - short), 1e-9)
    return M * N / per_iter


def main():
    value = tpu_updates_per_sec()
    baseline = cpu_reference_updates_per_sec() * 64.0
    print(
        json.dumps(
            {
                "metric": "maf_em_gl_updates_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "site-individual EM updates/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
