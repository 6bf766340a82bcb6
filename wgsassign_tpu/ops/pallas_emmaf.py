"""Fused multi-iteration Pallas TPU kernel for the MAF EM.

Why: the XLA path (ops/emmaf.py) re-reads the ``[M, N]`` GL panels from HBM
on every EM iteration — ~8·M·N bytes/iter, which makes the EM
bandwidth-bound (~1 iter per HBM sweep).  The per-site EM is *local*: an
M-tile holding all N individuals can run any number of iterations entirely
in VMEM.  This kernel loads each GL tile once and runs a chunk of T
iterations on it, making the EM compute-bound (VPU) instead.

Convergence semantics are preserved exactly (SURVEY §2.3: per-population
global-RMSE stop, populations freeze independently):

- the kernel also emits per-iteration, per-population squared-diff partial
  sums ``sq[T, K]`` (accumulated across the tile grid), from which the host
  reconstructs the exact RMSE sequence;
- a per-population iteration-limit vector caps how many updates each
  population takes inside a chunk, so when the RMSE sequence shows a
  population converged mid-chunk, the driver replays that chunk from its
  snapshot with exact limits — at most one replay per chunk, and only in
  chunks where something converges.

Layout notes (HBM-footprint critical at production scale):

- the AF panel crosses the kernel boundary **transposed**, as ``[K, M]``:
  TPU HBM tiling pads the minor dimension to 128 lanes, so an ``[M, K]``
  operand with K≈5 would inflate 25x (2.3 GB at 5M sites); ``[K, M]`` only
  pads K to 8 sublanes.  The kernel transposes the small ``[K, tile]``
  block once per chunk;
- there is no site-weight operand (an ``[M, 1]`` operand would pad 128x):
  padded sites are instead pinned to the EM fixed point of the padding GL
  pattern (g0=1 ⇒ w=0 ⇒ f=EM_EPS) by initializing their f to ``EM_EPS``,
  which makes their per-iteration diff exactly zero — they never touch the
  convergence partials.

The per-individual AF gather and the member sums are unrolled over the K
populations as exact float32 one-hot multiply-accumulates on the VPU (a
bf16 MXU matmul would quantize the trajectory; K is small in this domain).
All update arithmetic keeps the XLA path's op order, so trajectories (and
hence convergence iteration counts) are bit-identical to ``em_maf_pops``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wgsassign_tpu.ops.emmaf import _EM_EPS

_F32 = jnp.float32

# VMEM working set per tile ~ 2 * tile_m * N * 4 bytes (GL panels, double
# buffered) plus w/g2 temporaries; keep comfortably under ~16 MB/core.
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024

# HBM-peak control: Mosaic pins pallas operand layouts, so XLA materializes
# lane-padded tiled copies of the GL operands (N=180 pads to 256 lanes —
# a 1.4x expansion; two full copies at 5M sites is ~9.5 GB of HLO temps and
# OOMs a 16 GB chip next to the 7 GB arguments).  The EM is per-site
# independent, so the driver streams each chunk of iterations over site
# blocks sized to keep the converted copies around this many bytes; only
# the per-chunk convergence partials are global.  2 GB (vs round-3's 1 GB)
# halves the per-chunk dispatch count — each dispatch costs a ~100 ms
# round trip on tunneled hosts — while the headline shape still fits:
# 7.2 GB cohort + ~2.8 GB lane-padded copies + state < 16 GB.
_BLOCK_OPERAND_BYTES = 2 << 30

# Auto-fallback bound for the fused all-populations EM — HARDWARE
# MEASURED (round 4, benchmarks/emmaf_n_bench.py on a v5e chip, chunk=8,
# 128-row floor tile): the kernel compiles and runs at full throughput
# through N=16384 and fails in Mosaic at N=24576, so the round-3 paper
# bound of 4096 (from a 24-live-buffer VMEM estimate) was 4-6x
# conservative — Mosaic schedules far fewer live [tile, N] buffers than
# the T-unrolled source suggests.  The bound is set at 8192, half the
# measured ceiling: compile time grows superlinearly past it (22 s at
# 8192 -> 59 s at 16384) and the spare margin absorbs chip-generation
# differences.  Above it drivers switch to the XLA while-loop path
# instead of asking the user for --no_pallas.
MAX_FUSED_EM_INDIVIDUALS = 8192


# One-time trivial Mosaic compile before the first fused-kernel compile of
# the process.  Hardware finding (round 3, tunneled v5e host): the FIRST
# Mosaic kernel a process compiles pays a ~minutes one-time backend
# initialization regardless of kernel size (measured 260 s for a trivial
# n_p=8 chunk; the very next, much larger kernel compiled in 3.3 s).  The
# CLI path is implicitly warmed by the mesh capability probe
# (parallel.mesh._probe_pallas, itself a tiny Mosaic kernel); direct
# driver/bench callers get this guard so the cost attaches to a trivial
# program instead of inflating a user-visible phase.
_WARMED = False


def _mosaic_warmup(interpret: bool) -> None:
    global _WARMED
    if _WARMED or interpret:
        return
    _WARMED = True
    try:
        import jax.experimental.pallas as pl

        def _k(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        np.asarray(pl.pallas_call(
            _k, out_shape=jax.ShapeDtypeStruct((8, 128), _F32)
        )(jnp.zeros((8, 128), _F32)))
    except Exception:  # noqa: BLE001 — warm-up is best-effort
        pass


def _em_w(g0, g1, g2, f, fast_math: bool):
    """The EM weight ``(p1 + 2 p2) / (2 (p0 + p1 + p2))`` in two op
    orders: the canonical form (textually matching the XLA path) and the
    algebraically-reduced DEFAULT (``u = g1*f*(1-f) = p1/2`` =>
    ``(u + p2) / (p0 + 2u + p2)``, two fewer multiplies per element;
    ~1.2x measured on v5e).  The two are BIT-IDENTICAL for normal-range
    operands: every step of the rewrite multiplies an operand or a whole
    fraction by a power of two, and powers of two commute with IEEE-754
    rounding in the normal range — ``fl(2a ∘ 2b) = 2·fl(a ∘ b)`` and
    ``fl(2x/2y) = fl(x/y)``.  (The commutation does NOT hold for
    subnormal intermediates, and TPU flush-to-zero could let ``(2·g1)·f``
    survive where ``2·(g1·f)`` flushes; with f clamped to ``_EM_EPS`` and
    text-parsed GLs such operands are practically unreachable.  Verified
    empirically: exact equality in the unit test and 0.0 divergence over
    50 iterations at 1M sites on a v5e chip; ``--no_fast_em`` is the
    documented escape hatch.)"""
    omf = 1.0 - f
    if fast_math:
        u = g1 * f * omf
        p0 = g0 * omf * omf
        p2 = g2 * f * f
        return (u + p2) / (p0 + 2.0 * u + p2)
    p0 = g0 * omf * omf
    p1 = g1 * 2.0 * f * omf
    p2 = g2 * f * f
    return (p1 + 2.0 * p2) / (2.0 * (p0 + p1 + p2))


def _resolve_fast_math(fast_math, runtime) -> bool:
    if fast_math is not None:
        return bool(fast_math)
    return bool(getattr(runtime, "fast_math", True))


# Device-side initial-AF-state builders, cached per (shape, sharding,
# m_real).  The drivers used to build these [rows, M] panels on the host
# and upload them per invocation — 160 MB per LOO population at the 5M
# headline shape, ~2 s each over the ~90 MB/s tunnel (~40 s of the
# end-to-end wall-clock); a jitted on-device broadcast is ~0.4 s.
_INIT_FT_CACHE = {}


def _device_init_ft(shape, sharding=None, m_real=None):
    """``0.25`` on real sites (< ``m_real`` along the last axis; everywhere
    when ``m_real`` is None), ``_EM_EPS`` on padded sites — built on
    device.  ``sharding`` pins the output placement (multi-device)."""
    key = (tuple(shape), sharding, m_real)
    fn = _INIT_FT_CACHE.get(key)
    if fn is None:
        def body():
            if m_real is None:
                return jnp.full(shape, 0.25, _F32)
            row = jnp.where(
                jnp.arange(shape[-1]) < m_real, 0.25, _EM_EPS
            ).astype(_F32)
            return jnp.broadcast_to(row, shape) + 0.0
        fn = jax.jit(body, out_shardings=sharding)
        _INIT_FT_CACHE[key] = fn
    return fn()


def _device_init_ft_from_weight(sw, shape, sharding=None):
    """As :func:`_device_init_ft` but padding is wherever the site-weight
    vector is 0 (the reference-AF driver's contract allows interior
    zero-weight sites)."""
    key = ("from_weight", tuple(shape), sharding)
    fn = _INIT_FT_CACHE.get(key)
    if fn is None:
        def body(w):
            row = jnp.where(w > 0, 0.25, _EM_EPS).astype(_F32)
            return jnp.broadcast_to(row, shape) + 0.0
        fn = jax.jit(body, out_shardings=sharding)
        _INIT_FT_CACHE[key] = fn
    return fn(sw)


def _block_sites(m: int, n: int, align: int) -> int:
    lanes = -(-max(n, 1) // 128) * 128
    b = _BLOCK_OPERAND_BYTES // (2 * 4 * lanes)
    b = max(align, (b // align) * align)
    return min(m, b)


def _tile_m(m: int, n: int) -> int:
    """Pick the site-tile size for the chunk kernel.

    The tile is the lane (minor) dimension of the transposed ``[K, tile]``
    AF block, so Mosaic requires ``tile % 128 == 0``; the fused drivers
    pre-pad the site axis to a 128 multiple, so a >=128 divisor always
    exists there (the whole-array fallback in the last line remains only
    for direct kernel calls in interpret mode — on hardware an unaligned
    whole-array tile lowers pathologically).  At production scale
    ``to_device`` pads the site axis further (mesh.PALLAS_SITE_TILE); the
    128 floor means cohorts beyond ``MAX_FUSED_EM_INDIVIDUALS`` (8192,
    hardware-measured — see that constant) eventually fail Mosaic
    compilation — drivers auto-route those to the XLA path.
    """
    tile = _VMEM_BUDGET_BYTES // (2 * 4 * max(n, 1))
    tile = 1 << (int(tile).bit_length() - 1)  # floor to power of two
    tile = max(128, min(tile, 2048))
    while m % tile != 0 and tile > 128:
        tile //= 2
    return tile if m % tile == 0 else m  # fall back to one tile


def _em_chunk_kernel(
    g0_ref, g1_ref, ft_ref, onehot_ref, limits_ref, ftout_ref, sq_ref,
    *, T: int, K: int, inv_counts: Tuple[float, ...],
    fast_math: bool = False,
):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sq_ref[:] = jnp.zeros_like(sq_ref)

    g0 = g0_ref[:]
    g1 = g1_ref[:]
    g2 = 1.0 - g0 - g1      # iteration-invariant, hoisted out of the T loop
    onehot = onehot_ref[:]  # [K, N]
    limits = limits_ref[:]  # [1, K] float32 iteration limits per population
    f = ft_ref[:].T         # [K, tm] -> [tm, K], once per chunk

    acc_rows = []
    for t in range(T):
        # per-individual AF: exact f32 one-hot gather, unrolled over K
        f_ind = f[:, 0:1] * onehot[0:1, :]
        for k in range(1, K):
            f_ind += f[:, k : k + 1] * onehot[k : k + 1, :]
        # canonical: em_weights with g2 hoisted — identical op order
        # (bit-exact vs the XLA path, which the convergence-count tests
        # rely on); fast_math: see _em_w
        w = _em_w(g0, g1, g2, f_ind, fast_math)  # [tm, N]
        cols = [
            jnp.sum(w * onehot[k : k + 1, :], axis=1, keepdims=True)
            * inv_counts[k]
            for k in range(K)
        ]
        f_upd = jnp.clip(
            jnp.concatenate(cols, axis=1), _EM_EPS, 1.0 - _EM_EPS
        )
        f_new = jnp.where(limits > float(t), f_upd, f)  # [1,K] bcast
        d = f_new - f
        acc_rows.append(jnp.sum(d * d, axis=0, keepdims=True))  # [1, K]
        f = f_new

    ftout_ref[:] = f.T
    sq_ref[:] += jnp.concatenate(acc_rows, axis=0)  # [T, K]


@functools.partial(
    jax.jit, static_argnames=("inv_counts", "T", "interpret", "fast_math")
)
def em_chunk_pallas(g0, g1, ft, onehot, inv_counts, limits,
                    T: int, interpret: bool = False,
                    fast_math: bool = False):
    """One chunk of T fused EM iterations.

    Args:
      g0, g1: float32 ``[M, N]`` (local shard; padded rows must be the
        (1, 0) GL pattern and their ``ft`` entries ``EM_EPS``).
      ft: float32 ``[K, M]`` current AF panel, transposed layout.
      onehot: float32 ``[K, N]`` membership (transposed).
      inv_counts: tuple of K floats, 1/pop_size (static).
      limits: float32 ``[1, K]`` per-population update limits (<= T).
      T: chunk length (static).

    Returns ``(ft_new [K, M], sq [T, K])`` — sq[t, k] is the squared diff
    sum of iteration t for population k over this shard.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = g0.shape
    k = ft.shape[0]
    tm = _tile_m(m, n)
    grid = (m // tm,)
    kernel = functools.partial(
        _em_chunk_kernel, T=T, K=k, inv_counts=inv_counts,
        fast_math=fast_math,
    )
    ft_new, sq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, m), _F32),
            jax.ShapeDtypeStruct((T, k), _F32),
        ],
        # The T-unrolled iteration body keeps O(T-independent but ~20) live
        # [tile, N] f32 buffers on the Mosaic stack — past the conservative
        # 16 MB default scoped limit for wide cohorts (N >= ~160 at tile
        # 2048).  TPU cores have >= 64 MB of VMEM (128 MB on v4/v5); allow
        # half of the conservative bound.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(g0, g1, ft, onehot, limits)
    return ft_new, sq


@functools.partial(
    jax.jit,
    static_argnames=("size", "T", "inv_counts", "interpret", "fast_math"),
)
def _em_chunk_block(g0, g1, ft, onehot, inv_counts, limits, lo, size,
                    T: int, interpret: bool, fast_math: bool = False):
    """One site block of a fused chunk: slice the GL/AF operands inside jit
    (so only the block's lane-padded pallas copies materialize) and run the
    chunk kernel on the block."""
    g0b = jax.lax.dynamic_slice_in_dim(g0, lo, size, axis=0)
    g1b = jax.lax.dynamic_slice_in_dim(g1, lo, size, axis=0)
    ftb = jax.lax.dynamic_slice_in_dim(ft, lo, size, axis=1)
    return em_chunk_pallas(
        g0b, g1b, ftb, onehot, inv_counts, limits, T, interpret=interpret,
        fast_math=fast_math,
    )


# One traced+compiled shard_map program per distinct (mesh, chunk length,
# population weights, interpret) — without this cache every chunk invocation
# (x2 on replay, x site blocks) would rebuild the closure and retrace.
_SHARDED_CHUNK_CACHE = {}


def _sharded_chunk_fn(mesh, inv_counts, T: int, interpret: bool,
                      fast_math: bool = False):
    key = (mesh, inv_counts, T, interpret, fast_math)
    fn = _SHARDED_CHUNK_CACHE.get(key)
    if fn is not None:
        return fn
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from wgsassign_tpu.parallel.mesh import SNP_AXIS

    def body(g0s, g1s, fts, onehot_s, limits_s):
        ft_new, sq = em_chunk_pallas(
            g0s, g1s, fts, onehot_s, inv_counts, limits_s, T,
            interpret=interpret, fast_math=fast_math,
        )
        return ft_new, jax.lax.psum(sq, SNP_AXIS)

    fn = jax.jit(shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(SNP_AXIS, None), P(SNP_AXIS, None), P(None, SNP_AXIS),
            P(None, None), P(None, None),
        ),
        out_specs=(P(None, SNP_AXIS), P(None, None)),
        check_vma=False,
    ))
    _SHARDED_CHUNK_CACHE[key] = fn
    return fn


def em_chunk_sharded(runtime, g0, g1, ft, onehot, inv_counts,
                     limits, T: int, interpret: bool = False,
                     fast_math: bool = False):
    """Mesh-parallel wrapper: run the fused chunk kernel per device shard
    under ``shard_map`` and ``psum`` the squared-diff partials over the SNP
    axis.  ``ft`` is sharded along its site (second) axis."""
    fn = _sharded_chunk_fn(runtime.mesh, inv_counts, T, interpret,
                           fast_math)
    return fn(g0, g1, ft, onehot, limits)


def em_maf_pops_fused(
    g0,
    g1,
    membership: np.ndarray,
    site_weight,
    m_real: int,
    max_iter: int,
    tol: float,
    chunk: int = 16,
    interpret: bool = False,
    checkpoint=None,
    runtime=None,
    fast_math=None,
    return_device_panel: bool = False,
):
    """Driver: chunked fused EM with exact reference convergence semantics.

    Same contract as :func:`wgsassign_tpu.ops.emmaf.em_maf_pops` (returns
    ``(f [M, K], iters [K], converged [K])`` — ``f`` as a NumPy array) but
    host-orchestrated in chunks of fused Pallas iterations.  ``checkpoint``
    (an :class:`wgsassign_tpu.obs.checkpoint.EMCheckpoint`) enables periodic
    save + resume of the chunk state.

    ``return_device_panel=True`` returns the transposed ``[K, M_padded]``
    state as a DEVICE array instead (site-minor, unclamped) — callers that
    feed the panel straight back to device pipelines (the LOO mini-banks)
    skip a ~100 MB D2H+H2D round trip at production scale.
    """
    _mosaic_warmup(interpret)
    fast_math = _resolve_fast_math(fast_math, runtime)
    membership = np.asarray(membership, np.float32)
    n, k = membership.shape
    counts = membership.sum(axis=0)
    inv_counts = tuple(float(1.0 / c) for c in counts)
    m = g0.shape[0]
    sw_dev = jnp.asarray(site_weight)

    # pin the GL panels to device once — chunk calls with host numpy
    # panels re-upload them every chunk (and stall badly on tunneled
    # hosts); the model layer already passes device-resident cohorts
    if isinstance(g0, np.ndarray):
        g0 = jnp.asarray(g0)
    if isinstance(g1, np.ndarray):
        g1 = jnp.asarray(g1)

    # Mosaic requires the lane (site) axis of every [K, tile] block to be a
    # multiple of 128.  The whole-array fallback tile *compiles* for
    # unaligned m but lowers pathologically on real hardware (minutes-long
    # stalls — hardware-smoke finding), so align here: padded sites carry
    # the (1, 0) GL fixed point and zero weight, leaving trajectories and
    # convergence partials bit-identical.
    m_orig = m
    lane_pad = (-m) % 128
    if lane_pad:
        if runtime is not None and runtime.n_devices > 1:
            raise ValueError(
                f"fused EM on a {runtime.n_devices}-device mesh needs the "
                f"site axis pre-padded (got m={m}); use to_device / "
                "runtime.site_multiple()"
            )
        g0 = jnp.pad(jnp.asarray(g0), ((0, lane_pad), (0, 0)),
                     constant_values=1.0)
        g1 = jnp.pad(jnp.asarray(g1), ((0, lane_pad), (0, 0)),
                     constant_values=0.0)
        sw_dev = jnp.pad(sw_dev, (0, lane_pad))
        m += lane_pad

    # padded sites (zero weight) start at their fixed point (see module
    # docstring), so they contribute exactly zero to every convergence
    # partial; the state is built ON DEVICE — a host-built [K, M] panel
    # costs a multi-second tunnel upload at production M
    if runtime is not None and runtime.n_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wgsassign_tpu.parallel.mesh import SNP_AXIS

        ft_sharding = NamedSharding(runtime.mesh, P(None, SNP_AXIS))

        def put_ft(arr):
            return jax.device_put(np.ascontiguousarray(arr), ft_sharding)

        ft = _device_init_ft_from_weight(sw_dev, (k, m), ft_sharding)
        onehot = runtime.replicate(np.asarray(membership.T))
        block_m = _block_sites(m, n, 256 * runtime.n_devices)

        def run_block(lo, hi, ft_in, limits_arr, T):
            if lo == 0 and hi == m:
                return em_chunk_sharded(
                    runtime, g0, g1, ft_in, onehot,
                    inv_counts, limits_arr, T, interpret=interpret,
                    fast_math=fast_math,
                )
            # static slices of sharded arrays stay shard-local (bounds are
            # aligned to n_devices * 256)
            return em_chunk_sharded(
                runtime, g0[lo:hi], g1[lo:hi], ft_in[:, lo:hi], onehot,
                inv_counts, limits_arr, T, interpret=interpret,
                fast_math=fast_math,
            )

    else:
        def put_ft(arr):
            return jnp.asarray(np.ascontiguousarray(arr))

        ft = _device_init_ft_from_weight(sw_dev, (k, m))
        onehot = jnp.asarray(membership.T)
        block_m = _block_sites(m, n, 256)

        def run_block(lo, hi, ft_in, limits_arr, T):
            if lo == 0 and hi == m:
                return em_chunk_pallas(
                    g0, g1, ft_in, onehot, inv_counts, limits_arr, T,
                    interpret=interpret, fast_math=fast_math,
                )
            # dynamic_slice keyed on block *size* so all full blocks share
            # one compiled program (+1 for the tail block)
            return _em_chunk_block(
                g0, g1, ft_in, onehot, inv_counts, limits_arr,
                jnp.asarray(lo, jnp.int32), hi - lo, T, interpret,
                fast_math,
            )

    def run_chunk(ft_in, limits_arr, T):
        if block_m >= m:
            out = run_block(0, m, ft_in, limits_arr, T)
            return out
        fts, sq = [], None
        for lo in range(0, m, block_m):
            ftb, sqb = run_block(lo, min(lo + block_m, m), ft_in, limits_arr, T)
            fts.append(ftb)
            sq = sqb if sq is None else sq + sqb
        return jnp.concatenate(fts, axis=1), sq

    ft, iters, active = _drive_chunks(
        run_chunk, put_ft, ft, k, max_iter, tol, m_real, chunk, checkpoint
    )
    if return_device_panel:
        return ft, jnp.asarray(iters), jnp.asarray(~active)
    from wgsassign_tpu.parallel.mesh import fetch_to_host

    f = np.ascontiguousarray(fetch_to_host(ft).T[:m_orig])
    return f, jnp.asarray(iters), jnp.asarray(~active)


def _drive_chunks(run_chunk, put_ft, ft, n_problems, max_iter, tol, m_real,
                  chunk, checkpoint):
    """Shared chunk/replay orchestration for the fused EMs.

    ``run_chunk(ft, limits [1, P] f32, T)`` runs T fused iterations with
    per-problem update limits and returns ``(ft_new, sq [T, P])``.  The host
    reconstructs each problem's exact RMSE sequence from ``sq``; when a
    problem converges mid-chunk, the chunk is replayed from its snapshot
    with exact limits so the returned state matches a serial run that
    stopped each problem at its own convergence iteration (reference
    emMAF.py:15-27 semantics, batched).

    ``m_real`` may be a scalar (shared RMSE denominator) or a ``[P]``
    vector (per-problem site counts — the z-score batched EM).

    Returns ``(ft, iters [P] int32, active [P] bool)``.
    """
    m_real_vec = np.broadcast_to(
        np.asarray(m_real, np.float64), (n_problems,)
    )
    iters = np.full(n_problems, max_iter, dtype=np.int32)
    active = np.ones(n_problems, dtype=bool)
    it = 0
    if checkpoint is not None:
        state = checkpoint.load()
        if state is not None:
            ft_h2, iters, active, it = state
            ft = put_ft(np.asarray(ft_h2, np.float32))
            iters = np.asarray(iters, np.int32)
            active = np.asarray(active, bool)
    while it < max_iter and active.any():
        T = min(chunk, max_iter - it)
        limits_vec = np.where(active, T, 0).astype(np.float32)
        ft_snapshot = ft
        ft, sq = run_chunk(ft, jnp.asarray(limits_vec.reshape(1, -1)), T)
        rmse = np.sqrt(np.maximum(np.asarray(sq), 0.0) / m_real_vec[None, :])
        # first iteration (within chunk) at which each active problem converged
        crossed = rmse < tol  # [T, P]
        exact_limits = limits_vec.copy()
        replay = False
        for kk in range(n_problems):
            if not active[kk]:
                continue
            hits = np.flatnonzero(crossed[:T, kk])
            if hits.size:
                t_star = int(hits[0]) + 1  # updates taken when it converged
                iters[kk] = it + t_star
                active[kk] = False
                if t_star < T:
                    exact_limits[kk] = t_star
                    replay = True
        if replay:
            ft, _ = run_chunk(
                ft_snapshot, jnp.asarray(exact_limits.reshape(1, -1)), T
            )
        it += T
        if checkpoint is not None:
            checkpoint.maybe_save(ft, iters, active, it)
    if checkpoint is not None:
        checkpoint.clear()
    return ft, iters, active


# ---------------------------------------------------------------------------
# Fused leave-one-out EM — the headline LOO workload (reference
# glassy.py:47-112: N serial full EM re-runs; README.md:129-131 quotes
# ~30 min for 5M sites x 180 individuals).  One population's n_p
# leave-one-out problems run as a single [n_p, M] batched EM; this kernel
# additionally fuses T iterations per HBM read of the member GL panels,
# the same chunk/replay convergence machinery as the reference-AF kernel.
#
# The update needs the pairwise weight w[i, j, s] (member i's EM weight
# under problem j's AF) reduced over i.  Three formulations fail on
# hardware (round-3 measurements at n_p=96): a monolithic
# [n_p, n_p, tile] VMEM tensor busts the budget above n_p ~ 100; ANY 3-D
# formulation — including a problem-blocked [n_p, BJ, tile] — stalls
# Mosaic for minutes (245 s compile), because the leading dimension of
# 3-D elementwise ops is fully unrolled at compile time; and a rolled
# ``fori_loop`` over problems with in-place row updates compiles slowly
# AND executes ~100x off VPU estimates (dynamic-slice row writes defeat
# Mosaic's scheduling).
#
# The structure that works is the one the (hardware-proven) reference-AF
# chunk kernel uses: **problems on the grid**.  Grid (n_p, site_tiles);
# each grid step runs the statically-unrolled T-iteration EM for ONE
# problem on one site tile — pure 2-D [np_pad, tile] VPU ops, no in-kernel
# loops, no dynamic indexing.  The GL panels are NOT duplicated per
# problem: their BlockSpec index map sends every problem row to the same
# [np_pad, tile] block, so HBM holds one copy and VMEM re-fetches it per
# (problem, tile) step (compute/DMA ratio 12·T/8 flops per byte — far
# above the VPU:HBM balance point, so the refetch hides).  The problem's
# own row (and padded member rows) is excluded with an iota mask against
# ``program_id(0)`` — the same mask-multiply sum as the XLA path, keeping
# float32 rounding, trajectories and convergence iteration counts
# bit-identical to ``em_maf_loo_group``.  The site-minor [n_p, M] layout
# keeps the big M axis on lanes (the member axis pads to 8 sublanes only).
# ---------------------------------------------------------------------------

# VMEM working-set target for one LOO grid step: double-buffered
# [np_pad, tile] GL blocks and ~4 live fused temporaries.  Deliberately
# below the 64 MB vmem_limit_bytes so Mosaic has headroom and never
# spills.
_LOO_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _loo_step_bytes(np_pad: int, tile: int) -> int:
    """Estimated VMEM bytes for one (problem, site-tile) grid step."""
    panels = 2 * 2 * np_pad * tile   # g0/g1 in, double buffered
    temps = 4 * np_pad * tile        # p0/p1/p2/w live f32 temporaries
    state = 8 * tile                 # f rows / update temporaries
    return 4 * (panels + temps + state)


def _loo_block_sizes(m: int, n_p: int):
    """Pick ``(np_pad, tile)``: member==problem axis rounded to 8 sublanes
    (padded members are masked in-kernel, padded problems get zero
    iteration limits), site tile grown while the working set fits."""
    np_pad = -(-n_p // 8) * 8
    tile = 128
    while (
        tile < 1024
        and m % (tile * 2) == 0
        and _loo_step_bytes(np_pad, tile * 2) <= _LOO_VMEM_BUDGET_BYTES
    ):
        tile *= 2
    if m % tile != 0:  # interpret-mode direct calls on unaligned arrays
        tile = m
    return np_pad, tile


def max_fused_loo_members() -> int:
    """Largest member count the kernel runs within the VMEM budget at the
    128-lane floor tile."""
    np8 = 8
    while _loo_step_bytes(np8 + 8, 128) <= _LOO_VMEM_BUDGET_BYTES:
        np8 += 8
    return min(np8, 1024)


def _loo_chunk_kernel(g0_ref, g1_ref, ft_ref, limits_ref, nreal_ref,
                      ftout_ref, sq_ref, *, T: int, NP_PAD: int,
                      fast_math: bool = False):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        sq_ref[:] = jnp.zeros_like(sq_ref)

    g0 = g0_ref[:]              # [NP_PAD, tile] — all members' GLs
    g1 = g1_ref[:]
    g2 = 1.0 - g0 - g1          # iteration-invariant
    j = pl.program_id(0)        # this grid row's LOO problem index
    row = jax.lax.broadcasted_iota(jnp.int32, (NP_PAD, 1), 0)
    # member i participates in problem j iff i != j and i is real — the
    # same mask-multiply n-term sum as the XLA path (float32 rounding,
    # trajectories and iteration counts stay bit-identical).  n_real is a
    # RUNTIME scalar so one compiled program serves every population with
    # the same padded member count (K compile classes -> #distinct
    # np_pad; f32 division of the exact small integer is correctly
    # rounded, identical to the former compile-time constant).
    n_real = nreal_ref[0, 0, 0]
    keep = ((row != j) & (row < n_real)).astype(_F32)
    lim = limits_ref[0, 0, 0]   # scalar update limit for this problem
    inv = 1.0 / (n_real.astype(_F32) - 1.0)
    f = ft_ref[0]               # [1, tile] — problem j's AF on this tile

    acc = []
    for t in range(T):
        w = _em_w(g0, g1, g2, f, fast_math)            # [NP_PAD, tile]
        f_upd = jnp.sum(w * keep, axis=0, keepdims=True) * inv
        f_upd = jnp.clip(f_upd, _EM_EPS, 1.0 - _EM_EPS)
        f_new = jnp.where(lim > float(t), f_upd, f)
        d = f_new - f
        acc.append(jnp.sum(d * d, axis=1, keepdims=True))  # [1, 1]
        f = f_new

    ftout_ref[0] = f
    sq_ref[0] = sq_ref[0] + jnp.concatenate(acc, axis=0)  # [T, 1]


@functools.partial(
    jax.jit, static_argnames=("T", "interpret", "fast_math")
)
def loo_chunk_pallas(g0p, g1p, ft, limits, n_real, T: int,
                     interpret: bool = False, fast_math: bool = False):
    """One chunk of T fused LOO EM iterations for one population.

    Args:
      g0p, g1p: float32 ``[np_pad, M]`` member GL panels, site-minor.
        Padded site columns and padded member rows (>= ``n_real``) must
        hold the (1, 0) GL pattern.
      ft: float32 ``[np_pad, M]`` current per-problem AF (padded sites at
        ``EM_EPS`` — their fixed point, so they add 0 to the partials).
      limits: float32 ``[1, np_pad]`` per-problem update limits (<= T;
        0 for padded problem rows).
      n_real: real member count (the LOO divisor is ``n_real - 1``) — a
        RUNTIME value, so one compiled program per ``np_pad`` serves all
        populations (the cold-start shape-class dedup, VERDICT r4 #6).
      T: chunk length (static).

    Returns ``(ft_new [np_pad, M], sq [T, np_pad])``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np_pad, m = g0p.shape
    np_pad2, tile = _loo_block_sizes(m, np_pad)
    if np_pad2 != np_pad:
        raise ValueError(
            f"member axis {np_pad} not a sublane multiple; use "
            "em_maf_loo_group_fused (it pads via _loo_block_sizes)"
        )
    grid = (np_pad, m // tile)  # problems outer, site tiles inner
    kernel = functools.partial(
        _loo_chunk_kernel, T=T, NP_PAD=np_pad, fast_math=fast_math,
    )
    # per-problem state/limits/partials travel with a leading problem axis
    # whose block size is 1 (Mosaic's block rules apply to the last two
    # dims only); the GL panels are NOT duplicated — their index map sends
    # every problem row to the same block
    ft3 = ft.reshape(np_pad, 1, m)
    limits3 = limits.reshape(np_pad, 1, 1)
    nreal3 = jnp.asarray(n_real, jnp.int32).reshape(1, 1, 1)
    ft_new, sq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((np_pad, tile), lambda j, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_pad, tile), lambda j, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda j, s: (j, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda j, s: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda j, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda j, s: (j, 0, s),
                         memory_space=pltpu.VMEM),
            # constant across a problem's site sweep: accumulates in VMEM,
            # flushed when the problem row advances
            pl.BlockSpec((1, T, 1), lambda j, s: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_pad, 1, m), _F32),
            jax.ShapeDtypeStruct((np_pad, T, 1), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(g0p, g1p, ft3, limits3, nreal3)
    return ft_new.reshape(np_pad, m), sq[:, :, 0].T


# One traced shard_map program per (mesh, T, interpret) — the LOO
# analogue of _SHARDED_CHUNK_CACHE.  n_real travels as a replicated
# runtime scalar, so all populations with one np_pad share one program.
_SHARDED_LOO_CACHE = {}


def _sharded_loo_chunk_fn(mesh, T: int, interpret: bool,
                          fast_math: bool = False):
    key = (mesh, T, interpret, fast_math)
    fn = _SHARDED_LOO_CACHE.get(key)
    if fn is not None:
        return fn
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from wgsassign_tpu.parallel.mesh import SNP_AXIS

    def body(g0s, g1s, fts, limits_s, nreal_s):
        ft_new, sq = loo_chunk_pallas(
            g0s, g1s, fts, limits_s, nreal_s[0], T, interpret=interpret,
            fast_math=fast_math,
        )
        return ft_new, jax.lax.psum(sq, SNP_AXIS)

    fn = jax.jit(shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, SNP_AXIS), P(None, SNP_AXIS), P(None, SNP_AXIS),
            P(None, None), P(None),
        ),
        out_specs=(P(None, SNP_AXIS), P(None, None)),
        check_vma=False,
    ))
    _SHARDED_LOO_CACHE[key] = fn
    return fn


# Auto-fallback bound for the fused LOO EM.  The problems-on-grid kernel
# keeps only 2-D [np_pad, tile] working sets in VMEM, so the bound is
# where even the 128-lane floor tile no longer fits the budget — ~1000
# members (capped), vs ~100 for the round-2 monolithic kernel.
# Populations above it fall back to the XLA while-loop path in the caller.
MAX_FUSED_LOO_MEMBERS = max_fused_loo_members()


@functools.partial(
    jax.jit,
    static_argnames=("size", "T", "interpret", "fast_math"),
)
def _loo_chunk_block(g0p, g1p, ft, limits, lo, size, n_real, T: int,
                     interpret: bool, fast_math: bool = False):
    """One site block of a fused LOO chunk: slice the member panels and AF
    state inside jit (so only the block's layout-converted pallas copies
    materialize — at 5M sites the whole-array copies alone OOM a 16 GB
    chip next to the cohort and the AF bank) and run the chunk kernel on
    the block."""
    g0b = jax.lax.dynamic_slice_in_dim(g0p, lo, size, axis=1)
    g1b = jax.lax.dynamic_slice_in_dim(g1p, lo, size, axis=1)
    ftb = jax.lax.dynamic_slice_in_dim(ft, lo, size, axis=1)
    return loo_chunk_pallas(g0b, g1b, ftb, limits, n_real, T,
                            interpret=interpret, fast_math=fast_math)


def _loo_stream_block(m: int, np_pad: int, align: int) -> int:
    """Site-block length for streaming a LOO chunk over HBM-peak-bounded
    operand windows.  With the ``[n_p + 1, M]`` mini-banks (no ``[N+K, M]``
    AF bank resident — models/loo.py), the headline 5M x 180 shape leaves
    several GB of headroom next to the cohort, so the budget allows the
    whole member panel's lane-padded copies (~1.6 GB there) in one window
    — each extra site block costs a full dispatch round trip on tunneled
    hosts (~100 ms each, measured round 4: 7 blocks x ~20 dispatches/pop
    was ~2.5 s/pop of pure latency).  Wide-member populations (np_pad up
    to 1024) still stream in bounded blocks via the divisor."""
    b = (2 * _BLOCK_OPERAND_BYTES) // (2 * 4 * max(np_pad, 1))
    b = max(align, (b // align) * align)
    return min(m, b)


def em_maf_loo_group_fused(
    g0p,
    g1p,
    m_real: int,
    max_iter: int,
    tol: float,
    chunk: int = 8,
    interpret: bool = False,
    checkpoint=None,
    runtime=None,
    fast_math=None,
):
    """Driver: chunked fused LOO EM for one population.

    Same contract as :func:`wgsassign_tpu.ops.emmaf.em_maf_loo_group`
    (returns ``(f [n_p, M] device array, iters [n_p], converged [n_p])``)
    with the multi-iteration-per-HBM-read Pallas kernel and exact
    convergence semantics via chunk replay.  Sites >= ``m_real`` must carry
    the (1, 0) padding GL pattern.
    """
    _mosaic_warmup(interpret)
    fast_math = _resolve_fast_math(fast_math, runtime)
    n_p, m = g0p.shape

    # pin the member panels to device once — chunk calls with host numpy
    # panels would re-upload them every chunk (and stall badly on tunneled
    # hosts); the model layer already passes device-resident gathers
    if isinstance(g0p, np.ndarray):
        g0p = jnp.asarray(g0p)
    if isinstance(g1p, np.ndarray):
        g1p = jnp.asarray(g1p)

    # lane alignment, as in em_maf_pops_fused: unaligned site axes lower
    # pathologically through Mosaic; pad with the (1, 0) fixed-point GL
    m_orig = m
    lane_pad = (-m) % 128
    if lane_pad:
        if runtime is not None and runtime.n_devices > 1:
            raise ValueError(
                f"fused LOO EM on a {runtime.n_devices}-device mesh needs "
                f"the site axis pre-padded (got m={m}); use to_device / "
                "runtime.site_multiple()"
            )
        g0p = jnp.pad(jnp.asarray(g0p), ((0, 0), (0, lane_pad)),
                      constant_values=1.0)
        g1p = jnp.pad(jnp.asarray(g1p), ((0, 0), (0, lane_pad)),
                      constant_values=0.0)
        m += lane_pad

    # member==problem axis padding up to the sublane multiple (padded member
    # rows carry the (1, 0) GL pattern and are masked out of every sum
    # in-kernel; padded problem rows get zero iteration limits and are
    # sliced off the returned state/partials)
    np_pad, _tile = _loo_block_sizes(m, n_p)
    row_pad = np_pad - n_p
    if row_pad:
        g0p = jnp.pad(jnp.asarray(g0p), ((0, row_pad), (0, 0)),
                      constant_values=1.0)
        g1p = jnp.pad(jnp.asarray(g1p), ((0, row_pad), (0, 0)),
                      constant_values=0.0)

    # padded sites start at their fixed point (f = EPS under the (1, 0) GL
    # pattern) so they contribute exactly zero to the convergence
    # partials; built ON DEVICE — the host-built [np_pad, M] panel cost a
    # ~2 s tunnel upload PER POPULATION at the 5M headline shape

    def pad_limits(limits_arr):
        if not row_pad:
            return limits_arr
        return jnp.pad(limits_arr, ((0, 0), (0, row_pad)))

    if runtime is not None and runtime.n_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wgsassign_tpu.parallel.mesh import SNP_AXIS

        ft_sharding = NamedSharding(runtime.mesh, P(None, SNP_AXIS))

        def put_ft(arr):
            return jax.device_put(np.ascontiguousarray(arr), ft_sharding)

        block_m = _loo_stream_block(m, np_pad, 256 * runtime.n_devices)

        nreal_arr = np.asarray([n_p], np.int32)

        def run_block(lo, hi, ft_in, limits_arr, T):
            fn = _sharded_loo_chunk_fn(runtime.mesh, T, interpret,
                                       fast_math)
            if lo == 0 and hi == m:
                return fn(g0p, g1p, ft_in, limits_arr, nreal_arr)
            # static slices of sharded arrays stay shard-local (bounds are
            # aligned to n_devices * 256)
            return fn(g0p[:, lo:hi], g1p[:, lo:hi], ft_in[:, lo:hi],
                      limits_arr, nreal_arr)

    else:
        def put_ft(arr):
            return jnp.asarray(np.ascontiguousarray(arr))

        block_m = _loo_stream_block(m, np_pad, 128)

        nreal_s = np.int32(n_p)

        def run_block(lo, hi, ft_in, limits_arr, T):
            if lo == 0 and hi == m:
                return loo_chunk_pallas(
                    g0p, g1p, ft_in, limits_arr, nreal_s, T,
                    interpret=interpret, fast_math=fast_math,
                )
            # dynamic_slice keyed on block *size* so all full blocks share
            # one compiled program (+1 for the tail block)
            return _loo_chunk_block(
                g0p, g1p, ft_in, limits_arr,
                jnp.asarray(lo, jnp.int32), hi - lo, nreal_s, T, interpret,
                fast_math,
            )

    def run_chunk(ft_in, limits_arr, T):
        limits_arr = pad_limits(limits_arr)
        if block_m >= m:
            ft_new, sq = run_block(0, m, ft_in, limits_arr, T)
            return ft_new, sq[:, :n_p]
        fts, sq = [], None
        for lo in range(0, m, block_m):
            ftb, sqb = run_block(lo, min(lo + block_m, m), ft_in,
                                 limits_arr, T)
            fts.append(ftb)
            sq = sqb if sq is None else sq + sqb
        return jnp.concatenate(fts, axis=1), sq[:, :n_p]

    ft = _device_init_ft(
        (np_pad, m),
        ft_sharding if (runtime is not None and runtime.n_devices > 1)
        else None,
        m_real,
    )
    ft, iters, active = _drive_chunks(
        run_chunk, put_ft, ft, n_p, max_iter, tol, m_real, chunk, checkpoint
    )
    if m != m_orig or row_pad:
        ft = ft[:n_p, :m_orig]
    return ft, jnp.asarray(iters), jnp.asarray(~active)


# ---------------------------------------------------------------------------
# Fused per-problem-site-subset EM — the z-score reference mode's batched
# "LOO EM restricted to the individual's kept sites" (reference
# WGSassign.py:352-364, a serial per-individual host loop; README.md:218
# calls the z pipeline its computational bottleneck).  Same contract as
# ops.emmaf.em_maf_sites_batch ([B, P, S] gathered member panels, per-problem
# member masks / site weights / RMSE denominators), with the fused
# multi-iteration-per-HBM-read chunking and exact per-problem convergence
# via the shared chunk/replay driver.
# ---------------------------------------------------------------------------


def _sites_step_bytes(p: int, tile: int) -> int:
    """Estimated VMEM bytes for one (problem, site-tile) grid step: the
    double-buffered [P, tile] GL panels plus ~4 live fused temporaries."""
    return 4 * (2 * 2 * p * tile + 4 * p * tile + 4 * tile)


def _sites_tile(s: int, p: int) -> int:
    tile = 128
    while (
        tile < 1024
        and s % (tile * 2) == 0
        and _sites_step_bytes(p, tile * 2) <= _LOO_VMEM_BUDGET_BYTES
    ):
        tile *= 2
    if s % tile != 0:  # unaligned site axes: one whole-array tile
        tile = s
    return tile


def max_fused_sites_members() -> int:
    """Largest member-panel depth P the sites-batch kernel runs within the
    VMEM budget at the 128-lane floor tile."""
    p = 8
    while _sites_step_bytes(p + 8, 128) <= _LOO_VMEM_BUDGET_BYTES:
        p += 8
    return p


MAX_FUSED_SITES_MEMBERS = max_fused_sites_members()


def _sites_chunk_kernel(g0_ref, g1_ref, ft_ref, mask_ref, sw_ref, lim_ref,
                        inv_ref, ftout_ref, sq_ref, *, T: int,
                        fast_math: bool = False):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        sq_ref[:] = jnp.zeros_like(sq_ref)

    g0 = g0_ref[0]            # [P, tile] — problem b's gathered member GLs
    g1 = g1_ref[0]
    g2 = 1.0 - g0 - g1        # iteration-invariant
    mask_col = mask_ref[0].T  # [P, 1] member participation
    sw = sw_ref[0]            # [1, tile] site weight (kept-site mask)
    lim = lim_ref[0, 0, 0]    # scalar iteration limit for this problem
    inv = inv_ref[0, 0, 0]    # scalar 1/member-count
    f = ft_ref[0]             # [1, tile]

    acc_rows = []
    for t in range(T):
        # same op order as em_maf_sites_batch's update (bit-matching
        # trajectories, which the equivalence tests rely on)
        w = _em_w(g0, g1, g2, f, fast_math)                 # [P, tile]
        f_upd = jnp.sum(w * mask_col, axis=0, keepdims=True) * inv
        f_upd = jnp.clip(f_upd, _EM_EPS, 1.0 - _EM_EPS)
        f_new = jnp.where(lim > float(t), f_upd, f)
        d = f_new - f
        acc_rows.append(jnp.sum(d * d * sw, axis=1, keepdims=True))  # [1, 1]
        f = f_new

    ftout_ref[0] = f
    sq_ref[0] = sq_ref[0] + jnp.concatenate(acc_rows, axis=0)  # [T, 1]


@functools.partial(jax.jit, static_argnames=("T", "interpret", "fast_math"))
def sites_chunk_pallas(g0p, g1p, ft, member_mask, site_weight, limits,
                       inv_counts, T: int, interpret: bool = False,
                       fast_math: bool = False):
    """One chunk of T fused iterations of the sites-batch EM.

    Args:
      g0p, g1p: float32 ``[B, P, S]`` gathered member GL panels.
      ft: float32 ``[B, 1, S]`` current per-problem AF.
      member_mask: float32 ``[B, 1, P]``.
      site_weight: float32 ``[B, 1, S]``.
      limits: float32 ``[B, 1, 1]`` per-problem update limits (<= T).
      inv_counts: float32 ``[B, 1, 1]`` per-problem 1/member-count.

    Returns ``(ft_new [B, 1, S], sq [T, B])``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, p, s = g0p.shape
    tile = _sites_tile(s, p)
    grid = (b, s // tile)  # problems outer, site tiles inner
    kernel = functools.partial(_sites_chunk_kernel, T=T, fast_math=fast_math)
    ft_new, sq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, p, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            # constant within a problem's site sweep: accumulates in VMEM
            pl.BlockSpec((1, T, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, s), _F32),
            jax.ShapeDtypeStruct((b, T, 1), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(g0p, g1p, ft, member_mask, site_weight, limits, inv_counts)
    return ft_new, sq[:, :, 0].T


# ---------------------------------------------------------------------------
# Fused LOO-subset EM — the shard-local z-score reference-mode EM
# (ops/emmaf.py::em_maf_loo_subset semantics: B leave-one-out problems of
# one population over the FULL site axis, kept-site masks entering only
# the convergence partials).  Same problems-on-grid structure as the LOO
# kernel — the member GL panel is shared across problems (one HBM copy,
# re-fetched per grid step), which is exactly what removes the [B, P, S]
# cross-shard gather that dominated the gathered formulation on a mesh.
# ---------------------------------------------------------------------------


def _zloo_chunk_kernel(g0_ref, g1_ref, ft_ref, sw_ref, leave_ref,
                       limits_ref, nreal_ref, ftout_ref, sq_ref,
                       *, T: int, NP_PAD: int,
                       fast_math: bool = False):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        sq_ref[:] = jnp.zeros_like(sq_ref)

    g0 = g0_ref[:]              # [NP_PAD, tile] — all members' GLs
    g1 = g1_ref[:]
    g2 = 1.0 - g0 - g1          # iteration-invariant
    row = jax.lax.broadcasted_iota(jnp.int32, (NP_PAD, 1), 0)
    lv = leave_ref[0, 0, 0]     # member row this problem leaves out
    # runtime member count — one compiled program per np_pad serves every
    # population (see _loo_chunk_kernel; f32 division of the exact small
    # integer is correctly rounded, identical to a baked-in constant)
    n_real = nreal_ref[0, 0, 0]
    keep = ((row != lv) & (row < n_real)).astype(_F32)
    lim = limits_ref[0, 0, 0]   # scalar update limit for this problem
    inv = 1.0 / (n_real.astype(_F32) - 1.0)
    sw = sw_ref[0]              # [1, tile] — this problem's kept-site mask
    f = ft_ref[0]               # [1, tile]

    acc = []
    for t in range(T):
        # same op order as em_maf_loo_subset's update (bit-matching
        # trajectories at every site); fast_math: see _em_w
        w = _em_w(g0, g1, g2, f, fast_math)            # [NP_PAD, tile]
        f_upd = jnp.sum(w * keep, axis=0, keepdims=True) * inv
        f_upd = jnp.clip(f_upd, _EM_EPS, 1.0 - _EM_EPS)
        f_new = jnp.where(lim > float(t), f_upd, f)
        d = f_new - f
        acc.append(jnp.sum(d * d * sw, axis=1, keepdims=True))  # [1, 1]
        f = f_new

    ftout_ref[0] = f
    sq_ref[0] = sq_ref[0] + jnp.concatenate(acc, axis=0)  # [T, 1]


@functools.partial(
    jax.jit, static_argnames=("T", "interpret", "fast_math")
)
def zloo_chunk_pallas(g0p, g1p, ft, sw, leave, limits, n_real, T: int,
                      interpret: bool = False, fast_math: bool = False):
    """One chunk of T fused LOO-subset EM iterations.

    Args:
      g0p, g1p: float32 ``[np_pad, M]`` member GL panels, site-minor
        (padded site columns and member rows >= ``n_real`` hold (1, 0)).
      ft: float32 ``[B, 1, M]`` per-problem AF state.
      sw: float32 ``[B, 1, M]`` per-problem kept-site masks (0 on padding).
      leave: int32 ``[B, 1, 1]`` member row each problem leaves out.
      limits: float32 ``[B, 1, 1]`` per-problem update limits (<= T).
      n_real: real member count (LOO divisor ``n_real - 1``).

    Returns ``(ft_new [B, 1, M], sq [T, B])``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    np_pad, m = g0p.shape
    b = ft.shape[0]
    np_pad2, tile = _loo_block_sizes(m, np_pad)
    if np_pad2 != np_pad:
        raise ValueError(
            f"member axis {np_pad} not a sublane multiple; use "
            "em_maf_loo_subset_fused (it pads via _loo_block_sizes)"
        )
    grid = (b, m // tile)  # problems outer, site tiles inner
    kernel = functools.partial(
        _zloo_chunk_kernel, T=T, NP_PAD=np_pad, fast_math=fast_math,
    )
    nreal3 = jnp.asarray(n_real, jnp.int32).reshape(1, 1, 1)
    ft_new, sq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((np_pad, tile), lambda i, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_pad, tile), lambda i, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda i, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, m), _F32),
            jax.ShapeDtypeStruct((b, T, 1), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(g0p, g1p, ft, sw, leave, limits, nreal3)
    return ft_new, sq[:, :, 0].T


# One traced shard_map program per (mesh, T, interpret) — n_real travels
# as a replicated runtime scalar (shape-class dedup, see the LOO cache).
_SHARDED_ZLOO_CACHE = {}


def _sharded_zloo_chunk_fn(mesh, T: int, interpret: bool,
                           fast_math: bool = False):
    key = (mesh, T, interpret, fast_math)
    fn = _SHARDED_ZLOO_CACHE.get(key)
    if fn is not None:
        return fn
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from wgsassign_tpu.parallel.mesh import SNP_AXIS

    def body(g0s, g1s, fts, sws, leave_s, limits_s, nreal_s):
        ft_new, sq = zloo_chunk_pallas(
            g0s, g1s, fts, sws, leave_s, limits_s, nreal_s[0], T,
            interpret=interpret, fast_math=fast_math,
        )
        return ft_new, jax.lax.psum(sq, SNP_AXIS)

    fn = jax.jit(shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, SNP_AXIS), P(None, SNP_AXIS),
            P(None, None, SNP_AXIS), P(None, None, SNP_AXIS),
            P(None, None, None), P(None, None, None), P(None),
        ),
        out_specs=(P(None, None, SNP_AXIS), P(None, None)),
        check_vma=False,
    ))
    _SHARDED_ZLOO_CACHE[key] = fn
    return fn


def em_maf_loo_subset_fused(
    g0p,
    g1p,
    leave_out,
    site_weight,
    m_real,
    max_iter: int,
    tol,
    chunk: int = 8,
    interpret: bool = False,
    checkpoint=None,
    runtime=None,
    fast_math=None,
):
    """Driver: chunked fused LOO-subset EM.

    Same contract as :func:`wgsassign_tpu.ops.emmaf.em_maf_loo_subset`
    (returns ``(f [B, M] device array, iters [B], converged [B])``) with
    the multi-iteration-per-HBM-read kernel and exact per-problem
    convergence via chunk replay.  On a multi-device ``runtime`` the site
    axis is sharded under shard_map with psum'd partials — all panel
    traffic is shard-local by construction.
    """
    _mosaic_warmup(interpret)
    fast_math = _resolve_fast_math(fast_math, runtime)
    n_p, m = np.shape(g0p)
    leave_h = np.asarray(leave_out, np.int32)
    b = leave_h.shape[0]

    if isinstance(g0p, np.ndarray):
        g0p = jnp.asarray(g0p)
    if isinstance(g1p, np.ndarray):
        g1p = jnp.asarray(g1p)
    sw = jnp.asarray(site_weight, _F32)  # may already be device-resident

    # lane alignment (site axis) + member-row padding, as in the LOO driver
    m_orig = m
    lane_pad = (-m) % 128
    if lane_pad:
        if runtime is not None and runtime.n_devices > 1:
            raise ValueError(
                f"fused LOO-subset EM on a {runtime.n_devices}-device mesh "
                f"needs the site axis pre-padded (got m={m})"
            )
        g0p = jnp.pad(g0p, ((0, 0), (0, lane_pad)), constant_values=1.0)
        g1p = jnp.pad(g1p, ((0, 0), (0, lane_pad)), constant_values=0.0)
        sw = jnp.pad(sw, ((0, 0), (0, lane_pad)))
        m += lane_pad
    np_pad, _tile = _loo_block_sizes(m, n_p)
    row_pad = np_pad - n_p
    if row_pad:
        g0p = jnp.pad(g0p, ((0, row_pad), (0, 0)), constant_values=1.0)
        g1p = jnp.pad(g1p, ((0, row_pad), (0, 0)), constant_values=0.0)

    sw3 = jnp.reshape(sw, (b, 1, m))
    leave3_h = leave_h.reshape(b, 1, 1)

    if runtime is not None and runtime.n_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wgsassign_tpu.parallel.mesh import SNP_AXIS

        sharding3 = NamedSharding(runtime.mesh, P(None, None, SNP_AXIS))
        sw3 = jax.device_put(sw3, sharding3)
        leave3 = runtime.replicate(leave3_h)

        def put_ft(arr):
            return jax.device_put(np.ascontiguousarray(arr), sharding3)

        block_m = _loo_stream_block(m, np_pad, 256 * runtime.n_devices)

        nreal_arr = np.asarray([n_p], np.int32)

        def run_block(lo, hi, ft_in, sw_in, limits_arr, T):
            fn = _sharded_zloo_chunk_fn(runtime.mesh, T, interpret,
                                        fast_math)
            if lo == 0 and hi == m:
                return fn(g0p, g1p, ft_in, sw_in, leave3, limits_arr,
                          nreal_arr)
            return fn(g0p[:, lo:hi], g1p[:, lo:hi], ft_in[:, :, lo:hi],
                      sw_in[:, :, lo:hi], leave3, limits_arr, nreal_arr)

    else:
        leave3 = jnp.asarray(leave3_h)

        def put_ft(arr):
            return jnp.asarray(np.ascontiguousarray(arr))

        block_m = _loo_stream_block(m, np_pad, 128)

        nreal_s = np.int32(n_p)

        def run_block(lo, hi, ft_in, sw_in, limits_arr, T):
            if lo == 0 and hi == m:
                return zloo_chunk_pallas(
                    g0p, g1p, ft_in, sw_in, leave3, limits_arr, nreal_s, T,
                    interpret=interpret, fast_math=fast_math,
                )
            return _zloo_chunk_block(
                g0p, g1p, ft_in, sw_in, leave3, limits_arr,
                jnp.asarray(lo, jnp.int32), hi - lo, nreal_s, T, interpret,
                fast_math,
            )

    def run_chunk(ft_in, limits_arr, T):
        limits3 = limits_arr.reshape(b, 1, 1)
        if block_m >= m:
            return run_block(0, m, ft_in, sw3, limits3, T)
        fts, sq = [], None
        for lo in range(0, m, block_m):
            ftb, sqb = run_block(lo, min(lo + block_m, m), ft_in, sw3,
                                 limits3, T)
            fts.append(ftb)
            sq = sqb if sq is None else sq + sqb
        return jnp.concatenate(fts, axis=2), sq

    ft0 = _device_init_ft(
        (b, 1, m),
        sharding3 if (runtime is not None and runtime.n_devices > 1)
        else None,
    )
    ft, iters, active = _drive_chunks(
        run_chunk, put_ft, ft0, b, max_iter, tol, m_real, chunk,
        checkpoint,
    )
    f = jax.jit(lambda x: x[:, 0, :m_orig])(ft)
    return f, jnp.asarray(iters), jnp.asarray(~active)


@functools.partial(
    jax.jit,
    static_argnames=("size", "T", "interpret", "fast_math"),
)
def _zloo_chunk_block(g0p, g1p, ft, sw, leave, limits, lo, size,
                      n_real, T: int, interpret: bool,
                      fast_math: bool = False):
    """One site block of a fused LOO-subset chunk (HBM-peak control, as in
    _loo_chunk_block)."""
    g0b = jax.lax.dynamic_slice_in_dim(g0p, lo, size, axis=1)
    g1b = jax.lax.dynamic_slice_in_dim(g1p, lo, size, axis=1)
    ftb = jax.lax.dynamic_slice_in_dim(ft, lo, size, axis=2)
    swb = jax.lax.dynamic_slice_in_dim(sw, lo, size, axis=2)
    return zloo_chunk_pallas(g0b, g1b, ftb, swb, leave, limits, n_real, T,
                             interpret=interpret, fast_math=fast_math)


# One traced shard_map program per (mesh, T, interpret) — the sites-batch
# analogue of _SHARDED_CHUNK_CACHE (the z-score reference-mode EM on a
# multi-device mesh; reference bottleneck README.md:218).
_SHARDED_SITES_CACHE = {}


def _sharded_sites_chunk_fn(mesh, T: int, interpret: bool,
                            fast_math: bool = False):
    key = (mesh, T, interpret, fast_math)
    fn = _SHARDED_SITES_CACHE.get(key)
    if fn is not None:
        return fn
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from wgsassign_tpu.parallel.mesh import SNP_AXIS

    def body(g0s, g1s, fts, mask_s, sw_s, limits_s, inv_s):
        ft_new, sq = sites_chunk_pallas(
            g0s, g1s, fts, mask_s, sw_s, limits_s, inv_s, T,
            interpret=interpret, fast_math=fast_math,
        )
        return ft_new, jax.lax.psum(sq, SNP_AXIS)

    fn = jax.jit(shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None, SNP_AXIS), P(None, None, SNP_AXIS),
            P(None, None, SNP_AXIS), P(None, None, None),
            P(None, None, SNP_AXIS), P(None, None, None),
            P(None, None, None),
        ),
        out_specs=(P(None, None, SNP_AXIS), P(None, None)),
        check_vma=False,
    ))
    _SHARDED_SITES_CACHE[key] = fn
    return fn


def em_maf_sites_batch_fused(
    g0p,
    g1p,
    member_mask,
    site_weight,
    m_real,
    max_iter: int,
    tol,
    chunk: int = 8,
    interpret: bool = False,
    checkpoint=None,
    runtime=None,
    fast_math=None,
):
    """Driver: chunked fused sites-batch EM.

    Same contract as :func:`wgsassign_tpu.ops.emmaf.em_maf_sites_batch`
    (returns ``(f [B, S], iters [B], converged [B])``) with the
    multi-iteration Pallas kernel and exact per-problem convergence via
    chunk replay.  On a multi-device ``runtime`` the ``[B, P, S]`` panels'
    site axis is sharded under shard_map with psum'd convergence partials
    (the same scheme as the LOO kernel, ``_sharded_loo_chunk_fn``); the
    per-shard site count must be tile-aligned (the z driver buckets
    ``s_pad`` to ``runtime.site_multiple()``).
    """
    _mosaic_warmup(interpret)
    fast_math = _resolve_fast_math(fast_math, runtime)
    b, p, s = np.shape(g0p)
    mask_h = np.asarray(member_mask, np.float32).reshape(b, 1, p)
    counts = mask_h.sum(axis=2).reshape(b)
    inv_h = (1.0 / np.maximum(counts, 1.0)).astype(np.float32).reshape(b, 1, 1)

    sharded = runtime is not None and runtime.n_devices > 1
    if sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wgsassign_tpu.parallel.mesh import SNP_AXIS

        if s % (runtime.n_devices) != 0:
            raise ValueError(
                f"fused sites-batch EM on a {runtime.n_devices}-device mesh "
                f"needs the site axis pre-padded (got s={s}); bucket to "
                "runtime.site_multiple()"
            )
        sharding3 = NamedSharding(runtime.mesh, P(None, None, SNP_AXIS))
        g0p = jax.device_put(g0p, sharding3)
        g1p = jax.device_put(g1p, sharding3)
        sw3 = jax.device_put(
            np.asarray(site_weight, np.float32).reshape(b, 1, s), sharding3
        )
        mask3 = runtime.replicate(mask_h)
        inv3 = runtime.replicate(inv_h)

        def put_ft(arr):
            return jax.device_put(np.ascontiguousarray(arr), sharding3)

        def run_chunk(ft_in, limits_arr, T):
            fn = _sharded_sites_chunk_fn(runtime.mesh, T, interpret,
                                         fast_math)
            return fn(
                g0p, g1p, ft_in, mask3, sw3,
                limits_arr.reshape(b, 1, 1), inv3,
            )

    else:
        g0p = jnp.asarray(g0p)
        g1p = jnp.asarray(g1p)
        mask3 = jnp.asarray(mask_h)
        sw3 = jnp.asarray(np.asarray(site_weight, np.float32).reshape(b, 1, s))
        inv3 = jnp.asarray(inv_h)

        def put_ft(arr):
            return jnp.asarray(np.ascontiguousarray(arr))

        def run_chunk(ft_in, limits_arr, T):
            return sites_chunk_pallas(
                g0p, g1p, ft_in, mask3, sw3, limits_arr.reshape(b, 1, 1),
                inv3, T, interpret=interpret, fast_math=fast_math,
            )

    ft0 = _device_init_ft((b, 1, s), sharding3 if sharded else None)
    ft, iters, active = _drive_chunks(
        run_chunk, put_ft, ft0, b, max_iter, tol, m_real, chunk,
        checkpoint,
    )
    # squeeze under jit: plain indexing on a multi-process global array
    # would require full addressability
    f = jax.jit(lambda x: x[:, 0, :])(ft)
    return f, jnp.asarray(iters), jnp.asarray(~active)
