"""Fused multi-iteration Pallas TPU kernel for the batched leave-one-out EM.

The LOO EM is the reference's headline workload (glassy.py:47-112; the
README's "~30 min for 5M sites x 180 individuals" claim is about this).
``ops/emmaf.py::em_maf_loo_group`` already batches one population's n_p
leave-one-out problems into a single ``[n_p, M]`` computation, but as an XLA
while-loop it re-reads the ``[n_p, M]`` GL member panels from HBM on every
EM iteration — the same bandwidth-bound pattern ``pallas_emmaf.py``
eliminates for the reference-AF EM.  This kernel loads each site tile of the
member panels once and runs a chunk of T iterations on it in VMEM.

Semantics match ``em_maf_loo_group`` op-for-op:

- update: ``w[i, j, s] = em_weights(g0p[i, s], g1p[i, s], f[j, s])``,
  ``f'[j, s] = (sum_i w[i, j, s] * mask[i, j]) / (n_p - 1)``, clipped to
  ``(_EM_EPS, 1 - _EM_EPS)`` — the ``[n_p, n_p, tile]`` weight tensor lives
  entirely in VMEM (this is what bounds the tile size; see ``_tile_loo``);
- convergence: per-problem squared-diff partials ``sq[T, n_p]`` accumulated
  across the tile grid; the host driver reconstructs the exact RMSE
  sequence and replays a chunk with exact per-problem iteration limits when
  a problem converges mid-chunk (at most one replay per chunk) — identical
  to the ``pallas_emmaf`` driver protocol.

Site weights come in two static flavors:

- ``weight_rows == 1``: one shared ``[1, M]`` weight row (plain LOO; padded
  sites additionally pin themselves to the EM fixed point because the pad GL
  pattern (1, 0) forces w = 0);
- ``weight_rows == n_p``: **per-problem** ``[n_p, M]`` weights with a
  per-problem ``m_real`` — this is what batches the reference-z-score mode's
  per-individual "LOO EM restricted to the individual's kept sites"
  (WGSassign.py:352-364): restricting sites never changes the per-site EM
  trajectory, only which sites the convergence RMSE sees.

Populations too large for the ``[n_p, n_p, tile]`` VMEM tensor
(n_p > ~90) automatically fall back to the XLA path in the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wgsassign_tpu.ops.emmaf import _EM_EPS

_F32 = jnp.float32

# VMEM working set per tile ~ (n_p^2 + ~4 n_p) * tile * 4 bytes; the 3-D
# weight tensor dominates.  Keep it comfortably inside the per-core VMEM.
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024

# Above this population size the [n_p, n_p, 128] tensor alone busts the
# budget even at the minimum tile — callers fall back to the XLA path.
MAX_FUSED_GROUP = int((_VMEM_BUDGET_BYTES / (4 * 128)) ** 0.5)


def _tile_loo(m: int, n_p: int) -> int:
    """Site-tile size: lane dimension, multiple of 128 (or the whole array
    as the small-problem fallback), sized so the [n_p, n_p, tile] weight
    tensor fits the VMEM budget."""
    tile = _VMEM_BUDGET_BYTES // (4 * max(n_p * n_p, 1))
    tile = 1 << (int(max(tile, 1)).bit_length() - 1)
    tile = max(128, min(tile, 2048))
    while m % tile != 0 and tile > 128:
        tile //= 2
    return tile if m % tile == 0 else m


def _loo_chunk_kernel(
    g0_ref, g1_ref, f_ref, mask_ref, w_ref, limits_ref, fout_ref, sq_ref,
    *, T: int, inv_count: float, weight_rows: int,
):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sq_ref[:] = jnp.zeros_like(sq_ref)

    g0 = g0_ref[:]          # [n_p, tm]
    g1 = g1_ref[:]
    g2 = 1.0 - g0 - g1      # iteration-invariant
    mask = mask_ref[:]      # [n_p, n_p]; mask[i, j] = 1 iff i participates in j
    weight = w_ref[:]       # [weight_rows, tm]
    limits = limits_ref[:]  # [1, n_p] float per-problem iteration limits
    limits_col = limits.T   # [n_p, 1]
    f = f_ref[:]            # [n_p, tm]

    acc_rows = []
    for t in range(T):
        # em_weights with g2 hoisted — same op order as the XLA path
        # (ops/emmaf.py::em_maf_loo_group), which the iteration-count
        # bit-match tests rely on
        f_b = f[None, :, :]                      # problems on axis 1
        omf = 1.0 - f_b
        p0 = g0[:, None, :] * omf * omf
        p1 = g1[:, None, :] * 2.0 * f_b * omf
        p2 = g2[:, None, :] * f_b * f_b
        w3 = (p1 + 2.0 * p2) / (2.0 * (p0 + p1 + p2))  # [n_p, n_p, tm]
        f_upd = jnp.sum(w3 * mask[:, :, None], axis=0) * inv_count
        f_upd = jnp.clip(f_upd, _EM_EPS, 1.0 - _EM_EPS)
        f_new = jnp.where(limits_col > float(t), f_upd, f)
        d = f_new - f
        acc_rows.append(jnp.sum(d * d * weight, axis=1, keepdims=True).T)  # [1, n_p]
        f = f_new

    fout_ref[:] = f
    sq_ref[:] += jnp.concatenate(acc_rows, axis=0)  # [T, n_p]


@functools.partial(
    jax.jit, static_argnames=("T", "inv_count", "weight_rows", "interpret")
)
def loo_chunk_pallas(g0p, g1p, f, mask, weight, limits, T: int,
                     inv_count: float, weight_rows: int,
                     interpret: bool = False):
    """One chunk of T fused LOO-EM iterations for one population group.

    Args:
      g0p, g1p: float32 ``[n_p, M]`` member GL panels (site-minor; padded
        site columns must hold the (1, 0) GL pattern).
      f: float32 ``[n_p, M]`` current per-problem AF (padded sites at
        ``_EM_EPS`` so their diffs vanish).
      mask: float32 ``[n_p, n_p]`` participation mask (1 - I for LOO).
      weight: float32 ``[weight_rows, M]`` site weights for the convergence
        partials (1 row shared, or n_p per-problem rows).
      limits: float32 ``[1, n_p]`` per-problem update limits (<= T).
      T, inv_count, weight_rows: static.

    Returns ``(f_new [n_p, M], sq [T, n_p])``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_p, m = g0p.shape
    tm = _tile_loo(m, n_p)
    grid = (m // tm,)
    kernel = functools.partial(
        _loo_chunk_kernel, T=T, inv_count=inv_count, weight_rows=weight_rows
    )
    f_new, sq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_p, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, n_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((weight_rows, tm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_p, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, m), _F32),
            jax.ShapeDtypeStruct((T, n_p), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(g0p, g1p, f, mask, weight, limits)
    return f_new, sq


# One traced program per (mesh, T, inv_count, weight_rows, interpret) — see
# pallas_emmaf._SHARDED_CHUNK_CACHE for why.
_SHARDED_LOO_CACHE = {}


def _sharded_loo_fn(mesh, T: int, inv_count: float, weight_rows: int,
                    interpret: bool):
    key = (mesh, T, inv_count, weight_rows, interpret)
    fn = _SHARDED_LOO_CACHE.get(key)
    if fn is not None:
        return fn
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from wgsassign_tpu.parallel.mesh import SNP_AXIS

    def body(g0s, g1s, fs, mask_s, w_s, limits_s):
        f_new, sq = loo_chunk_pallas(
            g0s, g1s, fs, mask_s, w_s, limits_s, T, inv_count, weight_rows,
            interpret=interpret,
        )
        return f_new, jax.lax.psum(sq, SNP_AXIS)

    fn = jax.jit(shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, SNP_AXIS), P(None, SNP_AXIS), P(None, SNP_AXIS),
            P(None, None), P(None, SNP_AXIS), P(None, None),
        ),
        out_specs=(P(None, SNP_AXIS), P(None, None)),
        check_vma=False,
    ))
    _SHARDED_LOO_CACHE[key] = fn
    return fn


def em_maf_loo_group_fused(
    g0p,
    g1p,
    site_weight,
    m_real,
    max_iter: int,
    tol: float,
    chunk: int = 16,
    interpret: bool = False,
    runtime=None,
    checkpoint=None,
):
    """Driver: chunked fused LOO EM with exact reference convergence
    semantics.  Same contract as
    :func:`wgsassign_tpu.ops.emmaf.em_maf_loo_group` — returns
    ``(f [n_p, M] device array, iters [n_p], converged [n_p])`` — plus the
    per-problem-weight generalization:

    - ``site_weight``: ``[M]`` shared or ``[n_p, M]`` per-problem;
    - ``m_real``: scalar or ``[n_p]`` per-problem RMSE denominators.

    ``checkpoint`` (an ``obs.checkpoint.EMCheckpoint``) enables chunk-level
    save/resume of this group's EM state.
    """
    n_p, m = g0p.shape
    inv_count = float(1.0 / (n_p - 1.0))
    sw_h = np.asarray(site_weight, np.float32)
    if sw_h.ndim == 1:
        weight_rows = 1
        sw_h = sw_h.reshape(1, m)
        # padded sites start at the EM fixed point of the pad GL pattern, so
        # they never touch the convergence partials even without a weight
        f_row = np.where(sw_h[0] > 0, np.float32(0.25), np.float32(_EM_EPS))
        f_h = np.broadcast_to(f_row, (n_p, m))
    else:
        weight_rows = n_p
        f_h = np.full((n_p, m), 0.25, dtype=np.float32)
    m_real_vec = np.broadcast_to(
        np.asarray(m_real, np.float32), (n_p,)
    ).astype(np.float32)
    mask_h = 1.0 - np.eye(n_p, dtype=np.float32)

    if runtime is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from wgsassign_tpu.parallel.mesh import SNP_AXIS

        mesh = runtime.mesh
        row_sh = NamedSharding(mesh, P(None, SNP_AXIS))
        rep_sh = NamedSharding(mesh, P())
        f = jax.device_put(np.ascontiguousarray(f_h), row_sh)
        mask = jax.device_put(mask_h, rep_sh)
        weight = jax.device_put(np.ascontiguousarray(sw_h), row_sh)

        def run_chunk(f_in, limits_arr, T):
            fn = _sharded_loo_fn(mesh, T, inv_count, weight_rows, interpret)
            return fn(g0p, g1p, f_in, mask, weight, limits_arr)

    else:
        f = jnp.asarray(np.ascontiguousarray(f_h))
        mask = jnp.asarray(mask_h)
        weight = jnp.asarray(np.ascontiguousarray(sw_h))

        def run_chunk(f_in, limits_arr, T):
            return loo_chunk_pallas(
                g0p, g1p, f_in, mask, weight, limits_arr, T, inv_count,
                weight_rows, interpret=interpret,
            )

    iters = np.full(n_p, max_iter, dtype=np.int32)
    active = np.ones(n_p, dtype=bool)
    it = 0
    if checkpoint is not None:
        state = checkpoint.load()
        if state is not None:
            f_h2, iters, active, it = state
            f = jax.device_put(np.asarray(f_h2, np.float32),
                               f.sharding if hasattr(f, "sharding") else None)
            iters = np.asarray(iters, np.int32)
            active = np.asarray(active, bool)
    while it < max_iter and active.any():
        T = min(chunk, max_iter - it)
        limits_vec = np.where(active, T, 0).astype(np.float32)
        f_snapshot = f
        f, sq = run_chunk(f, jnp.asarray(limits_vec.reshape(1, n_p)), T)
        rmse = np.sqrt(
            np.maximum(np.asarray(sq), 0.0) / m_real_vec[None, :]
        )  # [T, n_p]
        crossed = rmse < tol
        exact_limits = limits_vec.copy()
        replay = False
        for j in range(n_p):
            if not active[j]:
                continue
            hits = np.flatnonzero(crossed[:T, j])
            if hits.size:
                t_star = int(hits[0]) + 1
                iters[j] = it + t_star
                active[j] = False
                if t_star < T:
                    exact_limits[j] = t_star
                    replay = True
        if replay:
            f, _ = run_chunk(
                f_snapshot, jnp.asarray(exact_limits.reshape(1, n_p)), T
            )
        it += T
        if checkpoint is not None:
            checkpoint.maybe_save(f, iters, active, it)
    if checkpoint is not None:
        checkpoint.clear()
    return f, jnp.asarray(iters), jnp.asarray(~active)
