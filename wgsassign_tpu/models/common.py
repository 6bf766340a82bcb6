"""Shared device-side cohort container used by every analysis."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from wgsassign_tpu.io.beagle import BeagleData, BeagleShard
from wgsassign_tpu.parallel.mesh import (
    PAD_G0,
    PAD_G1,
    PAD_AF,
    Runtime,
    make_global_sites_array,
    make_runtime,
    pad_sites,
    site_weight_vector,
)


@dataclass
class DeviceCohort:
    """Genotype likelihood panels resident on device.

    ``g0``/``g1`` are float32 ``[M_pad, N]``, sharded over the SNP axis;
    ``site_weight`` is 1.0 on the first ``m_real`` rows, 0.0 on padding.
    """

    g0: jax.Array
    g1: jax.Array
    site_weight: jax.Array
    m_real: int
    runtime: Runtime

    @property
    def m_pad(self) -> int:
        return self.g0.shape[0]

    @property
    def n_inds(self) -> int:
        return self.g0.shape[1]


def to_device(
    beagle,
    runtime: Optional[Runtime] = None,
    site_multiple: int = 1,
) -> DeviceCohort:
    """Pad + shard a parsed Beagle matrix onto the mesh.

    ``site_multiple`` adds an extra divisibility requirement on the padded
    site count (e.g. the partition count for partitioned log-likelihoods).

    Accepts either a fully parsed :class:`BeagleData` or a per-process
    :class:`BeagleShard` (multi-host): shards are padded to the per-process
    block size and assembled into global SNP-sharded arrays without any
    host holding the full matrix.
    """
    if runtime is None:
        runtime = make_runtime()
    if isinstance(beagle, BeagleShard):
        return _shard_to_device(beagle, runtime, site_multiple)
    mult = runtime.site_multiple(site_multiple)
    g0_h = pad_sites(np.ascontiguousarray(beagle.gl[:, :, 0]), mult, PAD_G0)
    g1_h = pad_sites(np.ascontiguousarray(beagle.gl[:, :, 1]), mult, PAD_G1)
    m_real = beagle.n_sites
    w = site_weight_vector(m_real, g0_h.shape[0])
    return DeviceCohort(
        g0=runtime.shard_sites(g0_h),
        g1=runtime.shard_sites(g1_h),
        site_weight=runtime.shard_sites(w),
        m_real=m_real,
        runtime=runtime,
    )


def _shard_to_device(shard: BeagleShard, runtime: Runtime,
                     site_multiple: int) -> DeviceCohort:
    """Assemble a global SNP-sharded cohort from per-process row blocks."""
    import jax

    nproc = jax.process_count()
    per = shard.rows_per_process
    # window consistency: the shard must have been cut for this runtime's
    # padding requirements (same mesh, same pallas decision, same partition
    # count)
    mult_local = runtime.site_multiple(site_multiple) // max(nproc, 1)
    if per % max(mult_local, 1) != 0:
        raise ValueError(
            f"BeagleShard block size {per} incompatible with the runtime's "
            f"per-process site multiple {mult_local}; re-read with "
            "read_beagle_sharded(path, runtime, site_multiple)"
        )
    m_pad = per * nproc
    n_local = shard.hi - shard.lo

    def pad_block(a: np.ndarray, fill) -> np.ndarray:
        out = np.full((per,) + a.shape[1:], fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    g0_l = pad_block(np.ascontiguousarray(shard.local.gl[:, :, 0]), PAD_G0)
    g1_l = pad_block(np.ascontiguousarray(shard.local.gl[:, :, 1]), PAD_G1)
    w_l = pad_block(np.ones(n_local, dtype=np.float32), 0.0)
    return DeviceCohort(
        g0=make_global_sites_array(runtime, g0_l, m_pad),
        g1=make_global_sites_array(runtime, g1_l, m_pad),
        site_weight=make_global_sites_array(runtime, w_l, m_pad),
        m_real=shard.m_global,
        runtime=runtime,
    )


def stream_to_device(
    path: str,
    runtime: Optional[Runtime] = None,
    site_multiple: int = 1,
    block_rows: Optional[int] = None,
    use_native: bool = True,
    collect_site_names: bool = False,
    n_threads: Optional[int] = None,
    keep_mask: Optional[np.ndarray] = None,
):
    """Build a :class:`DeviceCohort` directly from a Beagle file in site
    blocks, without ever materializing the full ``[M, N, 2]`` matrix on the
    host (the reference holds all of M resident, reader_cy.pyx:71).

    Pipeline: a prefetch thread parses block i+1 while block i is placed
    into the SNP-sharded device arrays via a donated
    ``dynamic_update_slice`` (in-place on device).  Peak host memory is
    O(block); M is bounded by aggregate device HBM, not host RAM.

    ``keep_mask`` (bool ``[file_rows]``) drops masked data rows on the fly
    — the streamed form of the downsampled-LOO site intersection; the
    cohort then covers only the kept rows, in order.

    Returns ``(cohort, meta, site_names)`` where ``meta`` is a
    :class:`wgsassign_tpu.io.stream.BeagleStreamMeta` and ``site_names`` is
    None unless ``collect_site_names`` (which reintroduces an O(M) host
    cost and is meant for tests / small runs).
    """
    import math as _math

    import jax
    import jax.numpy as jnp

    from wgsassign_tpu.io.stream import open_block_iterator, prefetch

    if runtime is None:
        runtime = make_runtime()
    if jax.process_count() > 1:
        raise NotImplementedError(
            "streamed ingest is single-process; multi-host runs shard rows "
            "per process via read_beagle_sharded instead"
        )
    from wgsassign_tpu.io.beagle import beagle_dims

    mult = runtime.site_multiple(site_multiple)
    _m_scan, n_scan = beagle_dims(path, use_native=use_native)
    if block_rows is None:
        # ~256 MiB of parsed GL (2 float32s per site-individual) per block
        block_rows = max((256 << 20) // (8 * max(n_scan, 1)), 1)
    block_rows = max(_math.ceil(block_rows / mult) * mult, mult)
    meta, blocks = open_block_iterator(
        path, block_rows, use_native, n_threads=n_threads
    )
    if keep_mask is not None:
        keep_mask = np.asarray(keep_mask, dtype=bool)
        if keep_mask.shape[0] != meta.n_sites:
            raise ValueError(
                f"keep_mask covers {keep_mask.shape[0]} rows, Beagle file "
                f"{path} has {meta.n_sites}"
            )
        blocks = _rechunk_filtered(blocks, keep_mask, block_rows)
        m_real = int(keep_mask.sum())
    else:
        m_real = meta.n_sites
    n = meta.n_inds
    m_pad = _math.ceil(max(m_real, 1) / mult) * mult

    def alloc(fill):
        return jax.jit(
            lambda: jnp.full((m_pad, n), fill, jnp.float32),
            out_shardings=runtime.sites_sharding(2),
        )()

    g0 = alloc(PAD_G0)
    g1 = alloc(PAD_G1)
    w = jax.jit(
        lambda: (jnp.arange(m_pad) < m_real).astype(jnp.float32),
        out_shardings=runtime.sites_sharding(1),
    )()

    update = jax.jit(
        lambda dst, src, lo: jax.lax.dynamic_update_slice(dst, src, (lo, 0)),
        donate_argnums=(0,),
    )

    site_names = [] if collect_site_names else None
    lo = 0
    for gl_block, names in prefetch(blocks):
        b = gl_block.shape[0]
        if lo + b > m_real:
            raise ValueError(
                f"Beagle file {path} grew during streaming ingest "
                f"({lo + b} rows > dims scan {m_real})"
            )
        is_final = lo + b == m_real
        g0_src = np.ascontiguousarray(gl_block[:, :, 0])
        g1_src = np.ascontiguousarray(gl_block[:, :, 1])
        if is_final and m_pad - lo != b:
            # pad the tail block out to the device array's end
            tail = m_pad - lo

            def pad_tail(a, fill):
                out = np.full((tail, a.shape[1]), fill, dtype=a.dtype)
                out[: a.shape[0]] = a
                return out

            g0_src = pad_tail(g0_src, PAD_G0)
            g1_src = pad_tail(g1_src, PAD_G1)
        g0 = update(g0, g0_src, lo)
        g1 = update(g1, g1_src, lo)
        if site_names is not None:
            site_names.extend(names)
        lo += b
    if lo != m_real:
        raise ValueError(
            f"Beagle file {path} shrank during streaming ingest "
            f"({lo} rows < dims scan {m_real})"
        )
    cohort = DeviceCohort(
        g0=g0, g1=g1, site_weight=w, m_real=m_real, runtime=runtime
    )
    return cohort, meta, site_names


def _rechunk_filtered(blocks, keep_mask: np.ndarray, block_rows: int):
    """Apply a row keep-mask to a Beagle block stream and re-chunk the
    surviving rows into full ``block_rows`` blocks (+ one tail), so the
    device-placement loop keeps its two compiled update shapes."""
    buf_gl, buf_names, have, pos = [], [], 0, 0
    for gl_block, names in blocks:
        b = gl_block.shape[0]
        sel = keep_mask[pos : pos + b]
        pos += b
        if sel.any():
            buf_gl.append(gl_block[sel])
            buf_names.append([nm for nm, k in zip(names, sel) if k])
            have += int(sel.sum())
        while have >= block_rows:
            gl_cat = np.concatenate(buf_gl) if len(buf_gl) > 1 else buf_gl[0]
            names_cat = [nm for chunk in buf_names for nm in chunk]
            yield gl_cat[:block_rows], names_cat[:block_rows]
            rest = gl_cat[block_rows:]
            buf_gl = [rest] if rest.shape[0] else []
            buf_names = [names_cat[block_rows:]] if rest.shape[0] else []
            have -= block_rows
    if have:
        gl_cat = np.concatenate(buf_gl) if len(buf_gl) > 1 else buf_gl[0]
        yield gl_cat, [nm for chunk in buf_names for nm in chunk]


def pad_af_to(af: np.ndarray, m_pad: int) -> np.ndarray:
    """Pad an ``[M, K]`` AF panel's site axis up to ``m_pad`` with 0.5."""
    m = af.shape[0]
    if m == m_pad:
        return af
    return np.pad(af, [(0, m_pad - m), (0, 0)], constant_values=PAD_AF)
