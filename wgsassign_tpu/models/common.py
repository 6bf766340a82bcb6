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


def pad_af_to(af: np.ndarray, m_pad: int) -> np.ndarray:
    """Pad an ``[M, K]`` AF panel's site axis up to ``m_pad`` with 0.5."""
    m = af.shape[0]
    if m == m_pad:
        return af
    return np.pad(af, [(0, m_pad - m), (0, 0)], constant_values=PAD_AF)
