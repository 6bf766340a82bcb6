"""Shared device-side cohort container used by every analysis."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from wgsassign_tpu.io.beagle import BeagleData
from wgsassign_tpu.parallel.mesh import (
    PAD_G0,
    PAD_G1,
    PAD_AF,
    Runtime,
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
    beagle: BeagleData,
    runtime: Optional[Runtime] = None,
    site_multiple: int = 1,
) -> DeviceCohort:
    """Pad + shard a parsed Beagle matrix onto the mesh.

    ``site_multiple`` adds an extra divisibility requirement on the padded
    site count (e.g. the partition count for partitioned log-likelihoods).
    """
    if runtime is None:
        runtime = make_runtime()
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


def pad_af_to(af: np.ndarray, m_pad: int) -> np.ndarray:
    """Pad an ``[M, K]`` AF panel's site axis up to ``m_pad`` with 0.5."""
    m = af.shape[0]
    if m == m_pad:
        return af
    return np.pad(af, [(0, m_pad - m), (0, 0)], constant_values=PAD_AF)
