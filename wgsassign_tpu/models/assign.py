"""Assignment log-likelihoods (``--get_pop_like``).

Reproduces reference glassy.assignLL (glassy.py:18-44) — the full ``[N, K]``
matrix in one fused device pass instead of N*K kernel launches.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from wgsassign_tpu.io.beagle import BeagleData
from wgsassign_tpu.models.common import DeviceCohort, pad_af_to, to_device
from wgsassign_tpu.ops.loglik import assign_loglik, assign_loglik_partitioned
from wgsassign_tpu.parallel.mesh import Runtime


def assignment_loglikelihoods(
    beagle: BeagleData,
    af: np.ndarray,
    runtime: Optional[Runtime] = None,
    cohort: Optional[DeviceCohort] = None,
    num_partitions: int = 1,
):
    """Log-likelihood of assigning each individual to each population.

    Returns ``ll [N, K] float32``; with ``num_partitions > 1`` returns
    ``(ll, parts [N*num_partitions, K])`` where partition p sums sites with
    ``site_index % P == p`` (reference utils.partition_loglikes).
    """
    if cohort is None:
        cohort = to_device(beagle, runtime, site_multiple=num_partitions)
    rt = cohort.runtime
    af_dev = rt.shard_sites(pad_af_to(np.asarray(af, np.float32), cohort.m_pad))
    if num_partitions <= 1:
        ll = assign_loglik(cohort.g0, cohort.g1, af_dev, cohort.site_weight)
        return np.asarray(ll, dtype=np.float32)
    parts = assign_loglik_partitioned(
        cohort.g0, cohort.g1, af_dev, cohort.site_weight, num_partitions
    )  # [P, N, K]
    parts = np.asarray(parts, dtype=np.float32)
    ll = parts.sum(axis=0).astype(np.float32)  # [N, K]
    n, k = ll.shape
    parts_nk = np.transpose(parts, (1, 0, 2)).reshape(n * num_partitions, k)
    return ll, parts_nk
