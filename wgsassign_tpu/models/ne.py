"""Fisher-information effective sample sizes (``--ne_obs``).

Reproduces reference fisher.fisher_obs / fisher_obs_ind (fisher.py:11-59)
as one batched device computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from wgsassign_tpu.io.beagle import BeagleData
from wgsassign_tpu.io.ids import PopulationMap
from wgsassign_tpu.models.common import DeviceCohort, pad_af_to, to_device
from wgsassign_tpu.ops.fisher import fisher_obs_pops
from wgsassign_tpu.parallel.mesh import Runtime


@dataclass
class NeResult:
    f_obs: np.ndarray   # float32 [M, K] observed Fisher information
    ne_obs: np.ndarray  # float32 [M, K] per-site effective sample size
    ne_ind: np.ndarray  # float32 [N] per-individual Ne (mean over sites)


def effective_sample_sizes(
    beagle: BeagleData,
    af: np.ndarray,
    popmap: PopulationMap,
    runtime: Optional[Runtime] = None,
    cohort: Optional[DeviceCohort] = None,
) -> NeResult:
    if cohort is None:
        cohort = to_device(beagle, runtime)
    rt = cohort.runtime
    af_dev = rt.shard_sites(pad_af_to(np.asarray(af, np.float32), cohort.m_pad))
    membership = rt.replicate(popmap.membership)
    pop_index = rt.replicate(popmap.pop_index)
    f_obs, ne_obs, ne_ind = fisher_obs_pops(
        cohort.g0,
        cohort.g1,
        af_dev,
        membership,
        pop_index,
        cohort.site_weight,
        cohort.m_real,
    )
    m = cohort.m_real
    return NeResult(
        f_obs=np.asarray(f_obs)[:m].astype(np.float32),
        ne_obs=np.asarray(ne_obs)[:m].astype(np.float32),
        ne_ind=np.asarray(ne_ind).astype(np.float32),
    )
