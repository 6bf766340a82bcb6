"""Reference-population allele-frequency estimation (``--get_reference_af``).

Reproduces the reference driver block WGSassign.py:205-249: per-population
MAF EM (emMAF.py:15-27) followed by clamping to ``[1/(2(n+1)), 1-1/(2(n+1))]``
(WGSassign.py:236-240).  Unlike the reference's serial per-pop loop, all K
populations run as one batched device computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from wgsassign_tpu.io.beagle import BeagleData
from wgsassign_tpu.io.ids import PopulationMap
from wgsassign_tpu.models.common import DeviceCohort, to_device
from wgsassign_tpu.ops.emmaf import clamp_af, em_maf_pops
from wgsassign_tpu.parallel.mesh import Runtime


def _clamp_rows(ft, min_val):
    """Per-row clamp of a site-minor ``[K, M]`` panel on device."""
    import jax
    import jax.numpy as jnp

    if not hasattr(_clamp_rows, "_fn"):
        _clamp_rows._fn = jax.jit(
            lambda x, mv: jnp.clip(x, mv[:, None], 1.0 - mv[:, None])
        )
    return _clamp_rows._fn(ft, np.asarray(min_val, np.float32))


@dataclass
class ReferenceAFResult:
    af: np.ndarray          # float32 [M, K], clamped
    pops: np.ndarray        # [K] population names (sorted unique order)
    iters: np.ndarray       # int32 [K] 1-based EM convergence iteration
    converged: np.ndarray   # bool [K]
    # clamped [K, m_pad] site-minor DEVICE panel (fused path only): lets
    # the LOO pipeline build its mini-banks without a ~100 MB D2H+H2D AF
    # round trip at production scale
    af_t_dev: Optional[object] = None


def estimate_reference_af(
    beagle: BeagleData,
    popmap: PopulationMap,
    max_iter: int = 200,
    tol: float = 1e-4,
    runtime: Optional[Runtime] = None,
    cohort: Optional[DeviceCohort] = None,
    checkpoint_path: Optional[str] = None,
) -> ReferenceAFResult:
    if beagle.n_inds != popmap.n_inds:
        raise ValueError(
            "Number of individuals in beagle and reference ID file do not match!"
        )
    if cohort is None:
        cohort = to_device(beagle, runtime)
    rt = cohort.runtime
    from wgsassign_tpu.ops.pallas_emmaf import MAX_FUSED_EM_INDIVIDUALS

    use_fused = rt.pallas_enabled()
    # the cohort's individual count is authoritative for the VMEM decision
    # (a prebuilt cohort may differ from the BeagleData it was derived from)
    if use_fused and cohort.n_inds > MAX_FUSED_EM_INDIVIDUALS:
        from wgsassign_tpu.obs.log import logger

        logger.warning(
            "reference-AF EM: %d individuals exceeds the fused kernel's "
            "VMEM bound (%d); auto-falling back to the XLA path",
            cohort.n_inds, MAX_FUSED_EM_INDIVIDUALS,
        )
        use_fused = False
    if use_fused:
        # fused multi-iteration Pallas kernel: one HBM read of the GL
        # panels per chunk instead of per iteration; on a multi-device mesh
        # the chunk runs per shard under shard_map with psum'd convergence
        # partials
        from wgsassign_tpu.obs.checkpoint import EMCheckpoint
        from wgsassign_tpu.ops.pallas_emmaf import em_maf_pops_fused

        ckpt = EMCheckpoint(checkpoint_path) if checkpoint_path else None
        ft, iters, converged = em_maf_pops_fused(
            cohort.g0,
            cohort.g1,
            popmap.membership,
            cohort.site_weight,
            cohort.m_real,
            max_iter,
            tol,
            interpret=rt.pallas_interpret(),
            checkpoint=ckpt,
            runtime=rt,
            return_device_panel=True,
        )
        # clamp on device in the site-minor layout (padded sites clamp to
        # min_val — harmless: everything downstream weights them to zero),
        # keep the panel for the LOO mini-banks, fetch one host copy for
        # the .pop_af.npy output
        min_val = (
            1.0 / (2.0 * (popmap.pop_sizes.astype(np.float32) + 1.0))
        )
        f = _clamp_rows(ft, min_val)
    else:
        membership = rt.replicate(popmap.membership)
        pop_index = rt.replicate(popmap.pop_index)
        f, iters, converged = em_maf_pops(
            cohort.g0,
            cohort.g1,
            membership,
            pop_index,
            cohort.site_weight,
            cohort.m_real,
            max_iter,
            tol,
        )
    from wgsassign_tpu.parallel.mesh import fetch_to_host

    af_t_dev = None
    if use_fused:
        # f is the clamped [K, m_pad] site-minor device panel
        af_t_dev = f
        af = np.ascontiguousarray(
            fetch_to_host(f)[:, : cohort.m_real].T
        ).astype(np.float32)
    else:
        f = clamp_af(f, popmap.pop_sizes)
        af = fetch_to_host(f)[: cohort.m_real].astype(np.float32)
    return ReferenceAFResult(
        af=af,
        pops=popmap.pops,
        iters=np.asarray(iters),
        converged=np.asarray(converged),
        af_t_dev=af_t_dev,
    )
