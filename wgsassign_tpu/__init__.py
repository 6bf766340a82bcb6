"""wgsassign_tpu: a TPU-native population-assignment engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
WGSassign reference (population assignment from genotype likelihoods):

- per-population allele-frequency estimation by EM  (``models.reference_af``)
- assignment log-likelihoods                         (``models.assign``)
- leave-one-out cross-validation                     (``models.loo``)
- Fisher-information effective sample sizes          (``models.ne``)
- assignment z-scores from allele depths             (``models.zscore``)
- mixture-proportion estimation (EM / MCMC)          (``models.mixture``)

Design: the genotype-likelihood tensor lives on device as ``[M_sites, N_inds, 2]``
float32 (GL of genotype 2 is reconstructed in-register as ``1 - g0 - g1``),
sharded over the SNP axis across a 1-D device mesh.  Per-population loops in
the reference become batched matmuls against a one-hot membership matrix, so
the EM update and all reductions run on the MXU/VPU; cross-device merges are
tiny ``psum`` collectives.
"""

from wgsassign_tpu.version import __version__

__all__ = ["__version__"]
