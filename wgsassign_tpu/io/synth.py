"""Synthetic cohort generation at production scale.

Generates multi-million-SNP genotype-likelihood cohorts (BASELINE.json's
N-host benchmark configs) either as in-memory arrays or as a gzipped Beagle
file for end-to-end pipeline benchmarking.  The model matches the bundled
amre data's generative process: per (site, individual), true genotypes from
HWE at a per-population AF (populations get Balding-Nichols-style divergence
around an ancestral AF), reads at Poisson depth with error rate e, and GLs
proportional to the binomial read likelihoods.
"""

from __future__ import annotations

import gzip

import numpy as np


def synth_cohort(
    m_sites: int,
    n_inds: int,
    n_pops: int = 5,
    mean_depth: float = 2.0,
    error_rate: float = 0.01,
    fst: float = 0.05,
    seed: int = 0,
):
    """Returns ``(gl [M, N, 2] float32, pop_labels [N], ad [M, 2N] int32)``."""
    rng = np.random.default_rng(seed)
    anc = rng.uniform(0.05, 0.95, size=m_sites)
    a = anc * (1.0 - fst) / fst
    b = (1.0 - anc) * (1.0 - fst) / fst
    pop_af = rng.beta(a[:, None], b[:, None], size=(m_sites, n_pops))
    pop_of = np.arange(n_inds) % n_pops
    geno = rng.binomial(2, pop_af[:, pop_of])  # [M, N]
    depth = rng.poisson(mean_depth, size=geno.shape)
    p_minor = np.choose(geno, [error_rate, 0.5, 1.0 - error_rate])
    minor = rng.binomial(depth, p_minor)
    major = depth - minor
    e = error_rate
    # binomial read likelihoods per genotype (coefficient cancels on
    # normalization)
    l0 = (1 - e) ** major * e**minor
    l1 = 0.5 ** depth.astype(np.float64)
    l2 = e**major * (1 - e) ** minor
    tot = l0 + l1 + l2
    gl = np.empty((m_sites, n_inds, 2), dtype=np.float32)
    gl[:, :, 0] = l0 / tot
    gl[:, :, 1] = l1 / tot
    ad = np.empty((m_sites, 2 * n_inds), dtype=np.int32)
    ad[:, 0::2] = major
    ad[:, 1::2] = minor
    labels = np.array([f"pop{p}" for p in pop_of])
    return gl, labels, ad


def write_beagle(path: str, gl: np.ndarray, compresslevel: int = 1) -> str:
    """Write ``[M, N, 2]`` GLs as a gzipped Beagle file."""
    m, n, _ = gl.shape
    g2 = 1.0 - gl[:, :, 0] - gl[:, :, 1]
    with gzip.open(path, "wt", compresslevel=compresslevel) as f:
        f.write(
            "marker\tallele1\tallele2"
            + "".join(f"\tInd{i}\tInd{i}\tInd{i}" for i in range(n))
            + "\n"
        )
        for s in range(m):
            row = np.empty(3 * n, dtype=np.float32)
            row[0::3] = gl[s, :, 0]
            row[1::3] = gl[s, :, 1]
            row[2::3] = g2[s]
            f.write(
                f"scaffold{s % 1000}_{s}\t1\t2\t"
                + "\t".join(f"{v:.6f}" for v in row)
                + "\n"
            )
    return path
