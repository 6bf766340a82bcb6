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


def _gl_table(max_depth: int, e: float) -> np.ndarray:
    """Normalized (GL0, GL1) for every (major, minor) read-count pair —
    the likelihood depends only on the counts, so per-element transcendental
    ops become one table gather."""
    maj, mino = np.meshgrid(
        np.arange(max_depth + 1), np.arange(max_depth + 1), indexing="ij"
    )
    l0 = (1 - e) ** maj * e**mino
    l1 = 0.5 ** (maj + mino).astype(np.float64)
    l2 = e**maj * (1 - e) ** mino
    tot = l0 + l1 + l2
    table = np.empty((max_depth + 1, max_depth + 1, 2), dtype=np.float32)
    table[:, :, 0] = l0 / tot
    table[:, :, 1] = l1 / tot
    return table


def synth_cohort(
    m_sites: int,
    n_inds: int,
    n_pops: int = 5,
    mean_depth: float = 2.0,
    error_rate: float = 0.01,
    fst: float = 0.05,
    seed: int = 0,
):
    """Returns ``(gl [M, N, 2] float32, pop_labels [N], ad [M, 2N] int32)``.

    Chunked over sites (bounds peak host memory to ~chunk*N temporaries) with
    table-lookup likelihoods — multi-million-SNP cohorts generate in seconds
    per million sites instead of minutes.
    """
    rng = np.random.default_rng(seed)
    pop_of = np.arange(n_inds) % n_pops
    gl = np.empty((m_sites, n_inds, 2), dtype=np.float32)
    ad = np.empty((m_sites, 2 * n_inds), dtype=np.int32)
    p_minor_of_geno = np.array(
        [error_rate, 0.5, 1.0 - error_rate], dtype=np.float64
    )
    table = None
    chunk = max(1, min(m_sites, (1 << 26) // max(n_inds, 1)))
    for lo in range(0, m_sites, chunk):
        hi = min(lo + chunk, m_sites)
        anc = rng.uniform(0.05, 0.95, size=hi - lo)
        a = anc * (1.0 - fst) / fst
        b = (1.0 - anc) * (1.0 - fst) / fst
        pop_af = rng.beta(a[:, None], b[:, None], size=(hi - lo, n_pops))
        geno = rng.binomial(2, pop_af[:, pop_of])  # [chunk, N]
        depth = rng.poisson(mean_depth, size=geno.shape)
        minor = rng.binomial(depth, p_minor_of_geno[geno])
        major = depth - minor
        dmax = int(depth.max()) if depth.size else 0
        if table is None or table.shape[0] <= dmax:
            table = _gl_table(max(dmax, 1), error_rate)
        gl[lo:hi] = table[major, minor]
        ad[lo:hi, 0::2] = major
        ad[lo:hi, 1::2] = minor
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
