"""Generate golden fixtures for the amre workflows from the oracle.

Run from the repo root:  python tests/generate_goldens.py

Writes tests/golden/*.npz plus synthetic allele-depth fixtures (the bundled
data has no AD files; these are generated deterministically, correlated with
the GLs so the z-score combo filters keep a realistic site fraction).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import oracle
from wgsassign_tpu.io.beagle import filter_sites_to_common, read_beagle, to_legacy_matrix

DATA = pathlib.Path("/root/reference/data")
OUT = pathlib.Path(__file__).parent / "golden"
OUT.mkdir(exist_ok=True)

BREEDING = DATA / "amre.breeding.ind85.ds_2x.sites-filter.top_50_each.beagle.gz"
BREEDING_SUBSET = (
    DATA / "amre.breeding.ind85.ds_2x.sites-filter.top_50_each_subset_80percent_sites.beagle.gz"
)
BREEDING_IDS = DATA / "amre.breeding.ind85.reference_k5.IDs.txt"
NONBREEDING = DATA / "amre.nonbreeding.ind34.ds_2x.sites-filter.top_50_each.beagle.gz"
NONBREEDING_IDS = DATA / "amre.nonbreeding.ind34.site.IDs.txt"

NUM_PARTITIONS = 4
AD_SEED = 20260817
Z_THRESHOLD = 5


def synth_allele_depths(L, seed, e=0.01, max_depth=12):
    """Deterministic AD matrix [M, 2N] int32 consistent with the GLs.

    The bundled beagle GLs are normalized read likelihoods
    ``P(R|g) ∝ (1-e)^Ar e^Aa, 0.5^D, e^Ar (1-e)^Aa`` with e≈0.01, so we
    recover (Ar, Aa) per (site, individual) by nearest-triple inversion over
    a depth grid.  This keeps combo-mean GLs within the reference z-score
    pipeline's 0.01 tolerance, as for real ANGSD data.  ``seed`` unused
    (kept for fixture provenance).
    """
    m, n2 = L.shape
    n = n2 // 2
    g0 = L[:, 0::2].astype(np.float64)
    g1 = L[:, 1::2].astype(np.float64)
    g2 = 1.0 - g0 - g1
    combos = [(ar, aa) for d in range(max_depth + 1) for aa in range(d + 1) for ar in [d - aa]]
    cand = np.empty((len(combos), 3))
    for c, (ar, aa) in enumerate(combos):
        t = np.array(
            [(1 - e) ** ar * e**aa, 0.5 ** (ar + aa), e**ar * (1 - e) ** aa]
        )
        cand[c] = t / t.sum()
    gl3 = np.stack([g0, g1, g2], axis=-1)  # [M, N, 3]
    dist = np.abs(gl3[:, :, None, :] - cand[None, None, :, :]).sum(-1)  # [M,N,C]
    best = dist.argmin(axis=-1)
    combos = np.asarray(combos)
    ar = combos[best][:, :, 0]
    aa = combos[best][:, :, 1]
    ad = np.empty((m, 2 * n), dtype=np.int32)
    ad[:, 0::2] = ar
    ad[:, 1::2] = aa
    return ad


def main():
    breeding = read_beagle(str(BREEDING))
    L = to_legacy_matrix(breeding)
    ids = np.loadtxt(BREEDING_IDS, delimiter="\t", dtype=str)
    labels = ids[:, 1]

    print("[1/7] reference AF ...")
    af, pops = oracle.reference_af(L, labels)
    np.savez(OUT / "ref_af.npz", af=af, pops=pops)

    print("[2/7] assignment log-likelihoods (nonbreeding) ...")
    nonbreeding = read_beagle(str(NONBREEDING))
    L_nb = to_legacy_matrix(nonbreeding)
    ll_nb = oracle.assign_ll(L_nb, af)
    np.savez(OUT / "pop_like.npz", ll=ll_nb, pops=pops)

    print("[3/7] LOO (+partitions) ...")
    ll_loo, parts_loo = oracle.loo(
        L, af, labels, num_partitions=NUM_PARTITIONS
    )
    np.savez(
        OUT / "loo.npz", ll=ll_loo, parts=parts_loo, num_partitions=NUM_PARTITIONS
    )

    print("[4/7] LOO with downsampled beagle ...")
    subset = read_beagle(str(BREEDING_SUBSET))
    b_f = filter_sites_to_common(breeding, subset.site_names)
    s_f = filter_sites_to_common(subset, b_f.site_names)
    assert b_f.site_names == s_f.site_names
    L_f = to_legacy_matrix(b_f)
    L_ds = to_legacy_matrix(s_f)
    af_ds, _ = oracle.reference_af(L_f, labels)
    ll_ds, parts_ds = oracle.loo(
        L_f, af_ds, labels, L_ds=L_ds, num_partitions=NUM_PARTITIONS
    )
    np.savez(
        OUT / "loo_downsampled.npz",
        af=af_ds,
        ll=ll_ds,
        parts=parts_ds,
        num_partitions=NUM_PARTITIONS,
        m_common=L_f.shape[0],
    )

    print("[5/7] Fisher / Ne ...")
    f_obs, ne_obs, ne_ind = oracle.fisher_ne(L, af, labels)
    np.savez(OUT / "ne.npz", f_obs=f_obs, ne_obs=ne_obs, ne_ind=ne_ind)

    print("[6/7] z-scores ...")
    ad_b = synth_allele_depths(L, AD_SEED)
    np.savetxt(OUT / "breeding_ad.txt.gz", ad_b, fmt="%d")
    z_ref = np.empty(L.shape[1] // 2, dtype=np.float32)
    loci_ref = np.empty(L.shape[1] // 2, dtype=np.int32)
    for i in range(L.shape[1] // 2):
        z_ref[i], loci_ref[i] = oracle.zscore_individual(
            L, ad_b, labels, i, n_threshold=Z_THRESHOLD
        )
    np.savez(
        OUT / "zscore_reference.npz", z=z_ref, loci=loci_ref, threshold=Z_THRESHOLD
    )

    ad_nb = synth_allele_depths(L_nb, AD_SEED + 1)
    np.savetxt(OUT / "nonbreeding_ad.txt.gz", ad_nb, fmt="%d")
    assigned = pops[np.argmax(ll_nb, axis=1)]
    np.savetxt(
        OUT / "nonbreeding_assigned_ids.txt",
        np.stack([np.array(nonbreeding.sample_names), assigned], axis=1),
        fmt="%s",
        delimiter="\t",
    )
    z_as = np.empty(L_nb.shape[1] // 2, dtype=np.float32)
    loci_as = np.empty(L_nb.shape[1] // 2, dtype=np.int32)
    for i in range(L_nb.shape[1] // 2):
        z_as[i], loci_as[i] = oracle.zscore_individual(
            L_nb, ad_nb, assigned, i, af=af, pops=pops, n_threshold=Z_THRESHOLD
        )
    np.savez(
        OUT / "zscore_assignment.npz", z=z_as, loci=loci_as, threshold=Z_THRESHOLD
    )

    print("[7/7] mixture EM ...")
    nb_ids = np.loadtxt(NONBREEDING_IDS, delimiter="\t", dtype=str)
    harvest, pi = oracle.em_mix(ll_nb.astype(np.float64), nb_ids[:, 1])
    np.savez(OUT / "em_mix.npz", harvest=harvest, pi=pi)
    print("mixture pi:\n", pi)
    print("done; fixtures in", OUT)


if __name__ == "__main__":
    main()
