"""Assignment z-scores (``--get_reference_z_score`` / ``--get_assignment_z_score``).

Pipeline per individual i (reference WGSassign.py:346-384, 425-446 and
zscore.py — see SURVEY §2.8 for the full semantics):

1. Group sites by the individual's allele-depth combo (Ar, Aa); per combo
   record the count and mean GL triple.                 [host, vectorized]
2. Filter combos: ``single_read`` keeps total-depth-1 combos; otherwise
   count > threshold and depth != 0; then keep only depths D whose combo
   count exceeds D (all D+1 splits observed).           [host]
3. Keep sites whose combo survived and whose GL at the combo-mean's argmax
   entry is within 0.01 of that mean.                   [host, vectorized]
4. AF at kept sites: reference mode re-runs the LOO EM for i's population
   restricted to kept sites; assignment mode slices the saved AF panel at
   the individual's *assigned* population.              [device]
5. Binomial read-probability tables with error rate e=0.01; expected /
   variance W sums; Z = (W_obs - mu) / sqrt(var).       [device kernel]

The reference's per-site Python dict loops (zscore.py:11-61 — its admitted
bottleneck) become np.unique/bincount passes; the per-site split loops
become the ``zscore_sums`` gather kernel.  Shapes are bucketed so the number
of distinct compilations stays small across individuals.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from wgsassign_tpu.io.beagle import BeagleData
from wgsassign_tpu.io.ids import PopulationMap
from wgsassign_tpu.models.common import DeviceCohort, to_device
from wgsassign_tpu.ops.emmaf import clamp_af, em_maf_pops
from wgsassign_tpu.ops.zscore_ops import zscore_sums
from wgsassign_tpu.parallel.mesh import PAD_AF, PAD_G0, PAD_G1, Runtime

F32 = np.float32

SEQ_ERROR_RATE = 0.01       # hard-coded in the reference (WGSassign.py:350,430)
GL_MEAN_TOLERANCE = 0.01    # hard-coded in the reference (zscore.py:55)


@dataclass
class ComboTables:
    """Per-individual combo grouping + site filter result."""

    combos: np.ndarray      # int64 [R, 2] kept (Ar, Aa) combos
    mean_gl: np.ndarray     # float32 [R, 3] mean GL triple per combo
    read_probs: np.ndarray  # float32 [R, 3] P(reads | genotype)
    keep_sites: np.ndarray  # int64 [S] kept site indices (ascending)
    site_row: np.ndarray    # int32 [S] combo row per kept site
    site_depth: np.ndarray  # int64 [S] total depth per kept site


class FilteringError(ValueError):
    pass


def build_combo_tables(
    gl_i: np.ndarray,
    ad_i: np.ndarray,
    n_threshold: int,
    single_read_threshold: bool,
    e: float = SEQ_ERROR_RATE,
) -> ComboTables:
    """Steps 1-3 + the read-probability table, vectorized on host.

    Args:
      gl_i: float32 ``[M, 2]`` — (g0, g1) of the individual.
      ad_i: int ``[M, 2]`` — (major, minor) read counts of the individual.
    """
    g0 = gl_i[:, 0].astype(F32)
    g1 = gl_i[:, 1].astype(F32)
    g2 = (1.0 - g0 - g1).astype(F32)
    ar = ad_i[:, 0].astype(np.int64)
    aa = ad_i[:, 1].astype(np.int64)
    width = int(aa.max()) + 1 if aa.size else 1
    code = ar * width + aa
    uniq, inv, counts = np.unique(code, return_inverse=True, return_counts=True)
    r_all = len(uniq)
    mean_gl = np.zeros((r_all, 3), dtype=np.float64)
    for gi, g in enumerate((g0, g1, g2)):
        mean_gl[:, gi] = np.bincount(inv, weights=g.astype(np.float64), minlength=r_all)
    mean_gl /= counts[:, None]
    combos = np.stack([uniq // width, uniq % width], axis=1)
    totals = combos.sum(axis=1)

    if single_read_threshold:
        keep = totals == 1
    else:
        keep = (counts > n_threshold) & (totals != 0)
    if keep.sum() < 2:
        raise FilteringError(
            "Not enough allele-count combinations were kept! Too stringent filtering?"
        )
    # keep only depths where all D+1 splits were observed among kept combos
    kept_tot = totals[keep]
    dl, dl_counts = np.unique(kept_tot, return_counts=True)
    dl_keep = dl[dl < dl_counts]
    keep &= np.isin(totals, dl_keep)
    if keep.sum() == 0:
        raise FilteringError(
            "No complete depth classes survived filtering (no depth has all "
            "of its allele-count splits observed)"
        )

    # site filter: combo kept AND |GL - comboMean| <= tol at the mean's argmax
    site_combo_kept = keep[inv]
    max_id = mean_gl.argmax(axis=1)
    gl3 = np.stack([g0, g1, g2], axis=1).astype(np.float64)
    site_val = gl3[np.arange(len(inv)), max_id[inv]]
    mean_val = mean_gl[inv, max_id[inv]]
    site_ok = np.abs(mean_val - site_val) <= GL_MEAN_TOLERANCE
    keep_sites = np.flatnonzero(site_combo_kept & site_ok)
    if keep_sites.size == 0:
        raise FilteringError("No loci were kept! Too stringent filtering?")

    # compact row numbering over kept combos only
    old_rows = np.flatnonzero(keep)
    new_row_of = -np.ones(r_all, dtype=np.int32)
    new_row_of[old_rows] = np.arange(len(old_rows), dtype=np.int32)
    site_row = new_row_of[inv[keep_sites]]

    kept_combos = combos[old_rows]
    read_probs = np.zeros((len(old_rows), 3), dtype=F32)
    for r, (car, caa) in enumerate(kept_combos):
        d = int(car + caa)
        c = math.factorial(d) / (math.factorial(int(caa)) * math.factorial(int(car)))
        read_probs[r, 0] = c * ((1.0 - e) ** car) * (e**caa)
        read_probs[r, 1] = c * (0.5**d)
        read_probs[r, 2] = c * ((1.0 - e) ** caa) * (e**car)

    return ComboTables(
        combos=kept_combos,
        mean_gl=mean_gl[old_rows].astype(F32),
        read_probs=read_probs,
        keep_sites=keep_sites,
        site_row=site_row,
        site_depth=totals[inv[keep_sites]],
    )


def _bucket(n: int, mult: int) -> int:
    """Round up to a multiple of ``mult``, then to 'few distinct sizes'
    granularity (next power-of-two-ish) to bound recompilation."""
    n = max(n, 1)
    size = 1 << (n - 1).bit_length()
    return -(-max(size, mult) // mult) * mult


def _split_tables(tables: ComboTables) -> Tuple[np.ndarray, np.ndarray]:
    """Per-site split enumeration: rows+mask ``[S, C]`` over splits of the
    site's depth.  All splits exist by the depth-class filter."""
    row_of = {
        (int(a), int(b)): r for r, (a, b) in enumerate(tables.combos)
    }
    depths = np.unique(tables.site_depth)
    c_max = int(depths.max()) + 1
    rows_by_depth = np.zeros((int(depths.max()) + 1, c_max), dtype=np.int32)
    mask_by_depth = np.zeros((int(depths.max()) + 1, c_max), dtype=F32)
    for d in depths:
        for x in range(int(d) + 1):
            rows_by_depth[d, x] = row_of[(int(d - x), int(x))]
            mask_by_depth[d, x] = 1.0
    return rows_by_depth[tables.site_depth], mask_by_depth[tables.site_depth]


@dataclass
class ZScoreResult:
    z: np.ndarray           # float32 [n_sub]
    loci: np.ndarray        # int32 [n_sub] kept-site counts
    w_obs: np.ndarray       # float32 [n_sub]
    w_mu: np.ndarray        # float32 [n_sub]
    w_var: np.ndarray       # float32 [n_sub]


def _individual_z(
    cohort: DeviceCohort,
    beagle: BeagleData,
    ad: np.ndarray,
    i: int,
    af_kept_fn,
    n_threshold: int,
    single_read_threshold: bool,
):
    """Shared per-individual driver.  ``af_kept_fn(tables, s_pad)`` returns a
    device ``[S_pad]`` AF vector for the kept sites."""
    rt = cohort.runtime
    gl_i = beagle.gl[:, i, :]
    ad_i = ad[:, 2 * i : 2 * i + 2]
    tables = build_combo_tables(gl_i, ad_i, n_threshold, single_read_threshold)

    s = tables.keep_sites.size
    s_pad = _bucket(s, rt.site_multiple())
    rows, mask = _split_tables(tables)
    c = rows.shape[1]
    c_pad = _bucket(c, 4)

    def pad(a, value, shape):
        out = np.full(shape, value, dtype=a.dtype)
        out[tuple(slice(0, d) for d in a.shape)] = a
        return out

    g0k = pad(gl_i[tables.keep_sites, 0].astype(F32), PAD_G0, (s_pad,))
    g1k = pad(gl_i[tables.keep_sites, 1].astype(F32), PAD_G1, (s_pad,))
    weight = pad(np.ones(s, dtype=F32), 0.0, (s_pad,))
    rows_p = pad(rows.astype(np.int32), 0, (s_pad, c_pad))
    mask_p = pad(mask, 0.0, (s_pad, c_pad))

    a_dev = af_kept_fn(tables, s_pad)
    w_obs, w_mu, w_var = zscore_sums(
        rt.shard_sites(g0k),
        rt.shard_sites(g1k),
        a_dev,
        rt.shard_sites(weight),
        rt.shard_sites(rows_p),
        rt.shard_sites(mask_p),
        rt.replicate(tables.mean_gl),
        rt.replicate(tables.read_probs),
    )
    w_obs, w_mu, w_var = float(w_obs), float(w_mu), float(w_var)
    z = (w_obs - w_mu) / math.sqrt(w_var)
    return z, s, w_obs, w_mu, w_var


def reference_z_scores(
    beagle: BeagleData,
    ad: np.ndarray,
    popmap: PopulationMap,
    ind_start: int = 0,
    ind_end: Optional[int] = None,
    n_threshold: int = 0,
    single_read_threshold: bool = False,
    max_iter: int = 200,
    tol: float = 1e-4,
    runtime: Optional[Runtime] = None,
    cohort: Optional[DeviceCohort] = None,
    verbose: bool = False,
) -> ZScoreResult:
    """Reference mode: AF from a leave-one-out EM re-run of the individual's
    own population restricted to its kept sites (WGSassign.py:352-364)."""
    if cohort is None:
        cohort = to_device(beagle, runtime)
    rt = cohort.runtime
    n = cohort.n_inds
    ind_end = n if ind_end is None else ind_end
    out = _empty_result(ind_end - ind_start)

    for pos, i in enumerate(range(ind_start, ind_end)):
        members = popmap.members_of(popmap.pop_labels[i])
        members = members[members != i]
        if members.size == 0:
            raise ValueError(
                f"Individual {i} is the only member of its population; "
                "reference z-score needs a leave-one-out AF"
            )
        members_dev = rt.replicate(members.astype(np.int32))

        def af_kept(tables, s_pad, members_dev=members_dev, n_pop=members.size):
            keep = np.full(s_pad, 0, dtype=np.int64)
            keep[: tables.keep_sites.size] = tables.keep_sites
            keep_dev = rt.shard_sites(keep)
            g0s = jnp.take(
                jnp.take(cohort.g0, members_dev, axis=1), keep_dev, axis=0
            )
            g1s = jnp.take(
                jnp.take(cohort.g1, members_dev, axis=1), keep_dev, axis=0
            )
            w = np.zeros(s_pad, dtype=F32)
            w[: tables.keep_sites.size] = 1.0
            ones = rt.replicate(np.ones((n_pop, 1), dtype=F32))
            zeros = rt.replicate(np.zeros(n_pop, dtype=np.int32))
            f, _, _ = em_maf_pops(
                g0s, g1s, ones, zeros, rt.shard_sites(w),
                tables.keep_sites.size, max_iter, tol,
            )
            return clamp_af(f, n_pop)[:, 0]

        _fill(out, pos, *_individual_z(
            cohort, beagle, ad, i, af_kept, n_threshold, single_read_threshold
        ))
        if verbose:
            _print_ind(i, out, pos)
    return out


def assignment_z_scores(
    beagle: BeagleData,
    ad: np.ndarray,
    assigned_labels,
    af: np.ndarray,
    pops,
    ind_start: int = 0,
    ind_end: Optional[int] = None,
    n_threshold: int = 0,
    single_read_threshold: bool = False,
    runtime: Optional[Runtime] = None,
    cohort: Optional[DeviceCohort] = None,
    verbose: bool = False,
) -> ZScoreResult:
    """Assignment mode: AF is the saved panel's column for the individual's
    *assigned* population, sliced at the kept sites (WGSassign.py:425-443)."""
    if cohort is None:
        cohort = to_device(beagle, runtime)
    rt = cohort.runtime
    n = cohort.n_inds
    ind_end = n if ind_end is None else ind_end
    af = np.asarray(af, F32)
    pops = np.asarray(pops, dtype=str)
    assigned_labels = np.asarray(assigned_labels, dtype=str)
    out = _empty_result(ind_end - ind_start)

    for pos, i in enumerate(range(ind_start, ind_end)):
        hits = np.flatnonzero(pops == assigned_labels[i])
        if hits.size == 0:
            raise ValueError(
                f"Assigned population {assigned_labels[i]!r} of individual {i} "
                "not found in the population-names file"
            )
        k = int(hits[0])

        def af_kept(tables, s_pad, k=k):
            a = np.full(s_pad, PAD_AF, dtype=F32)
            a[: tables.keep_sites.size] = af[tables.keep_sites, k]
            return rt.shard_sites(a)

        _fill(out, pos, *_individual_z(
            cohort, beagle, ad, i, af_kept, n_threshold, single_read_threshold
        ))
        if verbose:
            _print_ind(i, out, pos)
    return out


def _empty_result(n_sub: int) -> ZScoreResult:
    return ZScoreResult(
        z=np.empty(n_sub, dtype=F32),
        loci=np.empty(n_sub, dtype=np.int32),
        w_obs=np.empty(n_sub, dtype=F32),
        w_mu=np.empty(n_sub, dtype=F32),
        w_var=np.empty(n_sub, dtype=F32),
    )


def _fill(out: ZScoreResult, pos: int, z, loci, w_obs, w_mu, w_var):
    out.z[pos] = z
    out.loci[pos] = loci
    out.w_obs[pos] = w_obs
    out.w_mu[pos] = w_mu
    out.w_var[pos] = w_var


def _print_ind(i: int, out: ZScoreResult, pos: int):
    print(f"Finished individual {i}")
    print(f"z_mu: {out.w_mu[pos]}")
    print(f"z_var: {out.w_var[pos]}")
    print(f"z_obs: {out.w_obs[pos]}")
    print(f"Loci used: {out.loci[pos]}")
    print(f"Z-score: {out.z[pos]}")
