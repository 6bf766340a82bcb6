"""Reference-semantics oracle.

An independent, vectorized NumPy implementation of the reference pipeline's
*documented behavior* (see SURVEY.md §2 for the per-component semantics and
file:line citations).  The real reference is Cython/OpenMP and cannot be
built in this environment, so golden fixtures are generated from this oracle
instead; it preserves the semantics that matter for output compatibility:

- float32 kernels, float64 final log-likelihood sums;
- EM: init 0.25, global-RMSE convergence at tol, <= max_iter updates;
- AF clamping to [1/(2(n+1)), 1-1/(2(n+1))];
- the LOO in-place AF-mutation order dependence (SURVEY §2.5);
- the z-score combo filtering rules and split-enumeration (SURVEY §2.8);
- raw-exp mixture EM in float64 (SURVEY §2.9).

Accumulation order differs from the reference's serial per-site loops
(vectorized pairwise sums here), so fixtures are tolerance-level references,
not bit-exact ones.
"""

from __future__ import annotations

import math

import numpy as np

F32 = np.float32


# ---------------------------------------------------------------------------
# helpers on the legacy [M, 2N] layout (the oracle mirrors reference layouts)
# ---------------------------------------------------------------------------

def split_gl(L):
    """[M, 2N] -> (g0, g1) each [M, N]."""
    return L[:, 0::2], L[:, 1::2]


def pop_columns(ids_labels, pop, exclude=None):
    """Column indices into the [M, 2N] matrix for members of ``pop``."""
    idx = np.flatnonzero(np.asarray(ids_labels) == pop)
    if exclude is not None:
        idx = idx[idx != exclude]
    cols = np.sort(np.concatenate([idx * 2, idx * 2 + 1]))
    return idx, cols


# ---------------------------------------------------------------------------
# MAF EM
# ---------------------------------------------------------------------------

def emmaf(L, max_iter=200, tol=1e-4):
    """MAF EM on an [M, 2n] float32 GL matrix. Returns (f [M], n_updates)."""
    g0, g1 = split_gl(np.asarray(L, F32))
    g2 = (1.0 - g0 - g1).astype(F32)
    n = g0.shape[1]
    f = np.full(g0.shape[0], 0.25, dtype=F32)
    n_updates = 0
    for it in range(max_iter):
        fc = f[:, None]
        omf = (1.0 - fc).astype(F32)
        p0 = g0 * omf * omf
        p1 = g1 * (2.0 * fc * omf).astype(F32)
        p2 = g2 * fc * fc
        w = (p1 + 2.0 * p2) / (2.0 * (p0 + p1 + p2))
        f_new = (w.sum(axis=1, dtype=F32) / F32(n)).astype(F32)
        d = f_new - f
        rmse = np.sqrt(np.mean(d * d, dtype=F32))
        f = f_new
        n_updates = it + 1
        if rmse < tol:
            break
    return f, n_updates


def clamp_af(f, n_pop):
    lo = 1.0 / (2.0 * (n_pop + 1))
    hi = 1.0 - lo
    out = f.copy()
    out[out < lo] = lo
    out[out > hi] = hi
    return out


def reference_af(L, ids_labels, max_iter=200, tol=1e-4):
    """Per-pop EM + clamp. Returns (af [M, K] float32, pops)."""
    pops = np.unique(np.asarray(ids_labels))
    m = L.shape[0]
    af = np.empty((m, len(pops)), dtype=F32)
    for k, pop in enumerate(pops):
        idx, cols = pop_columns(ids_labels, pop)
        f, _ = emmaf(L[:, cols], max_iter, tol)
        af[:, k] = clamp_af(f, len(idx))
    return af, pops


# ---------------------------------------------------------------------------
# assignment log-likelihoods
# ---------------------------------------------------------------------------

def site_loglik(g0, g1, a):
    """float32 per-site log-likelihood; shapes broadcast."""
    oma = (1.0 - a).astype(F32)
    like = g0 * oma * oma + g1 * (2.0 * oma * a).astype(F32) + (1.0 - g0 - g1) * a * a
    return np.log(like).astype(F32)


def assign_ll(L, af):
    """[N, K] float32: per-site float32 logs, float64 site sums."""
    g0, g1 = split_gl(np.asarray(L, F32))
    af = np.asarray(af, F32)
    ll = site_loglik(g0[:, :, None], g1[:, :, None], af[:, None, :])
    return ll.sum(axis=0, dtype=np.float64).astype(F32)


def partition_sums(per_site, num_partitions):
    """[M] float32 -> [P] float32, partition by site_index % P."""
    m = per_site.shape[0]
    labels = np.arange(m) % num_partitions
    out = np.zeros(num_partitions, dtype=F32)
    np.add.at(out, labels, per_site)
    return out


def loo(L, af, ids_labels, max_iter=200, tol=1e-4, L_ds=None, num_partitions=1):
    """Leave-one-out assignment with the reference's in-place AF mutation.

    Returns (ll [N, K] float32, parts [N*P, K] float32).
    """
    af = np.asarray(af, F32).copy()
    g_src = np.asarray(L_ds if L_ds is not None else L, F32)
    g0s, g1s = split_gl(g_src)
    n = L.shape[1] // 2
    pops = np.unique(np.asarray(ids_labels))
    k = af.shape[1]
    ll = np.zeros((n, k), dtype=F32)
    parts = np.zeros((n * num_partitions, k), dtype=F32)
    for i in range(n):
        i_pop = ids_labels[i]
        idx, cols = pop_columns(ids_labels, i_pop, exclude=i)
        f, _ = emmaf(L[:, cols], max_iter, tol)
        pop_col = int(np.flatnonzero(pops == i_pop)[0])
        af[:, pop_col] = clamp_af(f, len(idx))
        for j in range(k):
            vec = site_loglik(g0s[:, i], g1s[:, i], af[:, j])
            ll[i, j] = np.sum(vec, dtype=np.float64)
            parts[i * num_partitions : (i + 1) * num_partitions, j] = partition_sums(
                vec, num_partitions
            )
    return ll, parts


# ---------------------------------------------------------------------------
# Fisher information / effective sample sizes
# ---------------------------------------------------------------------------

def fisher_term(g0, g1, th):
    g2 = (1.0 - g0 - g1).astype(F32)
    omt = (1.0 - th).astype(F32)
    u = g0 * omt * omt + g1 * (2.0 * th * omt).astype(F32) + g2 * th * th
    n1 = (2.0 * (g0 + g2 - 2.0 * g1)).astype(F32)
    n2 = (th * n1 + 2.0 * (g1 - g0)).astype(F32)
    return (-(n1 / u - (n2 / u) ** 2)).astype(F32)


def fisher_ne(L, af, ids_labels):
    """Returns (f_obs [M,K], ne_obs [M,K], ne_ind [N]) float32."""
    g0, g1 = split_gl(np.asarray(L, F32))
    af = np.asarray(af, F32)
    pops = np.unique(np.asarray(ids_labels))
    m, n = g0.shape
    k = len(pops)
    f_obs = np.empty((m, k), dtype=F32)
    for j, pop in enumerate(pops):
        idx, _ = pop_columns(ids_labels, pop)
        th = af[:, j : j + 1]
        term = fisher_term(g0[:, idx], g1[:, idx], th)
        f_obs[:, j] = term.sum(axis=1, dtype=F32)
    ne_obs = (0.5 * f_obs * af * (1.0 - af)).astype(F32)
    pop_of = np.searchsorted(pops, np.asarray(ids_labels))
    th_ind = af[:, pop_of]  # [M, N]
    term_ind = fisher_term(g0, g1, th_ind)
    ne_ind = (0.5 * term_ind * th_ind * (1.0 - th_ind)).mean(axis=0, dtype=F32)
    return f_obs, ne_obs, ne_ind.astype(F32)


# ---------------------------------------------------------------------------
# z-scores
# ---------------------------------------------------------------------------

def zscore_tables(L, AD, i, n_threshold, single_read_threshold):
    """Combo grouping + filtering for individual i.

    Returns dict with: combos [R,2] kept combos, counts, mean_gl [R,3],
    keep_sites (indices), plus per-combo arrays over *all* observed combos
    for the keep-site rule.
    """
    g0 = L[:, 2 * i].astype(F32)
    g1 = L[:, 2 * i + 1].astype(F32)
    g2 = (1.0 - g0 - g1).astype(F32)
    ar = AD[:, 2 * i].astype(np.int64)
    aa = AD[:, 2 * i + 1].astype(np.int64)
    width = aa.max() + 1 if len(aa) else 1
    code = ar * width + aa
    uniq_codes, inv, counts = np.unique(code, return_inverse=True, return_counts=True)
    n_combos = len(uniq_codes)
    mean_gl = np.zeros((n_combos, 3), dtype=np.float64)
    for gi, g in enumerate((g0, g1, g2)):
        mean_gl[:, gi] = np.bincount(inv, weights=g.astype(np.float64), minlength=n_combos)
    mean_gl /= counts[:, None]
    combos = np.stack([uniq_codes // width, uniq_codes % width], axis=1)
    totals = combos.sum(axis=1)
    # combo filtering (reference zscore.py:30-39)
    if single_read_threshold:
        keep = totals == 1
    else:
        keep = (counts > n_threshold) & (totals != 0)
    assert keep.sum() >= 2, "Not enough combos kept! Too stringent filtering?"
    kept_tot = totals[keep]
    dl, dl_counts = np.unique(kept_tot, return_counts=True)
    dl_keep = set(dl[dl < dl_counts])
    keep &= np.isin(totals, list(dl_keep))
    # site keeping (reference zscore.py:43-61): combo survived AND the
    # individual's GL at the combo's argmax-mean entry is within 0.01 of the
    # combo mean at that entry.
    site_combo_kept = keep[inv]
    max_id = mean_gl.argmax(axis=1)
    gl3 = np.stack([g0, g1, g2], axis=1).astype(np.float64)
    site_gl_at_max = gl3[np.arange(len(inv)), max_id[inv]]
    mean_at_max = mean_gl[inv, max_id[inv]]
    site_gl_ok = np.abs(mean_at_max - site_gl_at_max) <= 0.01
    keep_sites = np.flatnonzero(site_combo_kept & site_gl_ok)
    return {
        "combos": combos[keep],
        "counts": counts[keep],
        "mean_gl": mean_gl[keep].astype(F32),
        "keep_sites": keep_sites,
        "ar": ar,
        "aa": aa,
    }


def zscore_read_probs(combos, e):
    """Binomial read-probabilities under each genotype (zscore.py:63-79)."""
    r = combos.shape[0]
    probs = np.zeros((r, 3), dtype=F32)
    for row in range(r):
        ar, aa = int(combos[row, 0]), int(combos[row, 1])
        d = ar + aa
        c = math.factorial(d) / (math.factorial(aa) * math.factorial(ar))
        probs[row, 0] = c * ((1.0 - e) ** ar) * (e**aa)
        probs[row, 1] = c * (0.5**d)
        probs[row, 2] = c * ((1.0 - e) ** aa) * (e**ar)
    return probs


def zscore_stats(L, i, tables, af_kept, e=0.01):
    """Observed / expected / variance W sums over kept sites.

    ``af_kept``: AF at the kept sites (own-pop LOO AF in reference mode,
    assigned-pop AF column in assignment mode).  Returns (W_obs, W_mu, W_var).
    """
    keep = tables["keep_sites"]
    combos = tables["combos"]
    mean_gl = tables["mean_gl"]
    read_probs = zscore_read_probs(combos, e)
    # row lookup: combo (ar, aa) -> row
    row_of = {(int(a), int(b)): r for r, (a, b) in enumerate(combos)}
    g0 = L[keep, 2 * i].astype(F32)
    g1 = L[keep, 2 * i + 1].astype(F32)
    a = np.asarray(af_kept, F32)
    p0 = ((1.0 - a) * (1.0 - a)).astype(F32)
    p1 = (2.0 * (1.0 - a) * a).astype(F32)
    p2 = (a * a).astype(F32)
    w_obs_site = np.log(g0 * p0 + g1 * p1 + (1.0 - g0 - g1) * p2).astype(F32)
    ar = tables["ar"][keep]
    aa = tables["aa"][keep]
    d = ar + aa
    s_kept = len(keep)
    w_mu = np.zeros(s_kept, dtype=F32)
    w_var = np.zeros(s_kept, dtype=F32)
    # enumerate splits per site (vectorized per depth value)
    for depth in np.unique(d):
        sites = np.flatnonzero(d == depth)
        rows = np.array([row_of[(int(depth - x), int(x))] for x in range(depth + 1)])
        lg = np.log(
            mean_gl[rows, 0][None, :] * p0[sites, None]
            + mean_gl[rows, 1][None, :] * p1[sites, None]
            + mean_gl[rows, 2][None, :] * p2[sites, None]
        ).astype(F32)  # [S_d, depth+1]
        weight = (
            p0[sites, None] * read_probs[rows, 0][None, :]
            + p1[sites, None] * read_probs[rows, 1][None, :]
            + p2[sites, None] * read_probs[rows, 2][None, :]
        ).astype(F32)
        w_mu[sites] = (lg * weight).sum(axis=1, dtype=F32)
        w_var[sites] = (
            ((w_mu[sites][:, None] - lg) ** 2 * weight).sum(axis=1, dtype=F32)
        )
    return (
        float(np.sum(w_obs_site, dtype=F32)),
        float(np.sum(w_mu, dtype=F32)),
        float(np.sum(w_var, dtype=F32)),
    )


def zscore_individual(
    L,
    AD,
    ids_labels,
    i,
    af=None,
    pops=None,
    n_threshold=0,
    single_read_threshold=False,
    max_iter=200,
    tol=1e-4,
    e=0.01,
):
    """Full per-individual z-score.

    Reference mode (af=None): own-pop LOO EM on kept sites (WGSassign.py:346-381).
    Assignment mode (af given): assigned-pop AF column at kept sites
    (WGSassign.py:425-443).  Returns (z, loci_kept).
    """
    tables = zscore_tables(L, AD, i, n_threshold, single_read_threshold)
    keep = tables["keep_sites"]
    i_pop = ids_labels[i]
    if af is None:
        idx, cols = pop_columns(ids_labels, i_pop, exclude=i)
        f, _ = emmaf(L[keep][:, cols], max_iter, tol)
        af_kept = clamp_af(f, len(idx))
    else:
        k = int(np.flatnonzero(np.asarray(pops) == i_pop)[0])
        af_kept = np.asarray(af, F32)[keep, k]
    w_obs, w_mu, w_var = zscore_stats(L, i, tables, af_kept, e)
    z = (w_obs - w_mu) / math.sqrt(w_var)
    return F32(z), len(keep)


# ---------------------------------------------------------------------------
# mixture proportions
# ---------------------------------------------------------------------------

def em_mix(ll_mat, ids_labels, n_iter=200):
    """Raw-exp mixture EM in float64 (reference mixture.py:10-39).

    Returns (harvest_pops, pi [H, K] float64).
    """
    ll_mat = np.asarray(ll_mat, np.float64)
    k = ll_mat.shape[1]
    harvest = np.unique(np.asarray(ids_labels))
    out = np.empty((len(harvest), k), dtype=np.float64)
    for h, pop in enumerate(harvest):
        rows = np.flatnonzero(np.asarray(ids_labels) == pop)
        lik = np.exp(ll_mat[rows])
        n_ind = len(rows)
        pi = np.full(k, 1.0 / k)
        for _ in range(n_iter):
            r = lik * pi[None, :]
            r = r / r.sum(axis=1, keepdims=True)
            pi = r.sum(axis=0) / n_ind
        out[h] = pi
    return harvest, out
