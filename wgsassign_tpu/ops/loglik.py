"""Assignment log-likelihood ops (reference glassy.py / glassy_cy.pyx).

Per (site, individual, population) the assignment likelihood under HWE is

    P(D_si | pop k) = g0*(1-a)^2 + g1*2a(1-a) + g2*a^2,   a = af[s, k]

and the assignment log-likelihood is the sum of logs over sites
(glassy_cy.pyx:12-21, summed at glassy.py:38).

TPU design: where the reference launches N*K separate M-length scans, we
compute the whole ``[N, K]`` matrix in one fused pass — the elementwise
``log(...)`` producer fuses into the site-axis reduction, so the ``[M, N, K]``
intermediate never materializes.  Padded sites are masked with a per-site
weight.  Partitioned variants reshape the (padded) site axis to ``[Q, P]``
so partition ``p`` collects sites with ``s % P == p``, matching reference
utils.partition_loglikes (utils.py:129-151).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_F32 = jnp.float32


def site_loglik(g0, g1, a):
    """log( g0*(1-a)^2 + g1*2a(1-a) + (1-g0-g1)*a^2 ), broadcasting."""
    oma = 1.0 - a
    like = g0 * oma * oma + g1 * 2.0 * a * oma + (1.0 - g0 - g1) * a * a
    return jnp.log(like)


@jax.jit
def assign_loglik(g0, g1, af, site_weight):
    """Full ``[N, K]`` assignment log-likelihood matrix.

    Args:
      g0, g1: float32 ``[M, N]``.
      af: float32 ``[M, K]`` population allele frequencies.
      site_weight: float32 ``[M]`` (0 for padded sites).

    Returns: float32 ``[N, K]``.
    """
    ll = site_loglik(g0[:, :, None], g1[:, :, None], af[:, None, :])
    ll = ll * site_weight[:, None, None]
    return jnp.sum(ll, axis=0)


@functools.partial(jax.jit, static_argnames=("num_partitions",))
def assign_loglik_partitioned(g0, g1, af, site_weight, num_partitions: int):
    """Per-partition sums: ``[P, N, K]`` where partition p = sites with
    ``s % P == p``.  Requires the (padded) site count to be a multiple of P.
    """
    m, n = g0.shape
    k = af.shape[1]
    p = num_partitions
    assert m % p == 0, "site axis must be padded to a multiple of num_partitions"
    ll = site_loglik(g0[:, :, None], g1[:, :, None], af[:, None, :])
    ll = ll * site_weight[:, None, None]
    return jnp.sum(ll.reshape(m // p, p, n, k), axis=0)


@jax.jit
def assign_loglik_selected(g0, g1, af_bank_t, col_idx, site_weight):
    """Assignment log-likelihoods where each (individual, population) pair
    uses its own AF column from a bank — the general form needed for LOO with
    the reference's in-place AF-mutation semantics (glassy.py:87-98).

    Args:
      g0, g1: float32 ``[M, N]``.
      af_bank_t: float32 ``[C, M]`` bank of AF vectors, site-minor layout
        (a ``[M, C]`` bank would lane-pad C and waste HBM at scale).
      col_idx: int32 ``[N, K]`` — bank row used for pair (i, k).
      site_weight: float32 ``[M]``.

    Returns: float32 ``[N, K]``.

    Scans over individuals so only a ``[K, M]`` gather is live at a time.
    """

    def one_ind(carry, inputs):
        i, idx_i = inputs  # scalar, [K]
        g0i = jax.lax.dynamic_index_in_dim(g0, i, axis=1, keepdims=False)
        g1i = jax.lax.dynamic_index_in_dim(g1, i, axis=1, keepdims=False)
        a = jnp.take(af_bank_t, idx_i, axis=0)  # [K, M]
        ll = site_loglik(g0i[None, :], g1i[None, :], a)
        ll = ll * site_weight[None, :]
        return carry, jnp.sum(ll, axis=1)

    n = g0.shape[1]
    _, out = jax.lax.scan(one_ind, None, (jnp.arange(n), col_idx))
    return out


@functools.partial(jax.jit, static_argnames=("num_partitions",))
def assign_loglik_selected_partitioned(
    g0, g1, af_bank_t, col_idx, site_weight, num_partitions: int
):
    """Partitioned variant of :func:`assign_loglik_selected`.

    Returns ``(ll [N, K], parts [N, P, K])``.
    """
    m, n = g0.shape
    p = num_partitions
    assert m % p == 0, "site axis must be padded to a multiple of num_partitions"

    def one_ind(carry, inputs):
        i, idx_i = inputs
        g0i = jax.lax.dynamic_index_in_dim(g0, i, axis=1, keepdims=False)
        g1i = jax.lax.dynamic_index_in_dim(g1, i, axis=1, keepdims=False)
        a = jnp.take(af_bank_t, idx_i, axis=0)  # [K, M]
        ll = site_loglik(g0i[None, :], g1i[None, :], a)
        ll = ll * site_weight[None, :]
        parts = jnp.sum(ll.reshape(-1, m // p, p), axis=1)  # [K, P]
        return carry, (jnp.sum(parts, axis=1), parts.T)

    _, (ll, parts) = jax.lax.scan(one_ind, None, (jnp.arange(n), col_idx))
    return ll, parts
