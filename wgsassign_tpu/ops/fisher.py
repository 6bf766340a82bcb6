"""Fisher-information / effective-sample-size ops (reference fisher.py /
fisher_cy.pyx).

Per (site, individual) with GLs ``(g0, g1, g2)`` and the individual's
population AF ``th``:

    u    = g0*(1-th)^2 + g1*2*th*(1-th) + g2*th^2         (site likelihood)
    n1   = 2*(g0 + g2 - 2*g1)                              (d2u/dth2)
    n2   = th*n1 + 2*(g1 - g0)                             (du/dth)
    term = -(n1/u - (n2/u)^2)    = -d^2/dth^2 log u        (observed info)

(fisher_cy.pyx:12-30).  Population info is the sum of ``term`` over members
— here one matmul against the one-hot membership matrix instead of the
reference's per-pop kernel launches.  Effective sample size:
``ne = 0.5 * info * th * (1-th)`` (fisher_cy.pyx:32-39); the individual-level
ne is its mean over sites (fisher.py:58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_F32 = jnp.float32


def _fisher_term(g0, g1, th):
    g2 = 1.0 - g0 - g1
    omt = 1.0 - th
    u = g0 * omt * omt + g1 * 2.0 * th * omt + g2 * th * th
    n1 = 2.0 * (g0 + g2 - 2.0 * g1)
    n2 = th * n1 + 2.0 * (g1 - g0)
    r = n2 / u
    return -(n1 / u - r * r)


@jax.jit
def fisher_obs_pops(g0, g1, af, membership, pop_index, site_weight, m_real):
    """Population- and individual-level observed Fisher info and Ne.

    Args:
      g0, g1: float32 ``[M, N]``.
      af: float32 ``[M, K]`` clamped population AFs.
      membership: float32 ``[N, K]``; pop_index: int32 ``[N]``.
      site_weight: float32 ``[M]``; m_real: real site count.

    Returns:
      ``(f_obs [M, K], ne_obs [M, K], ne_ind [N])`` — rows beyond the real
      site count are junk (mask before use); ``ne_ind`` is already the masked
      mean over real sites.
    """
    th_ind = jnp.take(af, pop_index, axis=1)  # [M, N], exact gather
    term = _fisher_term(g0, g1, th_ind)  # [M, N]
    f_obs = jnp.dot(term, membership, precision=jax.lax.Precision.HIGHEST)
    ne_obs = 0.5 * f_obs * af * (1.0 - af)
    ne_term = 0.5 * term * th_ind * (1.0 - th_ind)  # [M, N]
    ne_ind = jnp.sum(ne_term * site_weight[:, None], axis=0) / jnp.asarray(
        m_real, _F32
    )
    return f_obs, ne_obs, ne_ind
