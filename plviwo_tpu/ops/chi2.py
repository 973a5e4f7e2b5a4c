"""Chi-square gating table (L0).

Replaces the reference's boost::math-based quantile computation
(`UpdaterStatistics.cpp:31-155`: a precomputed 0.95-quantile table for dof<500
plus on-demand quantiles) with a lookup table computed once at import from
`scipy.stats.chi2.ppf` (scipy ships with the baked image) covering
dof 1..2048; jitted gates index the table with traced dofs.
"""

from __future__ import annotations

import numpy as np
from scipy import stats as _stats  # scipy ships with the baked image (via jax deps)

MAX_DOF = 2048

# 0.95 quantile table, dof = 0 unused
_TABLE = np.zeros(MAX_DOF + 1)
_TABLE[1:] = _stats.chi2.ppf(0.95, np.arange(1, MAX_DOF + 1))


def chi2_quantile_095(dof):
    """0.95 chi2 quantile for integer dof (scalar or array), table lookup.

    Works under jit: dof may be a traced integer array; values above MAX_DOF
    clamp to the MAX_DOF entry (conservative for the gate).
    """
    import jax.numpy as jnp

    table = jnp.asarray(_TABLE)
    idx = jnp.clip(jnp.asarray(dof), 1, MAX_DOF)
    return table[idx]
