"""Small-matrix linear algebra, unrolled for TPU.

``jnp.linalg.cholesky`` on batched tiny SPD matrices (7x7 .. 33x33 joint-space
mass matrices) lowers to a sequential loop on TPU and dominated the step time
(~3.2 ms of a 4.5 ms forward-dynamics call at B=4096). These unrolled
versions emit a pure elementwise scalar graph over the batch axis — XLA fuses
it into a handful of kernels, ~20x faster for n=7.

Single-env semantics (vmap outside). The factor is returned as a nested
tuple of traced scalars (a pytree), so no scatter/gather ops are generated.
For n > _UNROLL_MAX we fall back to lax cholesky.
"""

from __future__ import annotations

import jax.numpy as jnp

_UNROLL_MAX = 16


def chol_factor(M):
    """Cholesky factor of a small SPD matrix (n,n).

    Returns an opaque factor object for :func:`chol_solve`:
      n <= _UNROLL_MAX: nested tuple L[i][j] of scalars (j <= i);
      else: the dense lower-triangular matrix from lax.
    """
    n = M.shape[-1]
    if n > _UNROLL_MAX:
        return jnp.linalg.cholesky(M)
    L = [[None] * (i + 1) for i in range(n)]
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return tuple(tuple(row) for row in L)


def chol_solve(L, rhs):
    """Solve ``M x = rhs`` given :func:`chol_factor` output.

    rhs: (n,) or (n, m); returns the same shape. All ops are elementwise
    over any trailing/batch dims of the scalar entries.
    """
    if isinstance(L, jnp.ndarray):
        import jax.scipy.linalg as jsl
        if rhs.ndim == 1:
            return jsl.cho_solve((L, True), rhs[:, None])[:, 0]
        return jsl.cho_solve((L, True), rhs)
    n = len(L)
    # forward substitution: L y = rhs
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for j in range(i):
            s = s - L[i][j] * y[j]
        y[i] = s / L[i][i]
    # back substitution: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for j in range(i + 1, n):
            s = s - L[j][i] * x[j]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=0)
