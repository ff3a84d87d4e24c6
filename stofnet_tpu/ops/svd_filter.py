"""SVD clutter filter for ultrasound IQ ensembles.

Parity target: /root/reference/utils/svd_filter.py — Casorati reshape
(Fortran order), autocorrelation x^H x, SVD, and reconstruction from the
singular-vector band [lo_cut:hi_cut] (numpy slice semantics: the default
hi_cut=-1 EXCLUDES the last singular vector).

TPU notes: the autocorrelation is one big MXU matmul; the decomposition runs
on the (small) t x t Gram matrix via ``eigh`` (hermitian, TPU-supported)
with columns flipped to descending order. The reconstruction is invariant to
per-column phase, so eigh's phase convention matches the reference's SVD.
"""

from __future__ import annotations

import jax.numpy as jnp


def _casorati(iq: jnp.ndarray) -> jnp.ndarray:
    """np.reshape(iq, (-1, t), order='F'): space-major Casorati matrix."""
    t = iq.shape[-1]
    rev = tuple(reversed(range(iq.ndim)))
    return jnp.transpose(iq, rev).reshape(t, -1).T


def _uncasorati(x: jnp.ndarray, shape) -> jnp.ndarray:
    t = shape[-1]
    rev = tuple(reversed(range(len(shape))))
    return jnp.transpose(x.T.reshape(tuple(reversed(shape))), rev)


def svd_filter(iq: jnp.ndarray, lo_cut: int = 4, hi_cut: int = -1) -> jnp.ndarray:
    """Suppress tissue clutter: zero the lo_cut strongest (and the slice-tail)
    singular components of the slow-time ensemble."""
    shape = iq.shape
    x = _casorati(iq)

    a = x.conj().T @ x  # (t, t) hermitian PSD Gram matrix
    _, u = jnp.linalg.eigh(a)  # ascending eigenvalues
    u = jnp.flip(u, axis=-1)  # descending, like np.linalg.svd

    v = x @ u
    n = v[:, lo_cut:hi_cut] @ u[:, lo_cut:hi_cut].conj().T
    return _uncasorati(n, shape)
