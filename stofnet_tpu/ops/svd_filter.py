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


def _gram_eigh(x: jnp.ndarray):
    """Descending-ordered (eigenvalues, eigenvectors) of the slow-time Gram
    matrix x^H x — the shared decomposition behind both filter variants."""
    a = x.conj().T @ x  # (t, t) hermitian PSD Gram matrix
    w, u = jnp.linalg.eigh(a)  # ascending eigenvalues
    return jnp.flip(w, axis=-1), jnp.flip(u, axis=-1)


def svd_filter(iq: jnp.ndarray, lo_cut: int = 4, hi_cut: int = -1) -> jnp.ndarray:
    """Suppress tissue clutter: zero the lo_cut strongest (and the slice-tail)
    singular components of the slow-time ensemble."""
    shape = iq.shape
    x = _casorati(iq)
    _, u = _gram_eigh(x)

    v = x @ u
    n = v[:, lo_cut:hi_cut] @ u[:, lo_cut:hi_cut].conj().T
    return _uncasorati(n, shape)


def svd_filter_db(iq: jnp.ndarray, clutter_db: float) -> jnp.ndarray:
    """dB-threshold clutter filter: keep singular components whose magnitude
    relative to the principal one is below ``clutter_db`` (cutting the
    strong, slowly-varying tissue signal).

    Reconstruction of the reference's `clutter_db` knob (main.py:62; exact
    submodule math lost upstream — SURVEY.md §2.20): where ``svd_filter``
    cuts a fixed count of components (utils/svd_filter.py:3-24), this cuts
    by relative energy. Shares the same Gram/eigh decomposition; the
    singular values are the sqrt of the Gram eigenvalues.
    """
    shape = iq.shape
    x = _casorati(iq)
    w, u = _gram_eigh(x)
    s = jnp.sqrt(jnp.clip(w, 0.0))
    level = 20.0 * jnp.log10(s / s[0] + 1e-12)
    keep = (level < clutter_db).astype(u.dtype)
    n = (x @ (u * keep[None, :])) @ u.conj().T
    return _uncasorati(n, shape)
