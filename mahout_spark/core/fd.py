"""Frequent-directions matrix sketch — the eighth mergeable sketch.

Liberty 2013 ("Simple and deterministic matrix sketching", KDD) /
Ghashami, Liberty, Phillips, Woodruff 2015 (SIAM J. Comput.): maintain
an ell x d matrix B such that   0 ⪯ AᵗA − BᵗB ⪯ Δ·I,  Δ = Σ shrink-δ,
with the a-priori ceiling Δ ≤ ‖A‖F²/ell (doubling variant; Liberty's
original states 2‖A‖F²/ell for the half-shrink form). It is the item-frequency/Misra-Gries
idea lifted to matrices, and — crucially for this repo — it is MERGEABLE
(Ghashami et al. §3): concatenating two sketches and shrinking back to
ell rows keeps the same bound, so it slots into the per-partition-build
+ tree-merge shape every other sketch here uses.

Role: a bounded-memory stand-in for the DRM layer's exact Gramian
(operators/drm.ata) when d is large enough that d² no longer fits the
driver — covariance/PCA/whitening over wide embedding matrices at
10^12-row scale. The exact ata shuffles d² floats; FD ships ell·d per
partition, ell ≪ d rows of it, and the result supports BᵗB,
approximate top singular vectors, and projection error bounds.

Not in the reference (its math layer computes exact Gramians via
AtA.scala); public algorithm, public bound. Deterministic for a FIXED
update/merge order (LAPACK SVD is deterministic); across different
partitionings the B matrices differ while the bound always holds —
order-insensitive up to the published error, the t-digest/KLL contract
(sketch/agg.py module doc).

The buffered doubling variant: rows append into the free half; when
2·ell rows are live, one SVD shrinks back to ell (amortizes the SVD
over ell appends — Liberty's own trick)."""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"FDS1"


def _svd_shrink(m: np.ndarray, ell: int) -> tuple[np.ndarray, float]:
    """SVD-shrink an (r x d) stack to ell rows: B = sqrt(max(S²−δ,0))Vᵗ
    with δ = S[ell-1]² (the ell-th largest singular value's square).
    Returns (B, δ) — the spectrum shifts down by at most δ."""
    _, s, vt = np.linalg.svd(m, full_matrices=False)
    if len(s) < ell:
        pad = np.zeros((ell, m.shape[1]))
        pad[:len(s)] = s[:, None] * vt
        return pad, 0.0
    delta = s[ell - 1] ** 2
    s2 = np.sqrt(np.maximum(s[:ell] ** 2 - delta, 0.0))
    return s2[:, None] * vt[:ell], float(delta)


@dataclass
class FrequentDirections:
    ell: int
    dim: int
    #: live buffer, <= 2*ell rows; first `n_rows` rows are valid
    rows: np.ndarray = field(default=None)
    n_rows: int = 0
    #: ‖A‖F² of everything ever ingested (exact, for bound checks)
    fnorm2: float = 0.0
    #: Σδ over every shrink — the TIGHT certified ‖AᵗA−BᵗB‖₂ bound
    #: (each shrink shifts the spectrum down by exactly its δ; the
    #: Frobenius gap ‖A‖F²−‖B‖F² ≥ ell·Σδ would be up to ell× looser)
    delta_sum: float = 0.0

    def __post_init__(self):
        if self.ell < 1 or self.dim < 1:
            raise ValueError("ell and dim must be >= 1")
        if self.rows is None:
            self.rows = np.zeros((2 * self.ell, self.dim))

    def update_batch(self, a: np.ndarray) -> None:
        """Ingest rows of A (n x dim)."""
        a = np.asarray(a, dtype=np.float64)
        if a.ndim == 1:
            a = a[None, :]
        if a.shape[1] != self.dim:
            raise ValueError(f"row dim {a.shape[1]} != sketch dim "
                             f"{self.dim}")
        self.fnorm2 += float((a * a).sum())
        i = 0
        while i < len(a):
            take = min(2 * self.ell - self.n_rows, len(a) - i)
            self.rows[self.n_rows:self.n_rows + take] = a[i:i + take]
            self.n_rows += take
            i += take
            if self.n_rows >= 2 * self.ell:
                self._shrink()

    def _shrink(self) -> None:
        b, delta = _svd_shrink(self.rows[:self.n_rows], self.ell)
        self.rows[:self.ell] = b
        self.rows[self.ell:] = 0.0
        self.n_rows = self.ell
        self.delta_sum += delta

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if (self.ell, self.dim) != (other.ell, other.dim):
            raise ValueError(
                f"mismatched FD configs: ell/dim {(self.ell, self.dim)} "
                f"vs {(other.ell, other.dim)}")
        out = FrequentDirections(self.ell, self.dim)
        out.fnorm2 = self.fnorm2 + other.fnorm2
        out.delta_sum = self.delta_sum + other.delta_sum
        stack = np.vstack([self.rows[:self.n_rows],
                           other.rows[:other.n_rows]])
        if len(stack) > self.ell:
            stack, delta = _svd_shrink(stack, self.ell)
            out.delta_sum += delta
        out.rows[:len(stack)] = stack
        out.n_rows = len(stack)
        return out

    @property
    def b(self) -> np.ndarray:
        """The current sketch matrix (<= 2*ell x dim view)."""
        return self.rows[:self.n_rows]

    def ata(self) -> np.ndarray:
        """BᵗB — the AᵗA approximation (dim x dim)."""
        b = self.b
        return b.T @ b

    def spectral_bound(self) -> float:
        """The certified ‖AᵗA − BᵗB‖₂ upper bound: Σδ over all shrinks.

        A-priori ceiling: every shrink removes ≥ ell·δ of Frobenius
        mass (the kept top-ell directions each lose exactly δ since
        σ_j² ≥ σ_ell² = δ), so Σδ ≤ ‖A‖F²/ell — the doubling variant's
        sharper form of Liberty's 2‖A‖F²/ell."""
        return self.delta_sum

    def serialize(self) -> bytes:
        b = np.ascontiguousarray(self.b)
        head = struct.pack("<4sqqqdd", _MAGIC, self.ell, self.dim,
                           self.n_rows, self.fnorm2, self.delta_sum)
        return head + b.astype("<f8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "FrequentDirections":
        if len(blob) < 44 or blob[:4] != _MAGIC:
            raise ValueError("not an FD sketch blob")
        _, ell, dim, n, fn2, ds = struct.unpack("<4sqqqdd", blob[:44])
        want = 44 + n * dim * 8
        if len(blob) != want:
            raise ValueError(f"FD blob length {len(blob)} != {want}")
        out = cls(ell, dim)
        out.n_rows = n
        out.fnorm2 = fn2
        out.delta_sum = ds
        out.rows[:n] = np.frombuffer(
            blob, dtype="<f8", offset=44).reshape(n, dim)
        return out
