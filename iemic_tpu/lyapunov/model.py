"""LyapunovModel — decorator adding covariance solves at post_process.

TPU-native analog of the reference's ``LyapunovModel<Model>``
(reference src/lyapunov/LyapunovModel.H:22-110): at every converged
continuation point, solve the generalized Lyapunov equation

    A X M^T + M X A^T + B B^T = 0

for the stationary covariance X of the linearized stochastically forced
system, by Schur complement onto the mass dofs (M's diagonal is zero on
w and p rows — reference handles the same singular-mass structure,
including the pressure checkerboard nullspace, via a projected solve).

With diagonal M restricted to its nonzero block (M1):
    S = A11 - A12 A22^{-1} A21        (Schur complement, matrix-free)
    Z = M1 X11 M1,  Atil = S M1^{-1}  =>  Atil Z + Z Atil^T + B1 B1^T = 0
solved low-rank by :func:`iemic_tpu.lyapunov.rails.rails`.

Spectrum and trace of the covariance are stored per point, like the
reference stores them for bifurcation-precursor analysis.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .rails import rails


class LyapunovModel:
    """Wrap any Model; delegates everything, adds covariance solves."""

    def __init__(self, model, params: dict | None = None):
        self._model = model
        p = dict(params or {})
        self.tol = float(p.get("Tolerance", 1e-5))
        self.maxiter = int(p.get("Maximum Iterations", 100))
        self.expand = int(p.get("Expand Size", 3))
        self.restart_size = int(p.get("Restart Size", 60))
        self.reduced_size = int(p.get("Reduced Size", 30))
        self.inner_tol = float(p.get("Schur Solver Tolerance", 1e-8))
        self.noise_amp = float(p.get("Noise Amplitude", 1.0))
        self.enabled = bool(p.get("Enabled", True))
        self.results: list[dict] = []

    def __getattr__(self, name):
        return getattr(self._model, name)

    # -- covariance machinery ------------------------------------------

    def _mass_partition(self):
        m = self._model
        n = int(np.asarray(m.to_flat()).shape[0])
        mdiag = np.asarray(m.apply_mass_matrix(m.from_flat(jnp.ones(n))))
        mdiag = np.asarray(m.to_flat(mdiag)).ravel()
        mass = np.abs(mdiag) > 1e-14
        return mdiag, mass, ~mass

    def _noise_factor(self, mass: np.ndarray):
        """B restricted to mass dofs.  Models may expose a stochastic
        forcing factor (reference THCM::computeForcing,
        src/ocean/forcing.F90:220-268); default: identity-scaled noise
        on the T,S-like mass dofs."""
        m = self._model
        if hasattr(m, "stochastic_forcing_factor"):
            B = np.asarray(m.stochastic_forcing_factor())
        else:
            n = mass.size
            rng = np.random.default_rng(7)
            B = rng.standard_normal((n, 1))
            B[~mass] = 0.0
        if B.ndim == 1:
            B = B[:, None]
        return self.noise_amp * B[mass]

    def _dense_jacobian(self, n: int) -> np.ndarray:
        """Materialize A by a vmapped batch of stencil matvecs.

        Lyapunov solves are only tractable at 2DMOC-scale problems
        (the reference likewise restricts run_lyapunov/intt_2dmoc to
        small grids); one batched apply on identity is far cheaper
        than the O(k * inner-Krylov) matrix-free Schur alternative."""
        import jax
        m = self._model

        def mv(v):
            return jnp.ravel(m.to_flat(m.apply_matrix(m.from_flat(v))))

        cols = []
        chunk = 512
        eye = np.eye(n)
        bmv = jax.jit(jax.vmap(mv))
        for j0 in range(0, n, chunk):
            cols.append(np.asarray(bmv(jnp.asarray(eye[j0:j0 + chunk]))))
        return np.concatenate(cols, axis=0).T   # columns j = A e_j

    def solve_covariance(self):
        """Solve the projected Lyapunov equation at the current state."""
        m = self._model
        m.compute_jacobian()
        mdiag, mass, dummy = self._mass_partition()
        n = mdiag.size

        A = self._dense_jacobian(n)
        A11 = A[np.ix_(mass, mass)]
        A12 = A[np.ix_(mass, dummy)]
        A21 = A[np.ix_(dummy, mass)]
        A22 = A[np.ix_(dummy, dummy)]
        # Schur complement onto the mass dofs; A22 is the (w,p) block.
        # lstsq (minimal-norm) handles the pressure checkerboard
        # nullspace by projecting it out, as the reference's projected
        # solve does (LyapunovModel.H: checkerboard handling).
        Y, *_ = np.linalg.lstsq(A22, A21, rcond=None)
        S = A11 - A12 @ Y

        m1 = mdiag[mass]
        Atil = S / m1[None, :]

        def atil_mul(Wm):
            Wm = np.asarray(Wm, dtype=np.float64)
            return Atil @ Wm

        B1 = self._noise_factor(mass)
        res = rails(atil_mul, B1, tol=self.tol, maxiter=self.maxiter,
                    expand=self.expand, restart_size=self.restart_size,
                    reduced_size=self.reduced_size)
        # back-transform: X11 = M1^{-1} Z M1^{-1} = (V/m1) T (V/m1)^T
        Vx = res.V / m1[:, None]
        evals = np.linalg.eigvalsh(res.T)[::-1]
        trace = float(np.sum(np.sum(Vx * (Vx @ res.T), axis=1)))
        out = {
            "par": float(getattr(m, "get_par", lambda *_: np.nan)(
                "Combined Forcing")) if hasattr(m, "get_par") else np.nan,
            "trace": trace,
            "spectrum": evals,
            "resnorm": res.resnorm,
            "iterations": res.iterations,
            "converged": res.converged,
            "V": Vx, "T": res.T, "mass": mass,
        }
        self.results.append(out)
        return out

    # -- Model contract passthrough with hook --------------------------

    def post_process(self):
        self._model.post_process()
        if self.enabled:
            r = self.solve_covariance()
            from ..utils.logging import INFO
            INFO("Lyapunov: trace=%.6e res=%.3e its=%d conv=%s"
                 % (r["trace"], r["resnorm"], r["iterations"],
                    r["converged"]))
