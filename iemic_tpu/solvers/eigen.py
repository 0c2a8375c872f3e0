"""Generalized eigensolver for stability / bifurcation analysis.

TPU-native replacement for the reference's external JDQZ++ solver
(reference src/utils/JDQZInterface.H:8-66 exposing AMUL = J q,
BMUL = B q, PRECON = P^-1 q to jdqzpp; hooked into the continuation at
converged points, src/continuation/Continuation.H:1105-1131).

The capability — a few generalized eigenvalues of the pencil (J, B)
nearest a shift sigma, with B singular (zero mass on w/p rows) — is
delivered by shift-invert Arnoldi with Krylov-Schur restarting: the
operator (J - sigma B)^{-1} B is applied with the model's own solver
machinery (the analog of JDQZ's preconditioned correction solves), and
eigenvalues transform as lambda = sigma + 1/theta.  Infinite
eigenvalues of the singular pencil map harmlessly to theta = 0.

Parameter names follow the reference's jdqz_params.xml.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ParameterList
from ..utils import logging as log


def default_jdqz_params() -> ParameterList:
    p = ParameterList("JDQZ parameters")
    p.set("Shift (real part)", 0.0)
    p.set("Shift (imaginary part)", 0.0)
    p.set("Tolerance", 1e-9)
    p.set("Number of eigenvalues", 5)
    p.set("Max size search space", 1000)
    p.set("Min size search space", 20)
    p.set("Max JD iterations", 500)
    p.set("Tracking parameter", 1e-9)
    p.set("Criterion for Ritz values", 0)
    p.set("Linear solver", 1)
    p.set("GMRES search space", 20)
    p.set("Verbosity", 0)
    return p


class JDQZ:
    """Generalized eigensolver on a Model (the reference's JDQZsolver
    role).  After solve(), ``alpha``/``beta`` hold the generalized
    eigenvalue pairs (lambda = alpha/beta, beta = 1 for finite ones)
    and ``eigenvectors`` the (complex) eigenvectors."""

    def __init__(self, model, params: ParameterList | dict | None = None):
        if params is None:
            params = ParameterList("JDQZ parameters")
        if isinstance(params, dict):
            params = ParameterList("JDQZ parameters", params)
        params.validate_and_set_defaults(default_jdqz_params())
        self.params = params
        self.model = model
        self.sigma = params.get("Shift (real part)")
        if abs(params.get("Shift (imaginary part)")) > 0:
            log.WARNING("JDQZ: complex shifts not supported; using the "
                        "real part only")
        self.tol = params.get("Tolerance")
        self.kmax = params.get("Number of eigenvalues")
        self.jmax = min(params.get("Max size search space"),
                        max(4 * self.kmax + 8, 24))
        self.maxiter = params.get("Max JD iterations")
        self.eigenvalues = np.zeros(0, dtype=complex)
        self.alpha = np.zeros(0, dtype=complex)
        self.beta = np.zeros(0)
        self.eigenvectors: list = []
        self.kmax_converged = 0

    def print_parameters(self):
        log.INFO(f"JDQZ: shift={self.sigma}, kmax={self.kmax}, "
                 f"tol={self.tol}")

    # ------------------------------------------------------------------
    def _setup_operator(self):
        """Prepare (J - sigma B)^{-1} B using the model's machinery."""
        m = self.model
        m.compute_jacobian()
        m.compute_mass_matrix()
        if self.sigma != 0.0:
            m.add_mass_to_jacobian(-self.sigma)

        shape = np.shape(m.get_state())

        def op(v_flat):
            v = jnp.asarray(v_flat).reshape(shape)
            Bv = m.apply_mass_matrix(v)
            x = m.solve(Bv)
            return np.asarray(x).reshape(-1)

        return op, int(np.prod(shape))

    def solve(self):
        """Shift-invert Arnoldi with Krylov-Schur style restarting."""
        log.INFO("JDQZ: solve...")
        with log.timer("JDQZ: solve"):
            op, N = self._setup_operator()
            rng = np.random.default_rng(42)
            m_space = min(self.jmax, N)

            V = np.zeros((N, m_space + 1))
            H = np.zeros((m_space + 1, m_space))
            v0 = rng.standard_normal(N)
            V[:, 0] = v0 / np.linalg.norm(v0)

            nconv = 0
            j = 0
            it = 0
            while it < self.maxiter:
                # Arnoldi expansion
                while j < m_space:
                    w = op(V[:, j])
                    for i in range(j + 1):
                        H[i, j] = V[:, i] @ w
                        w = w - H[i, j] * V[:, i]
                    # reorthogonalize (DGKS)
                    for i in range(j + 1):
                        c = V[:, i] @ w
                        H[i, j] += c
                        w = w - c * V[:, i]
                    H[j + 1, j] = np.linalg.norm(w)
                    if H[j + 1, j] < 1e-12:
                        # invariant subspace: keep the completed column
                        j += 1
                        it += 1
                        break
                    V[:, j + 1] = w / H[j + 1, j]
                    j += 1
                    it += 1

                Hm = H[:j, :j]
                theta, S = np.linalg.eig(Hm)
                # convergence test: |h_{j+1,j} * s_j| per Ritz pair
                resid = np.abs(H[j, j - 1] * S[-1, :]) if j > 0 else []
                order = np.argsort(-np.abs(theta))  # largest |theta| =
                # eigenvalues closest to the shift
                good = []
                for idx in order:
                    if np.abs(theta[idx]) < 1e-13:
                        continue
                    lam = self.sigma + 1.0 / theta[idx]
                    rel = resid[idx] / max(np.abs(theta[idx]), 1e-300)
                    good.append((lam, theta[idx], S[:, idx], rel))
                nconv = sum(1 for g in good[:self.kmax]
                            if g[3] < self.tol)
                if nconv >= self.kmax or j >= N - 1 \
                        or it >= self.maxiter:
                    break

                # Krylov-Schur style restart: keep the best subspace
                keep = min(2 * self.kmax, j - 1)
                Q, _ = np.linalg.qr(
                    np.column_stack([np.real(S[:, order[:keep]]),
                                     np.imag(S[:, order[:keep]])]))
                keep = Q.shape[1]
                Vk = V[:, :j] @ Q
                Hk = Q.T @ Hm @ Q
                V[:, :keep] = Vk
                H[:, :] = 0.0
                H[:keep, :keep] = Hk
                # append residual vector to restart the recurrence
                vres = V[:, j]
                # orthogonalize vres against kept space
                for i in range(keep):
                    vres = vres - (V[:, i] @ vres) * V[:, i]
                nv = np.linalg.norm(vres)
                if nv < 1e-14:
                    vres = rng.standard_normal(N)
                    for i in range(keep):
                        vres = vres - (V[:, i] @ vres) * V[:, i]
                    nv = np.linalg.norm(vres)
                V[:, keep] = vres / nv
                j = keep

            # final extraction
            pairs = sorted(good, key=lambda g: -np.abs(g[1]))
            lams, vecs, betas = [], [], []
            for lam, th, s, rel in pairs[:self.kmax]:
                lams.append(lam)
                betas.append(1.0)
                vecs.append(V[:, :j] @ s)
            self.eigenvalues = np.asarray(lams)
            self.alpha = np.asarray(lams, dtype=complex)
            self.beta = np.asarray(betas)
            self.eigenvectors = vecs
            self.kmax_converged = nconv

        # restore the model's Jacobian (we shifted it)
        if self.sigma != 0.0:
            self.model.compute_jacobian()

        log.INFO(f"JDQZ: {self.kmax_converged} converged eigenvalues")
        for lam in self.eigenvalues:
            log.INFO(f"   lambda = {lam:.8e}")
        return 0

    def save(self, filename: str):
        """Save eigenvalues (the reference saves ev_step_<n> HDF5
        files via Utils::saveEigenvectors)."""
        with open(filename, "w") as f:
            for lam in self.eigenvalues:
                f.write(f"{lam.real:23.15e} {lam.imag:23.15e}\n")
