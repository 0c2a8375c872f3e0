"""ATvS-Mix vertical mixing / convective adjustment / neutral physics.

Mirrors the reference's implicit-mixing verification strategy: the
graph-coloring FD Jacobian of vmix_fun (mix_imp.f:729-815) is replaced
by exact colored autodiff, validated here against central finite
differences of the full residual for every mixing regime
(P_VC convective adjustment, MIXP neutral physics, MKAP GM stirring,
ENER/ALPC consistent mixing, all tapers, rho-mixing, adaptive vmix=2).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from iemic_tpu.models.ocean import Ocean
from tests.test_ocean_core import make_ocean, _fd_check, _project


def test_mix_zero_at_trivial_state():
    """mix(0) = 0 and J_mix(0) = 0: the trivial-state tests of
    test_ocean.C:33-41 still hold with Mixing=1."""
    ocean = make_ocean()
    assert ocean.mixing is not None
    mix = ocean.mixing.rhs(ocean.state, ocean.par)
    assert float(jnp.max(jnp.abs(mix))) == 0.0
    blk = ocean.mixing.stencil(ocean.state, ocean.par)
    assert float(jnp.max(jnp.abs(blk))) == 0.0


def test_mixing_off_matches_reference_gate():
    """Mixing=0 disables the operator entirely (vmix_init flag 0)."""
    ocean = make_ocean(**{"Mixing": 0})
    assert ocean.mixing is None


@pytest.mark.parametrize("tap", [1, 2, 3])
def test_fd_jacobian_neutral_physics(tap):
    """MIXP != 0: Griffies triad isoneutral diffusion, all tapers."""
    ocean = make_ocean(n=5, m=5, l=4, **{"Taper": tap})
    ocean.set_par("Combined Forcing", 0.5)
    ocean.set_par("Temperature Forcing", 10.0)
    ocean.set_par("MIXP", 0.7)
    _fd_check(ocean, seed=11, tol=5e-5)


def test_fd_jacobian_gent_mcwilliams():
    """MKAP != 0: GM stirring enters with opposite sign on horizontal
    vs vertical triad fluxes (mix_imp.f piso-pgm / piso+pgm)."""
    ocean = make_ocean(n=5, m=5, l=4)
    ocean.set_par("MIXP", 0.5)
    ocean.set_par("MKAP", 0.3)
    _fd_check(ocean, seed=12, tol=5e-5)


def test_fd_jacobian_consistent_mixing():
    """ALPC < 1 activates the energetically consistent term
    eps = (1-ALPC)*ENER*PE_V (mix_imp.f:298-300)."""
    ocean = make_ocean(n=5, m=5, l=4)
    ocean.set_par("ALPC", 0.5)
    _fd_check(ocean, seed=13, tol=5e-5)


def test_fd_jacobian_no_rho_mixing():
    ocean = make_ocean(n=5, m=5, l=4, **{"Rho Mixing": False})
    _fd_check(ocean, seed=14)


def test_fd_jacobian_mixing_periodic_landmask():
    """Mixing + periodic wrap + coastal mask together."""
    from iemic_tpu.models.ocean import landmask as lmk
    ocean = make_ocean(n=6, m=5, l=4, periodic=True)
    landm = ocean.landm.copy()
    landm[1:, 2:4, 3:5] = 1
    landm[1:2, 1:2, 1:3] = 1
    ocean.set_land_mask(lmk.finalize_mask(landm, ocean.grid, True),
                        finalized=True)
    ocean.set_par("MIXP", 0.4)
    _fd_check(ocean, seed=15, tol=5e-5)


def test_adaptive_vmix_gates_on_field_norms():
    """vmix=2: operator inactive while T,S = 0, active otherwise
    (vmix_control, mix_imp.f:131-166)."""
    ocean = make_ocean(n=5, m=5, l=4, **{"Mixing": 2})
    x0 = ocean.state
    assert float(jnp.max(jnp.abs(ocean.mixing.rhs(x0, ocean.par)))) == 0.0
    rng = np.random.default_rng(0)
    x = _project(jnp.asarray(0.1 * rng.standard_normal(x0.shape)), ocean)
    mix = ocean.mixing.rhs(x, ocean.par)
    assert float(jnp.max(jnp.abs(mix))) > 0.0
    _fd_check(ocean, seed=16)


def test_convective_adjustment_damps_instability():
    """An unstably stratified column (dense water above light) gets an
    implicit vertical flux that mixes T toward stability: the mixing
    divergence has opposite signs at top/bottom of the column and acts
    to remove the T inversion (cold-over-warm; rho = -T)."""
    ocean = make_ocean(n=4, m=4, l=4, **{"Rho Mixing": False})
    x = jnp.zeros_like(ocean.state)
    # T decreasing upward-> rho = -T increasing upward -> unstable
    prof = jnp.asarray([3.0, 2.0, 1.0, 0.0])   # k=0 bottom .. k=3 top
    x = x.at[4].set(prof[:, None, None] * jnp.ones((4, 4, 4)))
    mix = ocean.mixing.rhs(x, ocean.par)
    mixT = np.asarray(mix[0])
    col = mixT[:, 1, 1]
    assert abs(col).max() > 0.0
    # residual F = ... + mix; dT/dt ~ -mix: the top cell (coldest) must
    # warm (mix < 0 there) and the bottom cell (warmest) must cool
    assert col[-1] < 0.0 and col[0] > 0.0


def test_stencil_matches_dense_fd_of_mix():
    """Direct entrywise check: colored-autodiff stencil == dense FD of
    the mixing operator (the testEntries pattern applied to mix)."""
    ocean = make_ocean(n=4, m=3, l=3)
    ocean.set_par("MIXP", 0.6)
    ocean.set_par("MKAP", 0.2)
    rng = np.random.default_rng(7)
    x = jnp.asarray(0.2 * rng.standard_normal(ocean.state.shape))
    mixop = ocean.mixing
    blk = np.asarray(mixop.stencil(x, ocean.par))   # (27,2,2,l,m,n)

    from iemic_tpu.ops.stencil import offsets
    offs = offsets()
    eps = 1e-7
    l, m, n = 3, 3, 4
    rng2 = np.random.default_rng(8)
    for _ in range(40):
        p = rng2.integers(27)
        a, b = rng2.integers(2), rng2.integers(2)
        k, j, i = rng2.integers(l), rng2.integers(m), rng2.integers(n)
        di, dj, dk = offs[p]
        kk, jj, ii = k + dk, j + dj, i + di
        if not (0 <= kk < l and 0 <= jj < m and 0 <= ii < n):
            continue  # ghost-neighbor entries: FD cannot probe them
        e = jnp.zeros_like(x).at[4 + b, kk, jj, ii].set(1.0)
        fd = (np.asarray(mixop.rhs(x + eps * e, ocean.par))
              - np.asarray(mixop.rhs(x - eps * e, ocean.par))) \
            / (2 * eps)
        got = blk[p, a, b, k, j, i]
        want = fd[a, k, j, i]
        assert abs(got - want) < 1e-6 * (1 + abs(want)), \
            f"entry p={p} a={a} b={b} at ({k},{j},{i}): {got} vs {want}"
