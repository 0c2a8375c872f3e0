"""Topography homotopy continuation (the reference's test_topo.C
pattern: spin up under one mask, then continue Delta 0 -> 1 into a new
mask and verify the deformed state is a steady state of the new
topography)."""

import numpy as np
import jax.numpy as jnp

from iemic_tpu.models.ocean import Ocean
from iemic_tpu.continuation import Continuation
from iemic_tpu.topo import Topo

from test_continuation_2dmoc import make_2dmoc_ocean, CONT_PARS


def _seamount_mask(n, m, l):
    """Raw (l, m, n) mask with a single bottom land cell (a seamount —
    a gentle topography change whose homotopy path stays connected on
    this very coarse grid; a full-depth island folds the path)."""
    raw = np.zeros((l, m, n), dtype=np.int64)
    raw[0, m // 2, n // 2] = 1          # LAND at the bottom layer
    return raw


def test_topo_homotopy_leg():
    n, m, l = 4, 6, 4
    # flat_bottom would wipe the seamount in finalize_mask
    ocean = make_2dmoc_ocean(n=n, m=m, l=l, flat_bottom=False)

    # ---- spin up under mask A (no land) to modest forcing ----------
    pars = dict(CONT_PARS)
    pars["destination 0"] = 0.1
    res = Continuation(ocean, pars).run()
    assert res.status == 0
    x_A = ocean.get_state()

    # ---- homotopy to mask B (bottom seamount) -----------------------
    topo = Topo(ocean, {"Number of mask files": 0})
    topo.set_masks([np.zeros((l, m, n), dtype=np.int64),
                    _seamount_mask(n, m, l)])
    topo.initialize()

    # delta = 0: RHS reduces to the w/p rows of F_B (prognostic rows
    # relax exactly onto x_A)
    topo.compute_rhs()
    fac_term = np.asarray(topo.vecM * (ocean.get_state() - x_A))
    np.testing.assert_allclose(fac_term, 0.0, atol=1e-14)

    tpars = dict(CONT_PARS)
    tpars["continuation parameter"] = "Delta"
    tpars["destination 0"] = 1.0
    tpars["initial step size"] = 0.2
    tpars["maximum step size"] = 0.5
    tpars["maximum number of steps"] = 60    # bound the runtime
    cont = Continuation(topo, tpars)
    res = cont.run()
    assert res.status == 0
    assert abs(topo.delta - 1.0) < 1e-6

    # at delta=1 the homotopy RHS is exactly F_B; Newton has converged
    topo.set_par("Delta", 1.0)
    ocean.compute_rhs()
    fB = np.linalg.norm(np.asarray(ocean.get_rhs()))
    assert fB < 1e-6

    # the seamount actually entered the physics: the land cell's
    # velocities are driven to zero by the Dirichlet land rows
    x = np.asarray(ocean.get_state())
    assert np.all(np.abs(x[:2, 0, m // 2, n // 2]) < 1e-10)
