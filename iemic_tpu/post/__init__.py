"""Post-processing & analysis toolbox.

Python replacement of the reference's MATLAB toolbox (reference
matlab/: plot_ocean.m, plot_overturning.m, plot_atmos.m,
plot_seaice.m, compute_transports.m, readhdf5.m, create_mask.m,
edit_mask.m) and of scripts/plotbif.sh.
"""

from .plotting import (plot_ocean, plot_overturning, plot_barotropic,
                       plot_atmosphere, plot_seaice, plot_bif)
from .transports import compute_transports
from .masks import (create_mask, flood_fill, smooth_mask,
                    mask_from_etopo, merge_masks, write_mask_file,
                    edit_mask, MaskEditor)
from .readers import (read_state, read_eigen, read_cdata, read_tdata,
                      read_profile, state_to_grid)

__all__ = [
    "plot_ocean", "plot_overturning", "plot_barotropic",
    "plot_atmosphere", "plot_seaice", "plot_bif",
    "compute_transports",
    "create_mask", "flood_fill", "smooth_mask", "mask_from_etopo",
    "merge_masks", "write_mask_file", "edit_mask", "MaskEditor",
    "read_state", "read_eigen", "read_cdata", "read_tdata",
    "read_profile", "state_to_grid",
]
