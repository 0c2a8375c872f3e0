from .stencil import (  # noqa: F401
    NP,
    NUN,
    UU, VV, WW, PP, TT, SS,
    OCEAN, LAND, WATER, PERIO,
    offsets,
    apply_stencil,
    stencil_to_dense,
    from_flat,
    to_flat,
)
