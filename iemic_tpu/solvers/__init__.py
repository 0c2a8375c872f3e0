from .fgmres import fgmres, fgmres_host  # noqa: F401
from .idr import idr_host, IDRResult  # noqa: F401
