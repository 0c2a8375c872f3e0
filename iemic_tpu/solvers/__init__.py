from .fgmres import fgmres  # noqa: F401
