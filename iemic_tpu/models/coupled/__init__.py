from .coupled import CoupledModel  # noqa: F401
