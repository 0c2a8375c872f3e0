"""Lyapunov (covariance) solves — RAILS-equivalent low-rank solver.

TPU-native replacement of the reference's external RAILS dependency and
``LyapunovModel`` decorator (reference src/lyapunov/LyapunovModel.H:22-110).
"""

from .rails import rails, RailsResult
from .model import LyapunovModel

__all__ = ["rails", "RailsResult", "LyapunovModel"]
