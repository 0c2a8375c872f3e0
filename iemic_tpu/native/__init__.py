"""Native (C++) runtime components.

The analog of the reference's native layer (Fortran MRILU ``mrilu/``
and its C++ Ifpack bridge ``src/mrilucpp/``): host-side sparse work
that XLA cannot express, loaded via ctypes.
"""
