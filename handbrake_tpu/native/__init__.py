"""Native (C++) runtime components.

The compute path is JAX/Pallas on TPU; the inherently serial host stages —
entropy coding, NAL packing — are native C++, mirroring how the reference
keeps them in C (encx264.c/bitstream.c/nal_units.c). Python reference
implementations remain the source of truth; the native paths are bit-exact
against them (tests/test_native.py).
"""
from .build import get_lib  # noqa: F401
