"""Muxers: host-native MP4 (isobmff) and MKV (EBML) writers + interleave
core (reference: muxcommon.c, muxavformat.c, extradata.c, nal_units.c)."""
from .common import Muxer  # noqa: F401
from .mp4 import MP4Writer  # noqa: F401
from .mkv import MKVWriter  # noqa: F401
from . import nal  # noqa: F401
