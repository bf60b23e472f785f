"""Subtitle subsystem: parsers (SRT) + text rasterizer for burn-in.

Reference: libhb/decsrtsub.c (SRT parse: charset, timing, overlap),
rendersub.c (burn-in consumer). Bitmap formats (PGS/VOBSUB) follow.
"""
from .srt import parse_srt, SubEvent  # noqa: F401
