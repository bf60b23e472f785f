"""Subtitle subsystem: text parsers (SRT/SSA/WebVTT) + rasterizer for
burn-in + PGS bitmap decode.

Reference: libhb/decsrtsub.c (SRT parse: charset, timing, overlap),
decssasub.c (SSA/ASS), rendersub.c (burn-in consumer), decavsub.c:739
(PGS personality — see pgs.py).
"""
from .srt import (parse_srt, parse_ssa, parse_vtt,  # noqa: F401
                  parse_textsub, SubEvent)
