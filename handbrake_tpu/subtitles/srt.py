"""SRT (SubRip) parser — decsrtsub.c semantics.

Handles: UTF-8/UTF-16 BOMs with Latin-1 fallback (the reference iconv's
from a user codeset, decsrtsub.c:~60), index lines (optional/ignored),
`HH:MM:SS,mmm --> HH:MM:SS,mmm` timing (dot or comma millis, loose
whitespace), multi-line cues, markup tags stripped for text output,
overlapping cues preserved (the renderer/muxer decides layering), and a
fixed pts offset (job SubtitleJobTrack.offset, ms).
"""
from __future__ import annotations

import dataclasses
import re
from typing import List, Optional

from ..core.buffer import CLOCK

_TIME = re.compile(
    r"(\d+):(\d+):(\d+)[,.](\d+)\s*-->\s*(\d+):(\d+):(\d+)[,.](\d+)")
_TAG = re.compile(r"<[^>]{1,64}>|\{\\[^}]{0,64}\}")


@dataclasses.dataclass
class SubEvent:
    pts: int                 # 90 kHz
    stop: int                # 90 kHz
    text: str                # plain text, markup stripped, \n line breaks

    @property
    def duration(self) -> int:
        return self.stop - self.pts


def _decode_bytes(data: bytes, codeset: Optional[str] = None) -> str:
    if data.startswith(b"\xef\xbb\xbf"):
        return data[3:].decode("utf-8", "replace")
    if data.startswith(b"\xff\xfe"):
        return data.decode("utf-16-le", "replace")
    if data.startswith(b"\xfe\xff"):
        return data.decode("utf-16-be", "replace")
    for cs in ([codeset] if codeset else []) + ["utf-8", "latin-1"]:
        try:
            return data.decode(cs)
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("utf-8", "replace")


def _ticks(h, m, s, frac) -> int:
    ms = int(frac.ljust(3, "0")[:3])
    return ((int(h) * 3600 + int(m) * 60 + int(s)) * 1000 + ms) * CLOCK // 1000


def parse_srt(data: bytes, codeset: Optional[str] = None,
              offset_ms: int = 0) -> List[SubEvent]:
    """Parse an SRT file into pts-ordered SubEvents (90 kHz)."""
    text = _decode_bytes(data, codeset).replace("\r\n", "\n").replace(
        "\r", "\n")
    off = offset_ms * CLOCK // 1000
    events: List[SubEvent] = []
    lines = text.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        m = _TIME.search(line)
        if m is None:
            # index line (or garbage) — timing expected on the next line
            if i < len(lines):
                m = _TIME.search(lines[i])
                if m is None:
                    continue
                i += 1
            else:
                break
        start = _ticks(m.group(1), m.group(2), m.group(3), m.group(4)) + off
        stop = _ticks(m.group(5), m.group(6), m.group(7), m.group(8)) + off
        body = []
        while i < len(lines) and lines[i].strip() != "":
            body.append(_TAG.sub("", lines[i]).rstrip())
            i += 1
        txt = "\n".join(body).strip()
        if txt and stop > start >= 0:
            events.append(SubEvent(pts=start, stop=stop, text=txt))
    events.sort(key=lambda e: e.pts)
    return events
