"""MPEG-TS demux (stream.c TS path / demuxmpeg.c analog).

The test builds a conformant single-program TS around our own H.264 ES
(PAT + PMT with CRC32-MPEG, PES with 33-bit PTS, adaptation-field
stuffing), then scans and transcodes it.
"""
import numpy as np
import pytest

from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder

W, H, N = 64, 48, 8


def crc32_mpeg(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 \
                else (crc << 1)
            crc &= 0xFFFFFFFF
    return crc


def psi_packet(pid: int, table: bytes, cc: int) -> bytes:
    sec = table + crc32_mpeg(table).to_bytes(4, "big")
    payload = b"\x00" + sec                       # pointer_field
    hdr = bytes([0x47, 0x40 | (pid >> 8), pid & 0xFF, 0x10 | cc])
    return hdr + payload + b"\xff" * (184 - len(payload))


def pat(cc=0):
    body = (b"\x00"            # table_id
            + (0xB000 | (5 + 4 + 4)).to_bytes(2, "big")
            + b"\x00\x01"      # tsid
            + b"\xc1\x00\x00"  # version/current, section 0/0
            + b"\x00\x01" + bytes([0xE0 | 0x00, 0x20]))  # prog 1 → PMT 0x20
    return psi_packet(0, body, cc)


def pmt(cc=0):
    es = bytes([0x1B, 0xE1, 0x00, 0xF0, 0x00])    # H.264 on PID 0x100
    body = (b"\x02"
            + (0xB000 | (9 + 4 + len(es) + 4)).to_bytes(2, "big")
            + b"\x00\x01\xc1\x00\x00"
            + bytes([0xE1, 0x00])                  # PCR PID
            + b"\xf0\x00"                          # program info len
            + es)
    return psi_packet(0x20, body, cc)


def pes(stream_id: int, pts: int, data: bytes) -> bytes:
    p = bytes([(pts >> 29) & 0x0E | 0x21,
               (pts >> 22) & 0xFF, ((pts >> 14) & 0xFE) | 1,
               (pts >> 7) & 0xFF, ((pts << 1) & 0xFE) | 1])
    return (b"\x00\x00\x01" + bytes([stream_id]) + b"\x00\x00"
            + b"\x80\x80\x05" + p + data)


def ts_packets(pid: int, pes_data: bytes, cc0: int) -> bytes:
    out = b""
    pos = 0
    cc = cc0
    first = True
    while pos < len(pes_data):
        chunk = pes_data[pos:pos + 184]
        pos += len(chunk)
        flags = (0x40 if first else 0x00) | (pid >> 8)
        if len(chunk) == 184:
            hdr = bytes([0x47, flags, pid & 0xFF, 0x10 | (cc & 0xF)])
            out += hdr + chunk
        else:
            af_len = 183 - len(chunk)   # bytes following the length field
            hdr = bytes([0x47, flags, pid & 0xFF, 0x30 | (cc & 0xF)])
            af = bytes([af_len]) + (bytes([0]) + b"\xff" * (af_len - 1)
                                    if af_len >= 1 else b"")
            out += hdr + af + chunk
        cc += 1
        first = False
    return out


@pytest.fixture(scope="module")
def ts_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ts") / "in.ts")
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=4))
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    u = np.full((H // 2, W // 2), 110, np.uint8)
    v = np.full((H // 2, W // 2), 60, np.uint8)
    out = pat() + pmt()
    cc = 0
    for i in range(N):
        au = enc.encode_frame(np.roll(base, i, axis=1), u, v)
        pts = 90000 + i * 3003
        out += ts_packets(0x100, pes(0xE0, pts, au), cc)
        cc += 200  # continuity counters are per-PID; parser ignores
    with open(path, "wb") as f:
        f.write(out)
    return path


def test_probe_opens_ts(ts_file):
    from handbrake_tpu.sources.probe import open_source
    src = open_source(ts_file)
    assert type(src).__name__ == "TSDemuxer"
    assert src.tracks[0].kind == "video"
    assert src.tracks[0].codec == "h264"
    assert (src.tracks[0].width, src.tracks[0].height) == (W, H)
    src.close()


def test_ts_packets_pts(ts_file):
    from handbrake_tpu.sources.ts import TSDemuxer
    d = TSDemuxer(ts_file)
    pkts = list(d.packets())
    assert len(pkts) == N
    assert [b.pts for _, b in pkts] == [90000 + i * 3003 for i in range(N)]
    # ES reassembly: every packet decodes through our own decoder
    from handbrake_tpu.codecs.h264.decoder import H264Decoder
    dec = H264Decoder()
    frames = dec.decode(b"".join(b.data for _, b in pkts))
    assert len(frames) == N
    d.close()


def test_ts_transcode(ts_file, tmp_path, monkeypatch):
    monkeypatch.setenv("HB_TPU_DISABLE_DEVICE", "1")
    from handbrake_tpu import work
    from handbrake_tpu.job.schema import Job
    from handbrake_tpu.sources.mp4 import MP4Demuxer
    out = str(tmp_path / "o.mp4")
    stats = work.do_job(Job(path=ts_file, file=out, mux="mp4", quality=28.0))
    assert stats["frames_out"] == N
    d = MP4Demuxer(out)
    assert d.tracks[0].codec == "h264"
    assert d.n_samples(0) == N


def test_m2ts_192_byte_packets(ts_file, tmp_path):
    from handbrake_tpu.sources.ts import TSDemuxer
    data = open(ts_file, "rb").read()
    m2 = b"".join(b"\x00\x00\x00\x00" + data[i:i + 188]
                  for i in range(0, len(data), 188))
    p = str(tmp_path / "in.m2ts")
    open(p, "wb").write(m2)
    d = TSDemuxer(p)
    assert d.psz == 192
    assert len(list(d.packets())) == N


def test_m2ts_corrupt_sync_resyncs(ts_file, tmp_path):
    """Regression: a corrupted sync byte mid-file must resync with forward
    progress (ADVICE r2: the old resync seeked back to the same spot
    forever on 192-byte M2TS)."""
    from handbrake_tpu.sources.ts import TSDemuxer
    data = open(ts_file, "rb").read()
    m2 = bytearray(b"".join(b"\x00\x00\x00\x00" + data[i:i + 188]
                            for i in range(0, len(data), 188)))
    # corrupt the sync byte of the 6th packet (after PSI)
    m2[5 * 192 + 4] = 0x00
    p = str(tmp_path / "bad.m2ts")
    open(p, "wb").write(bytes(m2))
    d = TSDemuxer(p)          # must not hang in _scan
    pkts = list(d.packets())  # one PES chunk lost at most
    assert len(pkts) >= N - 2
    d.close()


def test_pes_header_split_across_packets(tmp_path):
    """A PES header whose PTS field is split across two TS packets by a
    large adaptation field must still parse (ADVICE r2 bounds issue)."""
    from handbrake_tpu.sources.ts import TSDemuxer
    pid = 0x100
    pes_data = pes(0xE0, 123456, b"\xAB" * 100)
    # first TS packet: adaptation field leaves room for only 7 PES bytes
    room = 7
    af_len = 183 - room
    hdr = bytes([0x47, 0x40 | (pid >> 8), pid & 0xFF, 0x30 | 0])
    af = bytes([af_len, 0]) + b"\xff" * (af_len - 1)
    p1 = hdr + af + pes_data[:room]
    rest = pes_data[room:]
    hdr2 = bytes([0x47, pid >> 8, pid & 0xFF, 0x10 | 1])
    p2 = hdr2 + rest + b"\xff" * 0
    pad = 184 - len(rest)
    if pad:
        hdr2 = bytes([0x47, pid >> 8, pid & 0xFF, 0x30 | 1])
        p2 = hdr2 + bytes([pad - 1, 0]) + b"\xff" * (pad - 2) + rest
    stream = pat() + pmt() + p1 + p2
    path = str(tmp_path / "split.ts")
    open(path, "wb").write(stream)
    d = TSDemuxer(path)
    pkts = list(d.packets())
    assert len(pkts) == 1
    assert pkts[0][1].pts == 123456
    assert pkts[0][1].data == b"\xAB" * 100
    d.close()


def _build_ts_bytes():
    import numpy as np
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    enc = H264Encoder(EncoderConfig(width=64, height=48, qp=18, gop=4,
                                    backend="host"))
    rng = np.random.default_rng(0)
    out = pat(0) + pmt(0)
    cc = 0
    for i in range(12):
        au = enc.encode_frame(
            rng.integers(0, 255, (48, 64), np.uint8),
            np.full((24, 32), 110, np.uint8),
            np.full((24, 32), 60, np.uint8))
        p = pes(0xE0, 3003 * i, au)
        chunk = ts_packets(0x100, p, cc)
        cc = (cc + len(chunk) // 188) & 0xF
        out += chunk
    return out


def _corrupt(data, pos, val=0x00):
    b = bytearray(data)
    b[pos] = val
    return bytes(b)


def test_ts_resync_after_corrupt_sync_byte(tmp_path):
    """A corrupted sync byte mid-stream must resync, not stall or die
    (broadcast-capture robustness; the round-2 advisor's stall case)."""
    import numpy as np
    from handbrake_tpu.sources.ts import TSDemuxer

    path = str(tmp_path / "c.ts")
    open(path, "wb").write(_build_ts_bytes())
    data = open(path, "rb").read()
    # corrupt a sync byte half way in (past the detection window)
    pkt = max(8, len(data) // 188 // 2) * 188
    open(path, "wb").write(_corrupt(data, pkt, 0x11))
    d = TSDemuxer(str(path))
    n = sum(1 for _ in d.packets())
    assert n > 0
    d.close()


def test_ts_continuity_counter_gap(tmp_path):
    """Dropping a mid-PES packet (CC gap) must not derail the demux: the
    stream keeps yielding PES packets afterwards."""
    from handbrake_tpu.sources.ts import TSDemuxer

    path = str(tmp_path / "g.ts")
    open(path, "wb").write(_build_ts_bytes())
    data = open(path, "rb").read()
    pkts = [data[i:i + 188] for i in range(0, len(data) - 187, 188)]
    # drop a non-PUSI payload packet (simulates packet loss)
    for i, p in enumerate(pkts[20:], start=20):
        pid = ((p[1] & 0x1F) << 8) | p[2]
        pusi = bool(p[1] & 0x40)
        if pid > 0x20 and not pusi:
            del pkts[i]
            break
    open(path, "wb").write(b"".join(pkts))
    d = TSDemuxer(str(path))
    n = sum(1 for _ in d.packets())
    assert n > 0
    d.close()
