"""GOP-parallel transcode across the mesh gop axis (SURVEY §2.8):
keyframe-aligned chunking, SPMD analysis, rank-0 bitstream gather, mux,
and bit-exactness against the serial per-chunk encode. Also the two-pass
rate-stats psum exchange."""
import numpy as np
import pytest

from handbrake_tpu.codecs.h264.decoder import H264Decoder
from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
from handbrake_tpu.parallel.gop import (encode_gop_parallel,
                                        exchange_rc_stats, split_gops)
from handbrake_tpu.parallel.mesh import make_mesh

W, H, N = 64, 48, 8


def _frames(n):
    base = (np.add.outer(np.arange(H), np.arange(W)) * 3 % 256).astype(
        np.uint8)
    return [(np.roll(base, i, axis=1),
             np.full((H // 2, W // 2), 110 + i, np.uint8),
             np.full((H // 2, W // 2), 60, np.uint8)) for i in range(n)]


def test_split_gops():
    assert split_gops(8, 2) == [(0, 4), (4, 4)]
    assert split_gops(7, 3) == [(0, 3), (3, 2), (5, 2)]


def test_gop_parallel_bit_exact_and_muxes(tmp_path):
    frames = _frames(N)
    mesh = make_mesh(2, tile=1)
    assert mesh.shape["gop"] == 2
    streams, full, frame_aus = encode_gop_parallel(frames, W, H, 28, mesh)
    assert len(streams) == 2

    # serial reference: same chunking, one encoder per chunk
    ref = b""
    for (s, ln) in split_gops(N, 2):
        enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28, gop=ln,
                                        backend="device"))
        for i in range(s, s + ln):
            ref += enc.encode_frame(*frames[i])
    assert full == ref, "gop-parallel encode must be bit-exact vs serial"

    # decode the gathered stream: every frame present and faithful
    dec = H264Decoder().decode(full)
    assert len(dec) == N
    for i, (dy, du, dv) in enumerate(dec):
        err = np.abs(dy.astype(int) - frames[i][0].astype(int)).mean()
        assert err < 6.0, f"frame {i} err {err}"

    # mux the gathered segments (rank-0 muxcommon role)
    from handbrake_tpu.mux.mp4 import MP4Writer
    out = str(tmp_path / "gop.mp4")
    w = MP4Writer(out)
    t = w.add_video_track(codec="h264", width=W, height=H)
    dec2 = H264Decoder()
    offset = 0
    for g, seg in enumerate(streams):
        frames_g = dec2.decode(seg)
        # one sample per frame; IDR at each segment start
        from handbrake_tpu.codecs.h264.bits import split_annexb
        aus = []
        cur = b""
        for nal in split_annexb(seg):
            cur += b"\x00\x00\x00\x01" + nal
            if (nal[0] & 0x1F) in (1, 5):
                aus.append(cur)
                cur = b""
        for k, au in enumerate(aus):
            w.write_sample(t, au, duration=3003, sync=(k == 0), annexb=True)
        offset += len(frames_g)
    w.finalize()
    from handbrake_tpu.sources.mp4 import MP4Demuxer
    d = MP4Demuxer(out)
    assert d.n_samples(0) == N


def test_gop_parallel_uneven_chunks():
    frames = _frames(7)
    mesh = make_mesh(2, tile=1)
    streams, full, _ = encode_gop_parallel(frames, W, H, 30, mesh)
    dec = H264Decoder().decode(full)
    assert len(dec) == 7


def test_rc_stats_exchange():
    mesh = make_mesh(4, tile=1)
    alloc = exchange_rc_stats(mesh, np.array([1.0, 2.0, 3.0, 2.0]), 8000.0)
    np.testing.assert_allclose(alloc, [1000.0, 2000.0, 3000.0, 2000.0],
                               rtol=1e-5)


def test_two_pass_hits_target_bitrate():
    """Two-pass GOP-parallel encode lands within ±5% of the bitrate
    target (hb_interjob_t stats handoff + psum allocation)."""
    import numpy as np
    from handbrake_tpu.parallel.gop import encode_gop_parallel_2pass
    from handbrake_tpu.parallel.mesh import make_mesh
    from handbrake_tpu.codecs.h264.decoder import H264Decoder

    mesh = make_mesh(4, tile=1)
    W, H, N = 64, 48, 16
    rng = np.random.default_rng(3)
    base = (np.add.outer(np.arange(H), np.arange(W)) * 5 % 256).astype(
        np.uint8)
    noise = rng.integers(0, 24, (H, W), np.uint8)
    frames = [(np.clip(base.astype(np.int32)
                       + np.roll(noise, i, 1), 0, 255).astype(np.uint8),
               np.full((H // 2, W // 2), 100 + i, np.uint8),
               np.full((H // 2, W // 2), 140, np.uint8))
              for i in range(N)]
    target = 260.0
    streams, full, stats = encode_gop_parallel_2pass(
        frames, W, H, target, mesh, fps=(30, 1))
    assert abs(stats["actual_kbps"] - target) <= 0.05 * target, stats
    # still decodable and frame-complete
    dec = H264Decoder().decode(full)
    assert len(dec) == N


def test_per_gop_qp_varies_without_recompile():
    """Traced per-gop qp: different gops encode at different qps in one
    sharded call, bit-identical to serial per-chunk encoding."""
    import numpy as np
    from handbrake_tpu.codecs.h264.encoder import EncoderConfig, H264Encoder
    from handbrake_tpu.parallel.gop import encode_gop_parallel, split_gops
    from handbrake_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, tile=1)
    W, H, N = 64, 48, 6
    rng = np.random.default_rng(5)
    frames = [(rng.integers(0, 256, (H, W), np.uint8),
               np.full((H // 2, W // 2), 90, np.uint8),
               np.full((H // 2, W // 2), 150, np.uint8))
              for _ in range(N)]
    qps = [26, 34]
    streams, _, _ = encode_gop_parallel(frames, W, H, qps, mesh, fps=(30, 1))
    for g, (s, ln) in enumerate(split_gops(N, 2)):
        enc = H264Encoder(EncoderConfig(width=W, height=H, qp=qps[g],
                                        gop=ln, fps=(30, 1),
                                        backend="device"))
        want = b"".join(enc.encode_frame(*frames[s + i], qp=qps[g])
                        for i in range(ln))
        assert streams[g] == want, f"gop {g} differs"


def test_tile_parallel_nlmeans_job_bit_exact(tmp_path):
    """Job.TileParallel runs NLMeans tile-sharded across the mesh INSIDE
    a normal do_job (VERDICT r4 #8 — 'a tile-sharded JOB, not just a
    kernel'): output video samples are byte-identical to the unsharded
    job."""
    import numpy as np
    from handbrake_tpu.job.schema import Job, FilterSpec, FILTER_NLMEANS
    from handbrake_tpu import work
    from handbrake_tpu.sources.mp4 import MP4Demuxer

    W, H, N = 96, 80, 5
    src = str(tmp_path / "in.y4m")
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (H + 16, W + 16), np.uint8)
    with open(src, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode())
        for i in range(N):
            f.write(b"FRAME\n")
            f.write(np.ascontiguousarray(base[i:i + H, 2 * i:2 * i + W])
                    .tobytes())
            f.write(bytes([120]) * (W // 2 * H // 2))
            f.write(bytes([60]) * (W // 2 * H // 2))

    outs = []
    for tp in (0, 4):
        out = str(tmp_path / f"tp{tp}.mp4")
        j = Job(path=src, file=out, mux="mp4", vcodec="h264",
                quality=30.0)
        j.filters = [FilterSpec(id=FILTER_NLMEANS,
                                settings={"y_strength": 6.0,
                                          "y_range": 3,
                                          "y_patch_size": 7})]
        j.tile_parallel = tp
        stats = work.do_job(j)
        assert not stats.get("error"), stats
        assert stats["frames_out"] == N
        d = MP4Demuxer(out)
        outs.append([bytes(d.read_sample(0, k).data)
                     for k in range(d.n_samples(0))])
        d.close()
    assert outs[0] == outs[1]
