"""Work orchestrator — job → finished file (reference: libhb/work.c
work_func/do_job, SURVEY.md §3.2).

Pipeline assembly per pass:
  source demux → video decode → sync → filter chain → video encode ┐
               → audio decode → sync → audio encode ──────────────┼→ mux
The stage graph here is a deterministic streaming loop (stages are pure
(buffers in) → (buffers out) objects — the hb_work_object_t contract);
the threaded substrate in core/pipeline.py is used by the Handle layer
for background execution. Device batching happens inside the encoder
and filter kernels, which is where the TPU parallelism lives.
"""
from __future__ import annotations

import os
from fractions import Fraction
from typing import Optional

import numpy as np

from .codecs.registry import create_video_decoder
from .core.buffer import Buffer, CLOCK, FrameType
from .core.state import Progress
from .filters.base import FilterInit
from .filters.graph import FilterGraph
from .core.buffer import Geometry, PIX_FMTS
from .job.schema import Job
from .sources.probe import open_source
from .sync.sync import SyncCore
from .utils.logging import log


class WorkError(Exception):
    pass


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------
def quality_to_qp(quality: float) -> int:
    """CRF-style quality → QP for our encoder (x264 RF≈QP at crf zone)."""
    return int(round(max(0, min(51, quality))))


def create_video_encoder(job: Job, width: int, height: int,
                         vrate: Fraction, interjob: Optional[dict] = None):
    qp = quality_to_qp(job.quality if job.quality is not None else 26)
    gop = max(1, int(round(float(vrate) * 10)))  # 10 s keyint, x264 dflt
    opts0 = dict(kv.split("=", 1) for kv in
                 (job.encoder_options or "").split(":") if "=" in kv)
    if "keyint" in opts0:
        gop = max(1, int(opts0["keyint"]))
    backend = "device" if _device_ok() else "host"
    if job.vcodec in ("h264_tpu", "x264", "h264") \
            and int(getattr(job, "bframes", 0) or 0) > 0:
        # IB..BP GOP structure via the host B walker (encoder_b.py —
        # x264-medium's bframes=3/ref=3 shape; CAVLC until the native
        # CABAC stage grows B-slice syntax)
        from .codecs.h264.encoder import EncoderConfig
        from .codecs.h264.encoder_b import H264BEncoder
        cfg = EncoderConfig(
            width=width, height=height, qp=qp, gop=gop,
            fps=(vrate.numerator, vrate.denominator), backend="host")
        return _BFrameEncoderAdapter(
            H264BEncoder(cfg, bframes=int(job.bframes),
                         refs=min(3, int(job.bframes) + 1)))
    if job.vcodec in ("h264_tpu", "x264", "h264"):
        from .codecs.h264.encoder import EncoderConfig, H264Encoder
        # Entropy coder selection (encx264.c profile plumbing): main/high
        # profile or a cabac=1 option turns on CABAC.  TODO(flip to
        # default-on like x264 once the universal decoder replaces the
        # CAVLC-subset read path).
        opts = dict(kv.split("=", 1) for kv in
                    (job.encoder_options or "").split(":") if "=" in kv)
        cabac = (job.encoder_profile in ("main", "high")
                 or opts.get("cabac", "0") == "1")
        # x264 defaults: in-loop deblocking on (no-deblock opts out);
        # High profile adds the 8x8 transform — all run in the device path
        deblock = opts.get("deblock", "1") != "0"
        t8 = (job.encoder_profile == "high"
              or opts.get("8x8dct", "0") == "1")
        cfg = EncoderConfig(
            width=width, height=height, qp=qp, gop=gop, cabac=cabac,
            deblock=deblock, transform8x8=t8,
            fps=(vrate.numerator, vrate.denominator), backend=backend)
        return H264Encoder(cfg)
    if job.vcodec in ("hevc_tpu", "x265", "hevc", "h265"):
        from .codecs.hevc.encoder import EncoderConfig, HEVCEncoder
        bd = 10 if "10" in (job.encoder_profile or "") else 8
        cfg = EncoderConfig(
            width=width, height=height, qp=qp, gop=gop, bit_depth=bd,
            fps=(vrate.numerator, vrate.denominator), backend=backend)
        return HEVCEncoder(cfg)
    if job.vcodec in ("av1_tpu", "svt_av1", "av1"):
        from .codecs.av1.encoder import AV1Encoder, EncoderConfig
        cfg = EncoderConfig(
            width=width, height=height, qp=qp, gop=gop,
            fps=(vrate.numerator, vrate.denominator), backend=backend)
        return AV1Encoder(cfg)
    if job.vcodec in ("mpeg2", "mpeg4", "vp9", "vp8", "ffv1", "prores",
                      "theora"):
        # the classic encoder catalog rides libavcodec, exactly as the
        # reference's encavcodec.c work object does
        from .codecs.avcodec import available
        if not available():
            raise WorkError(f"{job.vcodec}: libavcodec unavailable")
        return _AVVideoEncoderAdapter(job, width, height, vrate, qp)
    raise WorkError(f"unknown video encoder {job.vcodec!r}")


class _AVVideoEncoderAdapter:
    """encavcodec.c work-object analog: the classic codec catalog
    (MPEG-2/4, VP8/9, FFV1, ProRes, Theora) through codecs/avcodec.py.

    Configured zero-delay (no B-frames / no lag) so one frame in is one
    packet out — the encode stage's immediate mode."""

    class _Cfg:
        pass

    def __init__(self, job, width, height, vrate, qp):
        from .codecs.avcodec import AVVideoEncoder
        opts = {}
        name = job.vcodec
        quality = None
        bit_rate = (job.vbitrate or 0) * 1000
        if name in ("vp9", "vp8"):
            opts.update({"lag-in-frames": 0, "cpu-used": 4,
                         "deadline": "good"})
            if job.quality is not None:
                quality = job.quality
                bit_rate = 0
        elif not bit_rate:
            # quality → rough bitrate for the classic MPEG coders
            bpp = max(0.02, 0.7 * 2.0 ** (-(qp - 10) / 6.0))
            bit_rate = int(width * height * float(vrate) * bpp / 8) * 8
        # mkv sources yield ns-precision rates (1e9 denominators); the
        # MPEG coders cap the timebase denominator at 65535
        vr = vrate.limit_denominator(30000)
        self.enc = AVVideoEncoder(
            name, width, height, (vr.numerator, vr.denominator),
            bit_rate=bit_rate, quality=quality, opts=opts)
        self.cfg = self._Cfg()
        self.cfg.qp = qp
        self.cfg.fps = (vrate.numerator, vrate.denominator)
        self.cfg.gop = max(1, int(round(float(vrate) * 10)))
        self.last_frame_was_idr = True
        self.extradata = self.enc.extradata
        self.frame_idx = 0

    def encode_frame(self, y, u, v, qp=None) -> bytes:
        pkts = self.enc.encode(y, u, v)
        if not pkts:
            raise WorkError(
                f"{self.enc!r}: encoder delayed a frame (the catalog "
                f"adapter requires zero-delay configuration)")
        self.last_frame_was_idr = pkts[0][1]
        self.frame_idx += 1
        return b"".join(p for p, _k in pkts)


class _CkptJournal:
    """GOP-boundary checkpoint journal (<dest>.ckpt): length-framed
    pickle records of every muxed sample, committed with an fsynced
    ("gop", frames_done, rc_state) marker at each IDR.  A kill at any
    point leaves a prefix of complete GOPs; resume replays them and
    restarts the pipeline at the boundary (SURVEY §5 — the reference
    has no mid-encode checkpointing at all)."""

    def __init__(self, path, rc, append=False, frames0=0):
        import io
        self.path = path
        self.rc = rc
        self.frames = frames0
        self.f = open(path, "ab" if append else "wb")

    def _write(self, rec):
        import pickle
        blob = pickle.dumps(rec, protocol=4)
        self.f.write(len(blob).to_bytes(4, "big") + blob)

    def video(self, au, pts, dur, idr, side_data):
        if idr and self.frames > 0:
            self.commit()
        self._write(("v", au, pts, dur, idr,
                     {k: v for k, v in (side_data or {}).items()
                      if isinstance(v, (bytes, int, float, str))}))
        self.frames += 1

    def audio(self, sid, data, pts, dur, stop):
        self._write(("a", sid, data, pts, dur, stop))

    def subtitle(self, k, data, pts, dur, stop):
        self._write(("s", k, data, pts, dur, stop))

    def commit(self):
        rc_state = {k: v for k, v in self.rc.__dict__.items()
                    if isinstance(v, (int, float, bool, list, tuple))}
        self._write(("gop", self.frames, rc_state))
        self.f.flush()
        os.fsync(self.f.fileno())

    def close(self, complete=False):
        if complete:
            self.commit()
        self.f.close()
        if complete and os.path.exists(self.path):
            os.unlink(self.path)     # job finished: journal obsolete

    @staticmethod
    def load(path):
        """→ (records up to last complete gop, frames_done, rc_state)."""
        import pickle
        recs = []
        out = []
        n_done = 0
        rc_state = None
        gops_done = 0
        with open(path, "rb") as f:
            data = f.read()
        i = 0
        while i + 4 <= len(data):
            ln = int.from_bytes(data[i:i + 4], "big")
            i += 4
            if i + ln > len(data):
                break
            try:
                rec = pickle.loads(data[i:i + ln])
            except Exception:
                break
            i += ln
            if rec[0] == "gop":
                out.extend(recs)
                recs = []
                n_done = rec[1]
                gops_done += 1
                rc_state = dict(rec[2])
                rc_state["_gops_done"] = gops_done
            else:
                recs.append(rec)
        return out, n_done, rc_state


class _BFrameEncoderAdapter:
    """Wraps H264BEncoder for the encode stage: display frames in,
    (display_idx, access_unit) pairs out in DECODE order — the caller
    owns the DTS delay queue (encx264.c:30 role)."""

    def __init__(self, benc):
        self.benc = benc
        self.cfg = benc.cfg
        self.frame_idx = 0
        self.last_frame_was_idr = True

    def push_display_frame(self, y, u, v):
        self.frame_idx += 1
        return self.benc.push_frame(y, u, v)

    def flush(self):
        return self.benc.flush()


def _device_ok() -> bool:
    """Use the JAX device path when available (single real chip or cpu)."""
    return os.environ.get("HB_TPU_DISABLE_DEVICE", "0") != "1"


# ---------------------------------------------------------------------------
# range selection (Source.Range — hb_json.c job schema)
# ---------------------------------------------------------------------------
def resolve_range(job: Job, src, vrate: Fraction) -> tuple:
    """(pts_start, pts_stop) in 90 kHz ticks, either may be None."""
    r = job.range
    if r.type == "time":          # seconds
        start = r.start * CLOCK
        stop = r.end * CLOCK if r.end else None
        return (start or None), stop
    if r.type == "frame":
        tick = CLOCK * vrate.denominator / vrate.numerator
        start = int((r.start - 1) * tick) if r.start > 1 else None
        # half-frame tolerance: containers with ms timestamp precision
        # (mkv) place frame pts slightly under the exact boundary
        stop = int(r.end * tick - tick / 2) if r.end else None
        return start, stop
    if r.type == "chapter":
        chapters = getattr(src, "chapters", [])
        if not chapters or (r.start <= 1 and not r.end):
            return None, None
        starts = [c[0] for c in chapters]
        dur = getattr(src, "duration", 0)
        start = starts[r.start - 1] if 0 < r.start <= len(starts) else None
        stop = starts[r.end] if 0 < r.end < len(starts) else \
            (dur or None) if r.end else None
        return (start or None), stop
    return None, None


# ---------------------------------------------------------------------------
# do_job
# ---------------------------------------------------------------------------
def do_job(job: Job, state=None, die=None, pause=None) -> dict:
    """Run one pass of a job. Returns stats dict (frames, bytes, ...)."""
    from .utils.platform import ensure_backend
    ensure_backend()
    src = open_source(job.path)
    try:
        return _run(job, src, state, die, pause)
    finally:
        src.close()


def _run(job: Job, src, state, die, pause=None) -> dict:
    # ---- identify tracks ----
    video_track = next((i for i, t in enumerate(src.tracks)
                        if t.kind == "video"), None)
    if video_track is None:
        raise WorkError("no video track")
    vti = src.tracks[video_track]
    vrate = Fraction(*vti.frame_rate) if vti.frame_rate \
        else Fraction(30000, 1001)
    audio_sel = []            # (src_track_index, AudioJobTrack)
    audio_srcs = [i for i, t in enumerate(src.tracks) if t.kind == "audio"]
    for a in job.audio:
        if 0 <= a.track < len(audio_srcs):
            audio_sel.append((audio_srcs[a.track], a))

    # ---- decoders ----
    vdec = create_video_decoder(vti.codec, vti.extradata,
                                width=vti.width, height=vti.height)
    adecs = {}
    for si, spec in audio_sel:
        adecs[si] = _make_audio_decoder(src.tracks[si], spec)

    # ---- sync ----
    pts_start, pts_stop = resolve_range(job, src, vrate)
    sync = SyncCore(pts_start=pts_start, pts_stop=pts_stop)
    # video geometry lets sync synthesize black frames for gaps
    # (CreateBlackBuf sync.c:349); frame cadence is tracked per buffer
    v_sync = sync.add_stream(
        "video", width=vti.width, height=vti.height,
        frame_duration=int(90000 / float(vrate)) if vrate else None)
    # PCM geometry lets sync synthesize silence for gaps (CreateSilenceBuf
    # analog); passthrough tracks get no fill (compressed domain)
    a_sync = {}
    for si, _spec in audio_sel:
        ti = src.tracks[si]
        pcm = ti.codec in ("pcm_s16le", "lpcm", "flac", "aac", "ac3",
                           "mp2")
        a_sync[si] = sync.add_stream(
            "audio", sid=si,
            sample_rate=ti.sample_rate if pcm else None,
            channels=max(1, ti.channels))

    # ---- subtitles (SRT import + in-stream bitmap tracks) ----
    sub_sel = []              # (key, SubtitleJobTrack, [SubEvent])
    sdecs = {}                # source track idx -> (key, PgsDecoder)
    sub_srcs = [i for i, t in enumerate(src.tracks)
                if t.kind == "subtitle"]
    cc_sel = None             # (key, Cea608Decoder) — captions ride
                              # the VIDEO stream (deccc608sub.c role)
    for k, sspec in enumerate(job.subtitles):
        if getattr(sspec, "cc", False):
            from .subtitles.cea608 import Cea608Decoder
            cc_sel = (k, Cea608Decoder())
        elif sspec.import_file:
            from .subtitles import parse_textsub
            with open(sspec.import_file, "rb") as f:
                events = parse_textsub(f.read(),
                                       fmt=sspec.import_format,
                                       offset_ms=sspec.offset)
            sub_sel.append((k, sspec, events))
        elif 0 <= sspec.track < len(sub_srcs):
            sti = src.tracks[sub_srcs[sspec.track]]
            if sti.codec == "pgs":
                # PGS bitmap decode (decavsub.c:739 personality)
                from .subtitles.pgs import PgsDecoder
                sdecs[sub_srcs[sspec.track]] = (k, PgsDecoder())
            elif sti.codec == "vobsub":
                # DVD subpicture decode (decavsub VOBSUB personality)
                from .subtitles.vobsub import (VobSubDecoder,
                                               parse_idx_palette)
                pal = parse_idx_palette(sti.extradata or b"")
                sdecs[sub_srcs[sspec.track]] = (k, VobSubDecoder(pal))
            elif sti.codec in ("tx3g", "text", "srt", "subrip", "ass",
                               "ssa"):
                # in-stream text cues (dectx3gsub.c / decssasub.c roles)
                sdecs[sub_srcs[sspec.track]] = (
                    k, _TextCueDecoder(sti.codec))
            else:
                log(f"subtitle codec {sti.codec!r}: no decoder — "
                    "track ignored")
    s_sync = {}
    for k, sspec, events in sub_sel:
        s_sync[k] = sync.add_stream("subtitle", sid=_SUB_SID0 + k)
        for e in events:
            b = Buffer(track_kind="subtitle", pts=e.pts, stop=e.stop,
                       duration=e.duration)
            b.data = e.text.encode("utf-8")
            b.stream_id = _SUB_SID0 + k
            sync.queue(s_sync[k], b)
        sync.set_eof(s_sync[k])
    for trk, (k, _dec) in sdecs.items():
        s_sync[k] = sync.add_stream("subtitle", sid=_SUB_SID0 + k)
    if cc_sel is not None:
        s_sync[cc_sel[0]] = sync.add_stream(
            "subtitle", sid=_SUB_SID0 + cc_sel[0])
    sub_specs = {k: sspec for k, sspec, _ in sub_sel}
    sub_specs.update({k: job.subtitles[k] for _t, (k, _d) in
                      sdecs.items()})
    if cc_sel is not None:
        sub_specs[cc_sel[0]] = job.subtitles[cc_sel[0]]

    # ---- filters ----
    fi = FilterInit(geometry=Geometry(
        vti.width, vti.height, vti.par_num, vti.par_den),
        pix_fmt=PIX_FMTS.get("yuv420p"), vrate=vrate)
    filter_list = [{"ID": f.id, "Settings": f.settings}
                   for f in job.filters]
    if job.anamorphic_mode is not None:
        # resolve the geometry request (hb_set_anamorphic_size2) against
        # the source + requested crop, overriding the crop/scale target
        from fractions import Fraction as _F

        from .job import schema as _S
        from .job.geometry import GeometrySettings, set_anamorphic_size2
        cs = next((f for f in filter_list
                   if f["ID"] == _S.FILTER_CROP_SCALE), None)
        st = dict(cs["Settings"]) if cs else {}
        crop = (st.get("crop-top", 0), st.get("crop-bottom", 0),
                st.get("crop-left", 0), st.get("crop-right", 0))
        gw, gh, gpar, _dw = set_anamorphic_size2(
            vti.width, vti.height,
            _F(vti.par_num or 1, vti.par_den or 1),
            GeometrySettings(mode=job.anamorphic_mode,
                             width=st.get("width", 0),
                             height=st.get("height", 0),
                             max_width=job.max_width,
                             max_height=job.max_height,
                             modulus=job.modulus,
                             keep_display_aspect=job.keep_display_aspect,
                             par_num=job.par_num, par_den=job.par_den,
                             crop=crop))
        st.update({"width": gw, "height": gh})
        if cs is None:
            filter_list.append({"ID": _S.FILTER_CROP_SCALE,
                                "Settings": st})
        else:
            cs["Settings"] = st
        job.par_num, job.par_den = gpar.numerator, gpar.denominator
        fi.geometry = Geometry(vti.width, vti.height,
                               gpar.numerator, gpar.denominator)
    if any(s.burn for s in sub_specs.values()):
        # auto-insert the burn-in filter (work.c subtitle sanitize analog)
        from .job import schema as S
        if not any(f["ID"] == S.FILTER_RENDER_SUB for f in filter_list):
            filter_list.append({"ID": S.FILTER_RENDER_SUB, "Settings": {}})
    tp = int(getattr(job, "tile_parallel", 0) or 0)
    if tp > 1:
        # tile-shard the expensive spatial filters across the device
        # mesh (SURVEY §2.8.2, the taskset slice-pool analog): each
        # filter instance decides per plane whether the halo-exchange
        # kernel applies (parallel/mesh.py), bit-exact vs unsharded
        from .job import schema as _SF
        for f in filter_list:
            if f["ID"] in (_SF.FILTER_NLMEANS,):
                f.setdefault("Settings", {})["tile_parallel"] = tp
    graph = FilterGraph(filter_list, fi)
    out_fi = graph.fi_out
    out_w, out_h = out_fi.geometry.width, out_fi.geometry.height
    out_vrate = out_fi.vrate

    # ---- encoders ----
    venc = create_video_encoder(job, out_w, out_h, out_vrate, job.interjob)
    from .codecs.ratecontrol import make_rate_controller
    rc = make_rate_controller(job, out_w, out_h, float(out_vrate))
    aencs = {}
    for si, spec in audio_sel:
        aencs[si] = _make_audio_encoder(spec, src.tracks[si])

    # ---- checkpoint/resume (SURVEY §5, our improvement): resume loads
    # the journal, restores RC state and restarts the pipeline at the
    # last complete GOP boundary (frame range) ----
    ckpt = None
    replay = []
    n_done = 0
    want_ckpt = bool(getattr(job, "checkpoint", False)
                     or getattr(job, "resume", False))
    if want_ckpt and job.pass_id != 1:
        ckpt_path = (job.file or "out") + ".ckpt"
        if getattr(job, "resume", False) and os.path.exists(ckpt_path):
            replay, n_done, rc_state = _CkptJournal.load(ckpt_path)
            if n_done > 0:
                if rc_state is not None:
                    gops_done = rc_state.pop("_gops_done", 0)
                    rc.__dict__.update(rc_state)
                    # syntax continuity for byte-identical tails: the
                    # resumed encoder's idr_pic_id keeps counting
                    if hasattr(venc, "idr_pic_id"):
                        venc.idr_pic_id = gops_done % 16
                job.range.type = "frame"
                job.range.start = n_done + 1
                job.range.end = 0
                pts_start, pts_stop = resolve_range(job, src, vrate)
                sync.pts_start = pts_start
                sync.pts_stop = pts_stop
                sync.common_start = None
                log(f"resume: {n_done} frames from checkpoint, "
                    f"continuing at frame {n_done + 1}")
            else:
                replay = []
        ckpt = _CkptJournal(ckpt_path, rc, append=bool(replay),
                            frames0=n_done)

    # ---- muxer (analysis pass writes nowhere — x264 pass-1 analog) ----
    if job.pass_id == 1:
        mux = _NullMux()
    else:
        mux = _MuxAdapter(job, out_fi, audio_sel, src, aencs,
                          sub_specs=sub_specs)
        if ckpt is not None:
            mux.journal = ckpt
            for rec in replay:
                mux.replay(rec)

    # ---- threaded stage graph (work.c:2242-2280: one thread per work
    # object, bounded FIFOs between; reader → decode+sync → filters+encode
    # → mux interleave). IO, device analysis, host entropy coding and mux
    # overlap across the four threads; fifo capacity is the backpressure.
    stats = {"frames_in": 0, "frames_out": 0, "bytes_out": 0}
    nframes = getattr(src, "n_frames", 0) or (
        getattr(src, "duration", 0) * out_vrate.numerator
        // max(1, out_vrate.denominator * CLOCK))
    progress = Progress(int(nframes) or 1, state.update if state else
                        (lambda **kw: None))
    start_state = None
    if pts_start:
        start_state = src.seek(pts_start)
    it = src.packets(start_state) if start_state is not None \
        else src.packets()

    from .core.pipeline import Pipeline
    pl = Pipeline()
    fifo_raw = pl.make_fifo(32, "raw")       # FIFO_LARGE (work.c:40-47)
    fifo_sync = pl.make_fifo(32, "sync")
    fifo_enc = pl.make_fifo(32, "enc")

    reader = _ReaderStage(it, die, pause)
    reader.fifo_out = fifo_raw
    decsync = _DecodeSyncStage(video_track, vdec, adecs, sync, v_sync,
                               a_sync, stats, vcodec=vti.codec,
                               sdecs=sdecs, s_sync=s_sync,
                               cc_sel=cc_sel)
    decsync.fifo_in, decsync.fifo_out = fifo_raw, fifo_sync
    gshards = int(getattr(job, "gop_parallel", 0) or 0)
    if gshards > 1 and job.vcodec not in ("h264_tpu", "x264", "h264"):
        log("gop-parallel: only the h264 encoder is sharded — ignoring")
        gshards = 0
    encst = _EncodeStage(graph, venc, aencs, rc, stats, progress,
                         sub_specs, (out_w, out_h), gop_parallel=gshards,
                         multipass=bool(job.multipass),
                         target_kbps=float(job.vbitrate or 0))
    encst.fifo_in, encst.fifo_out = fifo_sync, fifo_enc
    muxst = _MuxStage(mux, aencs)
    muxst.fifo_in = fifo_enc

    for w in (reader, decsync, encst, muxst):
        pl.add_work(w)
    pl.run()          # joins on the mux thread (work.c:2287)
    if pl.error is not None:
        raise pl.error

    if job.pass_id == 1:
        # hand measured complexity to the final pass (hb_interjob_t role)
        job.interjob["rc_stats"] = rc.stats
        job.interjob["vrate_measured"] = float(out_vrate)
    if state is not None:
        state.update(progress=1.0)
    stats["width"], stats["height"] = out_w, out_h
    return stats


_SUB_SID0 = 1000   # subtitle stream ids live above source track indexes


# ---------------------------------------------------------------------------
# pipeline stages (hb_work_object_t analogs; core/pipeline.py runs one
# thread per stage with bounded FIFOs — the work.c:2242 assembly)
# ---------------------------------------------------------------------------
from .core.pipeline import WorkObject  # noqa: E402


class _ReaderStage(WorkObject):
    """Generator stage: source packets → fifo (reader.c role)."""
    name = "reader"

    def __init__(self, it, die, pause):
        super().__init__()
        self.it = it
        self.die = die
        self.pause = pause

    def generate(self):
        for trk, pkt in self.it:
            if self.pause is not None:
                self.pause.wait()
            if self.die is not None and self.die.is_set():
                break
            pkt.stream_id = trk
            yield pkt
        yield Buffer.eof()


class _DecodeSyncStage(WorkObject):
    """Decode per track and run the synchronizer (decavcodec + sync.c)."""
    name = "decode+sync"

    def __init__(self, video_track, vdec, adecs, sync, v_sync, a_sync,
                 stats, vcodec="", sdecs=None, s_sync=None, cc_sel=None):
        super().__init__()
        self.cc_sel = cc_sel       # (key, Cea608Decoder) or None
        self.video_track = video_track
        self.vdec = vdec
        self.adecs = adecs
        self.sync = sync
        self.v_sync = v_sync
        self.a_sync = a_sync
        self.stats = stats
        self.vcodec = vcodec
        self.sdecs = sdecs or {}
        self.s_sync = s_sync or {}
        self._hdr: dict = {}       # static + pending per-frame metadata

    def _feed_cc(self, es: bytes, pts):
        """CEA-608 captions ride the video ES (deccc608sub.c role):
        extract GA94 cc_data from MPEG-2 user_data or H.264 SEI and
        decode to text cues on the caption subtitle stream."""
        from .subtitles.cea608 import extract_cc_h264, extract_cc_mpeg2
        key, dec = self.cc_sel
        if self.vcodec in ("mpeg2", "mpeg2video"):
            pairs = extract_cc_mpeg2(es)
        elif self.vcodec == "h264":
            pairs = extract_cc_h264(es)
        else:
            return
        for ev in dec.feed(pairs, pts or 0):
            b = Buffer(track_kind="subtitle", pts=ev.pts, stop=ev.stop,
                       duration=ev.duration)
            b.data = ev.text.encode("utf-8")
            b.stream_id = _SUB_SID0 + key
            self.sync.queue(self.s_sync[key], b)

    def _emit_sub(self, key, ev):
        """Queue one bitmap event (or clear marker) immediately: a PGS
        display set replaces the screen, events persist until the next
        set (render_sub's clear semantics)."""
        b = Buffer(track_kind="subtitle", pts=ev.pts, stop=None)
        if ev.rgba is None:
            b.sub_clear = True
        else:
            b.planes = [ev.rgba]
            b.rect = (ev.x, ev.y)
        b.stream_id = _SUB_SID0 + key
        self.sync.queue(self.s_sync[key], b)

    def work(self, buf):
        if buf.is_eof():
            # drain decoder delay (MPEG-2 B reorder holds the final ref)
            if hasattr(self.vdec, "flush"):
                for f in self.vdec.flush():
                    if f.pts is None:
                        last = getattr(self, "_last_vpts", None)
                        dur = f.duration or getattr(self, "_last_vdur",
                                                    None) or 3003
                        f.pts = (last + dur) if last is not None else 0
                        f.duration = dur
                        f.stop = f.pts + dur
                        self._last_vpts = f.pts
                    if self._hdr:
                        f.side_data.update(self._hdr)
                    self.sync.queue(self.v_sync, f)
                    self.stats["frames_in"] += 1
            for idx in range(len(self.sync.streams)):
                self.sync.set_eof(idx)
            out = self.sync.poll()
            out += self.sync.poll()      # tail after EOF
            # cadence classifier consumer (checkCadence sync.c:1305):
            # the measured frame-duration pattern lands in the job
            # stats; a telecine cadence without an active detelecine
            # filter is logged (the HandBrake diagnostic role)
            cad = self.sync.cadence.stats() \
                if hasattr(self.sync.cadence, "stats") else \
                {"cadence": self.sync.cadence.classify(),
                 "breaks": self.sync.cadence.breaks}
            self.stats["cadence"] = cad["cadence"]
            self.stats["cadence_breaks"] = cad["breaks"]
            if cad["cadence"] == "telecine":
                log("sync: 3:2 telecine cadence detected — consider "
                    "--detelecine")
            return out + [buf]
        trk = buf.stream_id
        if trk == self.video_track:
            if buf.planes is None and buf.data \
                    and self.vcodec in ("h264", "hevc"):
                # HDR metadata rides SEI/RPU NALs in the source ES
                # (hdr10plus.c:133, rpu.c:245 roles)
                from .codecs.hdr import extract_hdr_side_data
                sd = extract_hdr_side_data(buf.data, self.vcodec)
                if sd:
                    self._hdr.update(sd)
            if self.cc_sel is not None and buf.data:
                self._feed_cc(bytes(buf.data), buf.pts)
            frames = [buf] if buf.planes is not None else self.vdec.feed(buf)
            for f in frames:
                if f.pts is not None:
                    self._last_vpts = f.pts
                    if f.duration:
                        self._last_vdur = f.duration
                if self._hdr:
                    f.side_data.update(self._hdr)
                    # per-frame payloads attach once; statics persist
                    self._hdr.pop("hdr10plus_t35", None)
                    self._hdr.pop("dovi_rpu", None)
                self.sync.queue(self.v_sync, f)
                self.stats["frames_in"] += 1
        elif trk in self.adecs:
            for ab in self.adecs[trk].feed(buf):
                self.sync.queue(self.a_sync[trk], ab)
        elif trk in self.sdecs and buf.data is not None:
            key, dec = self.sdecs[trk]
            if isinstance(dec, _TextCueDecoder):
                txt = dec.parse(bytes(buf.data))
                if txt:
                    b = Buffer(track_kind="subtitle", pts=buf.pts,
                               duration=buf.duration)
                    b.stop = (buf.pts + buf.duration) \
                        if buf.pts is not None and buf.duration else None
                    b.data = txt.encode("utf-8")
                    b.stream_id = _SUB_SID0 + key
                    self.sync.queue(self.s_sync[key], b)
            else:
                for ev in dec.feed(bytes(buf.data), buf.pts or 0):
                    self._emit_sub(key, ev)
        return self.sync.poll()


class _EncodeStage(WorkObject):
    """Filter graph + encoders. Video uses the encoder's begin/finish
    pipelining when available so the device analyses frame N+1 while this
    thread entropy-codes frame N (encx264 lookahead role)."""
    name = "filter+encode"

    def __init__(self, graph, venc, aencs, rc, stats, progress, sub_specs,
                 out_wh, gop_parallel=0, multipass=False,
                 target_kbps=0.0):
        super().__init__()
        self.graph = graph
        self.venc = venc
        self.aencs = aencs
        self.rc = rc
        self.stats = stats
        self.progress = progress
        self.sub_specs = sub_specs or {}
        self.out_wh = out_wh
        self._pend = []   # (pending, fb, qp, is_idr)
        self.gop_parallel = int(gop_parallel or 0)
        self._gp_frames = []   # buffered (planes, fb) in gop-parallel mode
        self.multipass = bool(multipass)
        self.target_kbps = float(target_kbps or 0.0)

    # -- video ---------------------------------------------------------------
    def _planes(self, fb):
        y, u, v = (np.asarray(p) for p in fb.planes)
        enc_bd = getattr(self.venc, "bd", 8)
        src_bd = fb.pix_fmt.bit_depth if fb.pix_fmt else 8
        if enc_bd != src_bd:
            # FORMAT-filter role (work.c:1506): scale to encoder depth
            sh = abs(enc_bd - src_bd)
            if enc_bd > src_bd:
                y, u, v = (p.astype(np.uint16) << sh for p in (y, u, v))
            else:
                y, u, v = ((p >> sh).astype(np.uint8) for p in (y, u, v))
        return y, u, v

    def _emit_video(self, au, fb, is_idr, qp):
        sd = fb.side_data or {}
        if sd and ("HEVC" in type(self.venc).__name__
                   or "H264" in type(self.venc).__name__):
            codec = "hevc" if "HEVC" in type(self.venc).__name__ \
                else "h264"
            from .codecs.hdr import hdr_nals
            emit = {}
            if is_idr:
                emit.update({k: sd[k] for k in ("mastering_display",
                                                "content_light")
                             if k in sd})
            emit.update({k: sd[k] for k in ("hdr10plus_t35", "dovi_rpu")
                         if k in sd})
            pre, post = hdr_nals(emit, codec)
            if pre or post:
                au = pre + au + post
        ed = getattr(self.venc, "extradata", b"")
        if ed:
            fb.side_data = dict(fb.side_data or {})
            fb.side_data["codec_private"] = ed
        self.rc.update(len(au) * 8, qp, is_idr)
        self.stats["frames_out"] += 1
        self.stats["bytes_out"] += len(au)
        self.progress.tick()
        out = Buffer(track_kind="video", pts=fb.pts,
                     duration=fb.duration or 0)
        out.data = au
        out.side_data = dict(fb.side_data or {})
        out.frametype = 1 if is_idr else 0
        return out

    def _encode(self, fb):
        y, u, v = self._planes(fb)
        if self.gop_parallel > 1:
            # GOP-parallel mode (parallel/gop.py, SURVEY §2.8.3): buffer
            # one WINDOW of keyframe-aligned chunks, then run the sharded
            # encode — bounded memory, not buffer-the-whole-title
            self._gp_frames.append(((y, u, v), fb))
            window = self.gop_parallel * max(1, min(self.venc.cfg.gop,
                                                    120))
            if len(self._gp_frames) >= window:
                return self._gp_flush()
            return []
        if isinstance(self.venc, _BFrameEncoderAdapter):
            return self._encode_b(fb, y, u, v)
        is_idr = (self.venc.frame_idx % self.venc.cfg.gop) == 0
        out = []
        if is_idr:
            # Drain the pipeline at GOP boundaries so rc.update() for every
            # frame of the previous GOP has run before this GOP's allocation.
            # Within a GOP, frame_qp intentionally lags one frame behind
            # update() — the price of overlapping device analysis of frame
            # N+1 with host entropy of frame N (encx264 lookahead role).
            while self._pend:
                out.append(self._finish_one())
        qp = self.rc.frame_qp(is_idr)
        if hasattr(self.venc, "begin_frame"):
            self._pend.append((self.venc.begin_frame(y, u, v, qp=qp), fb,
                               qp, is_idr))
            if out:
                return out
            if len(self._pend) > 1:
                return [self._finish_one()]
            return []
        au = self.venc.encode_frame(y, u, v, qp=qp)
        return out + [self._emit_video(au, fb, self.venc.last_frame_was_idr,
                                       qp)]

    def _finish_one(self):
        p, fb, qp, is_idr = self._pend.pop(0)
        au = self.venc.finish_frame(p)
        return self._emit_video(au, fb, is_idr, qp)

    def _encode_b(self, fb, y, u, v):
        """B-pyramid path: display frames buffer inside the walker; AUs
        come out in decode order tagged with their display index, each
        emitted against ITS display frame's timestamps (the muxer
        derives cts offsets from pts vs the decode-order clock)."""
        if not hasattr(self, "_b_fbs"):
            self._b_fbs = {}
            self._b_disp = 0
        self._b_fbs[self._b_disp] = fb
        self._b_disp += 1
        out = []
        for d, au in self.venc.push_display_frame(y, u, v):
            dfb = self._b_fbs.pop(d)
            out.append(self._emit_video(au, dfb,
                                        d % self.venc.cfg.gop == 0,
                                        self.venc.cfg.qp))
        return out

    def _drain_b(self):
        out = []
        if isinstance(self.venc, _BFrameEncoderAdapter):
            for d, au in self.venc.flush():
                dfb = self._b_fbs.pop(d)
                out.append(self._emit_video(au, dfb,
                                            d % self.venc.cfg.gop == 0,
                                            self.venc.cfg.qp))
        return out

    def _gp_flush(self):
        """Run the sharded GOP-parallel encode over the buffered window
        (keyframe-aligned chunks over a jax.sharding mesh, one shard per
        device) and emit per-frame AU buffers in display order.

        Rate control: single-pass windows take the controller's current
        qp (so ABR/CRF adapts window to window); MultiPass + Bitrate
        jobs run the sharded two-pass allocator per window
        (encode_gop_parallel_2pass — the hb_interjob_t stats handoff
        expressed as a psum across the mesh)."""
        import jax
        from .parallel.gop import (encode_gop_parallel,
                                   encode_gop_parallel_2pass)
        from jax.sharding import Mesh
        if not self._gp_frames:
            return []
        frames = [p for p, _fb in self._gp_frames]
        fbs = [fb for _p, fb in self._gp_frames]
        self._gp_frames = []
        devs = jax.devices()
        G = max(1, min(self.gop_parallel, len(devs), len(frames)))
        mesh = Mesh(np.array(devs[:G]), ("gop",))
        w, h = self.out_wh
        qp = int(self.rc.frame_qp(True))
        log(f"gop-parallel: {len(frames)} frames over {G} shards "
            f"({len(devs)} devices)")
        if self.multipass and self.target_kbps > 0:
            _, _, stats2 = encode_gop_parallel_2pass(
                frames, w, h, self.target_kbps, mesh,
                fps=self.venc.cfg.fps, qp1=min(51, qp + 6))
            frame_aus = stats2["frame_aus"] if "frame_aus" in stats2 \
                else stats2.get("aus")
            if frame_aus is None:
                raise WorkError("2-pass gop-parallel returned no AUs")
        else:
            _, _, frame_aus = encode_gop_parallel(frames, w, h, qp, mesh,
                                                  fps=self.venc.cfg.fps)
        out = []
        i = 0
        for g, aus in enumerate(frame_aus):
            for k, au in enumerate(aus):
                out.append(self._emit_video(au, fbs[i], k == 0, qp))
                i += 1
        return out

    # -- dispatch --------------------------------------------------------------
    def work(self, buf):
        if buf.is_eof():
            out = []
            for fb in self.graph.flush():
                out += self._encode(fb)
            out += self._gp_flush()
            out += self._drain_b()
            while self._pend:
                out.append(self._finish_one())
            for sid, enc in self.aencs.items():
                for pkt in enc.flush():
                    pkt.stream_id = sid
                    out.append(pkt)
            return out + [buf]
        if buf.track_kind == "video":
            out = []
            for fb in self.graph.work(buf):
                if not fb.is_eof():
                    out += self._encode(fb)
            return out
        if buf.track_kind == "audio":
            enc = self.aencs.get(buf.stream_id)
            out = []
            if enc is not None:
                for pkt in enc.process(buf):
                    pkt.stream_id = buf.stream_id
                    pkt.track_kind = "audio"
                    out.append(pkt)
            return out
        if buf.track_kind == "subtitle":
            k = buf.stream_id - _SUB_SID0
            spec = self.sub_specs.get(k)
            if spec is None:
                return []
            if spec.burn:
                if getattr(buf, "sub_clear", False) \
                        or buf.planes is not None:
                    # bitmap event / clear marker (PGS): blend layer
                    self.graph.queue_subtitle(buf)
                    return []
                from .subtitles.raster import render_text_rgba
                w, h = self.out_wh
                rgba, (x0, y0) = render_text_rgba(
                    buf.data.decode("utf-8"), w, h)
                ev = Buffer(track_kind="subtitle", pts=buf.pts,
                            stop=buf.stop, duration=buf.duration)
                ev.planes = [rgba]
                ev.rect = (x0, y0)
                self.graph.queue_subtitle(ev)
                return []
            return [buf]   # muxed subtitle track
        return []


class _MuxStage(WorkObject):
    """Track fan-in + time-chunk interleave (muxcommon.c) driving the
    format adapter."""
    name = "mux"

    def __init__(self, adapter, aencs):
        super().__init__()
        self.adapter = adapter
        from .mux.common import Muxer
        self.muxer = Muxer(writer=None, kind="custom")
        self._tmap = {}
        ad = adapter

        def vid_write(b):
            ad.write_video(b.data, b, idr=bool(b.frametype & 1))
        self._tmap[("video", None)] = self.muxer.add_track(write=vid_write)
        for sid in aencs:
            def aw(b, sid=sid):
                ad.write_audio(sid, b)
            self._tmap[("audio", sid)] = self.muxer.add_track(write=aw)

    def work(self, buf):
        if buf.is_eof():
            self.muxer.finish()
            self.adapter.finalize()
            return []
        if buf.track_kind == "video":
            self.muxer.queue(self._tmap[("video", None)], buf)
        elif buf.track_kind == "audio":
            t = self._tmap.get(("audio", buf.stream_id))
            if t is not None:
                self.muxer.queue(t, buf)
        elif buf.track_kind == "subtitle":
            # tx3g/S_TEXT cues are sparse; the adapter writes them directly
            self.adapter.write_subtitle(buf.stream_id - _SUB_SID0, buf)
        return []


class _NullMux:
    """Sink for analysis passes (pass 1 writes no output file)."""

    def write_video(self, au, fb, idr):
        pass

    def write_audio(self, sid, pkt):
        pass

    def write_subtitle(self, k, buf):
        pass

    def finalize(self):
        pass


# ---------------------------------------------------------------------------
# audio stages (v1: PCM decode + PCM/copy output; AAC encoder follows)
# ---------------------------------------------------------------------------
class _PcmDecoder:
    """PCM-in-container (little-endian s16) and DVD LPCM
    (declpcm.c:410 role: big-endian, 16/20/24-bit; the PS demuxer parses
    the substream header into TrackInfo + a bits byte in extradata)."""

    def __init__(self, ti):
        self.ti = ti
        self.dvd = ti.codec == "lpcm"
        self.bits = (ti.extradata[0] if self.dvd and ti.extradata
                     else 16)
        self._rem = b""

    def feed(self, buf: Buffer) -> list:
        if buf.data is None:
            return []
        ch = max(1, self.ti.channels)
        if not self.dvd:
            pcm = np.frombuffer(buf.data, "<i2").astype(np.float32) / 32768.0
        else:
            data = self._rem + bytes(buf.data)
            if self.bits == 16:
                n = len(data) // (2 * ch) * (2 * ch)
                self._rem = data[n:]
                pcm = np.frombuffer(data[:n], ">i2").astype(
                    np.float32) / 32768.0
            else:
                # DVD 20/24-bit group: per 2-sample-pair group, the MSB
                # 16 bits of 2*ch samples, then the LSB tail bytes
                gsz = 2 * ch * 2 + (ch if self.bits == 24 else ch // 2 or 1)
                n = len(data) // gsz * gsz
                self._rem = data[n:]
                g = np.frombuffer(data[:n], np.uint8).reshape(-1, gsz)
                hi = g[:, :2 * ch * 2].reshape(-1, 2 * ch, 2)
                s16 = (hi[:, :, 0].astype(np.int32) << 8) | hi[:, :, 1]
                s16 = np.where(s16 >= 32768, s16 - 65536, s16)
                pcm = (s16 / 32768.0).astype(np.float32).reshape(-1)
        pcm = pcm.reshape(-1, ch)
        out = Buffer(track_kind="audio").copy_props(buf)
        out.planes = [pcm]
        out.data = None
        if not out.duration and self.ti.sample_rate:
            # containers without per-block durations (mkv) would leave
            # the sync gap-filler thinking the clock never advanced
            out.duration = int(round(pcm.shape[0] * 90000
                                     / self.ti.sample_rate))
            out.stop = (out.pts + out.duration) \
                if out.pts is not None else None
        return [out]


class _CopyAudioDecoder:
    """Passthrough: compressed packets ride the sync layer unchanged."""

    def feed(self, buf: Buffer) -> list:
        return [buf]


class _AacPacketDecoder:
    """AAC-LC decode (audio/aacdec.py, decavcodec.c:367 role): one
    container packet = one access unit (mp4/mkv, ASC in extradata) or an
    ADTS byte stream (TS).  The 1024-sample filterbank delay is absorbed
    by dropping the first output frame and carrying each output on the
    previous packet's timestamp."""

    def __init__(self, ti):
        import collections
        from .audio.aacdec import AACDecoder
        self.dec = AACDecoder(ti.extradata or None)
        self.ti = ti
        self._pend = b""
        self._adts = None
        self._pts_q = collections.deque()
        self._primed = False

    def feed(self, buf: Buffer) -> list:
        if buf.data is None:
            return []
        data = bytes(buf.data)
        if self._adts is None:
            self._adts = (len(data) >= 2 and data[0] == 0xFF
                          and (data[1] & 0xF0) == 0xF0)
        if self._adts:
            self._pend += data
            frames = []
            while True:
                h = self.dec.parse_adts_header(self._pend)
                if h is None:
                    i = self._pend.find(b"\xff", 1)   # resync on garbage
                    if i < 0:
                        self._pend = self._pend[-1:] \
                            if self._pend else b""
                        break
                    self._pend = self._pend[i:]
                    continue
                if len(self._pend) < h[1]:
                    break
                frames.append(self._pend[:h[1]])
                self._pend = self._pend[h[1]:]
        else:
            frames = [data]
        outs = []
        for k, fr in enumerate(frames):
            try:
                pcm = self.dec.decode_frame(fr)
            except Exception as e:  # noqa: BLE001 — corrupt AU: skip
                log("aac decode error: %s" % e)
                continue
            dur = int(round(pcm.shape[0] * 90000 /
                            max(1, self.dec.sample_rate)))
            # AU k of an ADTS burst starts k frame-durations after the
            # packet pts; mp4/mkv deliver one AU per packet (k = 0)
            self._pts_q.append((buf.pts + k * dur)
                               if buf.pts is not None else None)
            if not self._primed:
                # drop the filterbank priming frame; each later output
                # carries the PREVIOUS AU's pts (1024-sample delay)
                self._primed = True
                continue
            pts = self._pts_q.popleft()
            out = Buffer(track_kind="audio").copy_props(buf)
            out.pts = pts
            out.duration = dur
            out.stop = (pts + dur) if pts is not None else None
            out.planes = [pcm]
            out.data = None
            outs.append(out)
        return outs


class _Ac3PacketDecoder:
    """AC-3 decode (audio/ac3dec.py — decavcodec.c AC-3 personality
    role): byte-stream sync on 0x0B77 syncframes, so DVD/TS packets may
    split or batch frames.  Each 1536-sample output takes the packet
    pts when a fresh packet starts a frame, else extrapolates."""

    def __init__(self, ti):
        from .audio.ac3dec import Ac3Decoder
        self.dec = Ac3Decoder()
        self.ti = ti
        self._next_pts = None

    def feed(self, buf: Buffer) -> list:
        if buf.data is None:
            return []
        if buf.pts is not None and not self.dec._buf:
            self._next_pts = buf.pts
        frames = self.dec.feed(bytes(buf.data))
        outs = []
        for pcm in frames:
            sr = max(1, self.dec.sample_rate)
            dur = int(round(pcm.shape[1] * 90000 / sr))
            out = Buffer(track_kind="audio").copy_props(buf)
            out.pts = self._next_pts
            out.duration = dur
            out.stop = (self._next_pts + dur) \
                if self._next_pts is not None else None
            out.planes = [np.ascontiguousarray(pcm.T)]
            out.data = None
            outs.append(out)
            if self._next_pts is not None:
                self._next_pts += dur
        return outs


class _AVAudioPacketDecoder:
    """libavcodec audio decode (decavcodec.c:192-347 personality) for
    E-AC-3/DTS/TrueHD/MP3/Vorbis/Opus — one container packet (or
    byte-stream chunk; lavc parses syncframes internally for the
    self-framed codecs) in, float32 PCM out."""

    def __init__(self, ti, name):
        from .codecs.avcodec import AVAudioDecoder
        self.dec = AVAudioDecoder(name, extradata=bytes(ti.extradata or b""),
                                  sample_rate=ti.sample_rate or 0,
                                  channels=ti.channels or 0)
        self.ti = ti
        self._next_pts = None

    def _wrap(self, pcm, buf):
        if pcm.shape[0] == 0:
            return []
        sr = self.ti.sample_rate or 48000
        dur = int(round(pcm.shape[0] * 90000 / sr))
        out = Buffer(track_kind="audio")
        if buf is not None:
            out.copy_props(buf)
        out.pts = self._next_pts
        out.duration = dur
        out.stop = (self._next_pts + dur) \
            if self._next_pts is not None else None
        out.planes = [np.ascontiguousarray(pcm)]
        out.data = None
        if self._next_pts is not None:
            self._next_pts += dur
        return [out]

    def feed(self, buf: Buffer) -> list:
        if buf.data is None:
            return []
        if buf.pts is not None and (
                self._next_pts is None
                or abs(buf.pts - self._next_pts) > 9000):
            self._next_pts = buf.pts     # resync on gaps > 100 ms
        return self._wrap(self.dec.decode(bytes(buf.data)), buf)

    def flush(self) -> list:
        return self._wrap(self.dec.flush(), None)


class _TextCueDecoder:
    """In-stream text subtitle cues → plain text (dectx3gsub.c role for
    mp4 tx3g samples; mkv S_TEXT/UTF8 raw cues; S_TEXT/ASS block lines
    with the decssasub.c field split)."""

    def __init__(self, codec):
        self.codec = codec

    def parse(self, data: bytes) -> str:
        import re
        if self.codec in ("tx3g", "text"):
            if len(data) < 2:
                return ""
            n = int.from_bytes(data[:2], "big")
            txt = data[2:2 + n].decode("utf-8", "replace")
        elif self.codec in ("ass", "ssa"):
            # mkv block line: ReadOrder,Layer,Style,Name,4xMargin,
            # Effect,Text
            parts = data.decode("utf-8", "replace").split(",", 8)
            txt = parts[-1] if parts else ""
            txt = txt.replace("\\N", "\n").replace("\\n", "\n") \
                .replace("\\h", " ")
        else:                              # srt/subrip: raw cue text
            txt = data.decode("utf-8", "replace")
        txt = re.sub(r"<[^>]{1,64}>|\{\\[^}]{0,64}\}", "", txt)
        return txt.strip()


class _Mp2PacketDecoder:
    """MPEG-1 Layer I/II audio decode (audio/mp2dec.py — the DVB/DVD
    broadcast personality of decavcodec.c): byte-stream sync, 1152
    (or 384) samples per frame, same pts policy as _Ac3PacketDecoder."""

    def __init__(self, ti):
        from .audio.mp2dec import Mp2Decoder
        self.dec = Mp2Decoder()
        self.ti = ti
        self._next_pts = None

    def feed(self, buf: Buffer) -> list:
        if buf.data is None:
            return []
        if buf.pts is not None and not self.dec._buf:
            self._next_pts = buf.pts
        outs = []
        for pcm in self.dec.feed(bytes(buf.data)):
            sr = max(1, self.dec.sample_rate)
            dur = int(round(pcm.shape[0] * 90000 / sr))
            out = Buffer(track_kind="audio").copy_props(buf)
            out.pts = self._next_pts
            out.duration = dur
            out.stop = (self._next_pts + dur) \
                if self._next_pts is not None else None
            out.planes = [pcm]
            out.data = None
            outs.append(out)
            if self._next_pts is not None:
                self._next_pts += dur
        return outs


class _FlacPacketDecoder:
    """Streaming FLAC decode: one container packet = one FLAC frame
    (decavcodec.c audio personality role for FLAC inputs)."""

    def __init__(self, ti):
        from .audio.flac import FLAC_MARKER, FlacDecoder
        xd = ti.extradata or b""
        if xd and not xd.startswith(FLAC_MARKER):
            # mp4 dfLa carries the bare STREAMINFO block; mkv has fLaC + blocks
            xd = FLAC_MARKER + b"\x80\x00\x00\x22" + xd[-34:]
        self.dec = FlacDecoder(xd) if xd else None
        self.ti = ti

    def feed(self, buf: Buffer) -> list:
        if buf.data is None or self.dec is None:
            return []
        from .audio.flac import _BR
        pcm_i = self.dec._decode_frame(_BR(buf.data))
        bits = self.dec.bits or 16
        pcm = pcm_i.astype(np.float32) / float(1 << (bits - 1))
        out = Buffer(track_kind="audio").copy_props(buf)
        out.planes = [pcm]
        out.data = None
        return [out]


def _make_audio_decoder(ti, spec=None):
    if spec is not None and str(spec.encoder).startswith("copy"):
        # passthrough: keep the compressed packets intact (WORK_PASS
        # role) — decoding would hand PCM to a chain that forwards data
        return _CopyAudioDecoder()
    if ti.codec in ("pcm_s16le", "lpcm"):
        return _PcmDecoder(ti)
    if ti.codec == "flac":
        return _FlacPacketDecoder(ti)
    if ti.codec == "aac":
        try:
            return _AacPacketDecoder(ti)
        except Exception as e:  # noqa: BLE001 — unsupported profile/rate
            log("aac: decode unavailable (%s) — passthrough only" % e)
    if ti.codec == "ac3":
        return _Ac3PacketDecoder(ti)
    if ti.codec in ("mp2", "mp1", "mpa"):
        return _Mp2PacketDecoder(ti)
    if ti.codec in ("eac3", "dts", "dca", "truehd", "mlp", "mp3",
                    "vorbis", "opus"):
        # libavcodec personality (decavcodec.c:192-347 role — upstream
        # decodes ALL audio through lavc; our native decoders above
        # exceed that, the long tail goes the same way it does there)
        try:
            from .codecs import avcodec as av
            if av.available():
                name = {"dts": "dca", "mlp": "mlp"}.get(ti.codec, ti.codec)
                return _AVAudioPacketDecoder(ti, name)
        except Exception as e:  # noqa: BLE001
            log(f"{ti.codec}: lavc decode unavailable ({e}) — passthrough")
    return _CopyAudioDecoder()


def _make_audio_encoder(spec, ti):
    """Audio chain per output track (resample/mixdown/gain/drc + encoder).

    AAC-LC/AC-3/FLAC encode natively (audio/*.py); MP3/Opus/Vorbis ride
    the libavcodec catalog exactly as upstream does
    (encavcodecaudio.c:573 routes them through lavc/LAME/libopus)."""
    from .audio.chain import AudioChain
    return AudioChain(spec, ti)


# ---------------------------------------------------------------------------
# mux adapter
# ---------------------------------------------------------------------------
class _MuxAdapter:
    """Wraps MP4Writer/MKVWriter behind one write_video/write_audio API
    (muxcommon.c role: track fan-in; interleave is the writers' concern)."""

    def __init__(self, job: Job, out_fi, audio_sel, src, aencs=None,
                 sub_specs=None):
        self.job = job
        self.kind = job.mux
        self.aencs = aencs or {}
        path = job.file or "out.mp4"
        self._amap = {}
        self._smap = {}           # subtitle key → track index
        self._sub_last_end = {}   # tx3g gap filling (90 kHz)
        if job.vcodec in ("hevc_tpu", "x265", "hevc", "h265"):
            mux_vcodec = "hevc"
        elif job.vcodec in ("av1_tpu", "svt_av1", "av1"):
            mux_vcodec = "av1"
        elif job.vcodec in ("mpeg2", "mpeg4", "vp9", "vp8", "ffv1",
                            "prores", "theora"):
            mux_vcodec = job.vcodec      # lavc catalog: raw samples
        else:
            mux_vcodec = "h264"
        self._raw_video = mux_vcodec not in ("h264", "hevc", "av1")
        if self._raw_video and self.kind not in ("mkv", "webm"):
            raise WorkError(
                f"{mux_vcodec} output requires the mkv container")
        if self.kind in ("mkv", "webm"):
            from .mux.mkv import MKVWriter
            self.w = MKVWriter(path, webm=(self.kind == "webm"))
            self.vtrack = self.w.add_video_track(
                codec=mux_vcodec, width=out_fi.geometry.width,
                height=out_fi.geometry.height,
                fps=float(out_fi.vrate))
            for si, spec in audio_sel:
                ti = src.tracks[si]
                chain = self.aencs.get(si)
                priv = b""
                if chain is not None and chain.out_codec() == "flac":
                    from .audio.flac import FLAC_MARKER
                    priv = FLAC_MARKER + chain.extradata(initial=True)
                elif chain is not None and chain.out_codec() == "aac":
                    priv = chain.extradata()   # AudioSpecificConfig
                elif chain is not None and chain.out_codec() in (
                        "opus", "vorbis"):
                    priv = chain.extradata()   # OpusHead / Xiph lacing
                elif chain is not None and chain.is_passthrough():
                    priv = ti.extradata
                self._amap[si] = self.w.add_audio_track(
                    codec=chain.out_codec() if chain else ti.codec,
                    sample_rate=chain.sr_out if chain else ti.sample_rate,
                    channels=chain.out_channels if chain else ti.channels,
                    private=priv, language=ti.language)
        else:
            from .mux.mp4 import MP4Writer
            self.w = MP4Writer(path)
            self.vtrack = self.w.add_video_track(
                codec=mux_vcodec, width=out_fi.geometry.width,
                height=out_fi.geometry.height)
            # colr nclx from the title's signalled colorimetry (the
            # muxavformat.c track-setup analog; mdcv/clli follow from
            # side_data at write_video time)
            tcolor = dict(getattr(src, "color", None) or {})
            tcolor.update(job.color or {})
            self.w.tracks[self.vtrack].color = {
                "Primaries": tcolor.get("Primaries", 1),
                "Transfer": tcolor.get("Transfer", 1),
                "Matrix": tcolor.get("Matrix", 1),
                "Range": tcolor.get("Range", 1)}
            for si, spec in audio_sel:
                ti = src.tracks[si]
                chain = self.aencs.get(si)
                xd = b""
                if chain is not None and chain.out_codec() == "aac":
                    xd = chain.extradata()     # AudioSpecificConfig
                elif chain is not None and chain.out_codec() == "ac3":
                    xd = chain.extradata()     # dac3 payload
                    if not xd:
                        # passthrough: synthesize dac3 from track info
                        # (fscod/bsid/bsmod/acmod/lfeon packed fields)
                        fscod = {48000: 0, 44100: 1,
                                 32000: 2}.get(ti.sample_rate, 0)
                        acmod = {1: 1, 2: 2, 6: 7}.get(ti.channels, 2)
                        lfe = 1 if ti.channels == 6 else 0
                        v = (fscod << 22) | (8 << 17) | (acmod << 11) \
                            | (lfe << 10) | (11 << 5)   # ~192 kbps
                        xd = v.to_bytes(3, "big")
                elif chain is not None and chain.out_codec() == "opus":
                    # dOps payload = OpusHead minus the 8-byte magic,
                    # version byte first (RFC 7845 / ISO-BMFF Opus)
                    oh = chain.extradata()
                    if len(oh) >= 19 and oh[:8] == b"OpusHead":
                        xd = b"\x00" + oh[9:]
                elif chain is not None and chain.out_codec() in (
                        "mp3", "vorbis"):
                    xd = chain.extradata()
                elif chain is not None and chain.is_passthrough():
                    xd = ti.extradata
                    if ti.codec == "aac" and not xd:
                        # ADTS sources carry no ASC: build AAC-LC
                        # AudioSpecificConfig from the track info
                        srates = [96000, 88200, 64000, 48000, 44100,
                                  32000, 24000, 22050, 16000, 12000,
                                  11025, 8000, 7350]
                        sfi = srates.index(ti.sample_rate) \
                            if ti.sample_rate in srates else 3
                        ch = max(1, min(7, ti.channels))
                        v = (2 << 11) | (sfi << 7) | (ch << 3)
                        xd = v.to_bytes(2, "big")
                self._amap[si] = self.w.add_audio_track(
                    codec=chain.out_codec() if chain else ti.codec,
                    sample_rate=chain.sr_out if chain else ti.sample_rate,
                    channels=chain.out_channels if chain else ti.channels,
                    extradata=xd, language=ti.language)
        for k, sspec in (sub_specs or {}).items():
            if sspec.burn:
                continue
            if self.kind in ("mkv", "webm"):
                self._smap[k] = self.w.add_subtitle_track(
                    codec="srt", language=sspec.language)
            else:
                self._smap[k] = self.w.add_subtitle_track(
                    codec="tx3g", language=sspec.language)
            self._sub_last_end[k] = 0
        if job.chapter_markers:
            for i, (start, name) in enumerate(getattr(src, "chapters", [])):
                title = job.chapter_names[i] \
                    if i < len(job.chapter_names) else name
                self.w.add_chapter(start, title or f"Chapter {i + 1}")
        self.metadata = dict(job.metadata)
        if hasattr(self.w, "metadata"):
            self.w.metadata = self.metadata

    def write_video(self, au: bytes, fb: Buffer, idr: bool,
                    _journal=True):
        if _journal and getattr(self, "journal", None) is not None:
            self.journal.video(bytes(au), fb.pts, fb.duration, idr,
                               fb.side_data)
        sd = fb.side_data or {}
        if sd and self.kind not in ("mkv", "webm"):
            t = self.w.tracks[self.vtrack]
            if "mastering_display" in sd and not t.mastering:
                t.mastering = sd["mastering_display"]
            if "content_light" in sd and not t.cll:
                t.cll = sd["content_light"]
        dur = fb.duration or 0
        annexb = not getattr(self, "_raw_video", False)
        cp = sd.get("codec_private")
        if cp and self.kind in ("mkv", "webm") \
                and not self.w.tracks[self.vtrack].private:
            # catalog encoders (theora/mpeg4/...) carry their config in
            # extradata — MKV CodecPrivate, set before the first sample
            self.w.tracks[self.vtrack].private = cp
        if self.kind in ("mkv", "webm"):
            self.w.write_sample(self.vtrack, au, pts_90k=fb.pts or 0,
                                duration_90k=dur, sync=idr, annexb=annexb)
        else:
            # decode-order samples: cts offset = display pts vs the
            # decode-order clock (non-zero only for B reorder; ctts v1)
            vdts = getattr(self, "_vdts", 0)
            cts = (fb.pts - vdts) if fb.pts is not None else 0
            self._vdts = vdts + dur
            self.w.write_sample(self.vtrack, au, duration=dur, sync=idr,
                                cts_offset=cts, annexb=annexb)

    @staticmethod
    def _strip_adts(data: bytes) -> bytes:
        """ADTS framing → raw AAC AUs (the aac_adtstoasc BSF role):
        containers index access units, not the self-framing stream."""
        out = bytearray()
        i = 0
        n = len(data)
        while i + 7 <= n and data[i] == 0xFF and \
                (data[i + 1] & 0xF0) == 0xF0:
            ln = ((data[i + 3] & 3) << 11) | (data[i + 4] << 3) \
                | (data[i + 5] >> 5)
            hdr = 7 if (data[i + 1] & 1) else 9    # +CRC
            if ln < hdr or i + ln > n:
                break
            out += data[i + hdr:i + ln]
            i += ln
        return bytes(out) if i and i == n else data

    def replay(self, rec):
        """Re-apply one checkpoint-journal record (resume path)."""
        if rec[0] == "v":
            _tag, au, pts, dur, idr, sd = rec
            fb = Buffer(track_kind="video", pts=pts, duration=dur)
            fb.side_data = dict(sd)
            self.write_video(au, fb, idr, _journal=False)
        elif rec[0] == "a":
            _tag, sid, data, pts, dur, stop = rec
            b = Buffer(track_kind="audio", pts=pts, duration=dur)
            b.data = data
            b.stop = stop
            self.write_audio(sid, b, _journal=False)
        elif rec[0] == "s":
            _tag, k, data, pts, dur, stop = rec
            b = Buffer(track_kind="subtitle", pts=pts, duration=dur)
            b.data = data
            b.stop = stop
            self.write_subtitle(k, b, _journal=False)

    def write_audio(self, sid: int, pkt: Buffer, _journal=True):
        tr = self._amap.get(sid)
        if tr is None or pkt.data is None:
            return
        if _journal and getattr(self, "journal", None) is not None:
            self.journal.audio(sid, bytes(pkt.data), pkt.pts,
                               pkt.duration, pkt.stop)
        data = pkt.data
        tcodec = self.w.tracks[tr]
        if getattr(tcodec, "codec", getattr(tcodec, "codec_id", "")) \
                in ("aac", "A_AAC"):
            data = self._strip_adts(bytes(data))
        if self.kind in ("mkv", "webm"):
            self.w.write_sample(tr, data, pts_90k=pkt.pts or 0,
                                duration_90k=pkt.duration or 0)
        else:
            t = self.w.tracks[tr]
            dur = (pkt.duration or 0) * t.timescale // CLOCK
            self.w.write_sample(tr, data, duration=dur)

    def write_subtitle(self, k: int, buf: Buffer, _journal=True):
        tr = self._smap.get(k)
        if tr is None or buf.data is None:
            return
        if _journal and getattr(self, "journal", None) is not None:
            self.journal.subtitle(k, bytes(buf.data), buf.pts,
                                  buf.duration, buf.stop)
        text = buf.data
        pts = buf.pts or 0
        dur = buf.duration or 0
        if self.kind in ("mkv", "webm"):
            self.w.write_sample(tr, text, pts_90k=pts, duration_90k=dur)
            return
        # mp4 tx3g: consecutive samples; gaps carry empty cues and an
        # OVERLAPPING cue is repaired by trimming its start to the
        # previous cue's end (sync.c:1162 subtitle-overlap role — the
        # tx3g sample model cannot express simultaneous cues)
        last = self._sub_last_end.get(k, 0)
        if pts > last:
            self.w.write_sample(tr, b"\x00\x00", duration=pts - last)
        elif pts < last:
            dur = max(0, (pts + dur) - last)
            pts = last
            if dur == 0:
                return
        sample = len(text).to_bytes(2, "big") + text
        self.w.write_sample(tr, sample, duration=dur)
        self._sub_last_end[k] = pts + dur

    def finalize(self):
        # late extradata (FLAC STREAMINFO carries final MD5/total-samples;
        # mp4 writes sample entries in moov at finalize so this is exact)
        if self.kind not in ("mkv", "webm"):
            for si, tr in self._amap.items():
                chain = self.aencs.get(si)
                if chain is not None:
                    xd = chain.extradata()
                    if xd:
                        self.w.tracks[tr].extradata = xd
        self.w.finalize()
        if getattr(self, "journal", None) is not None:
            self.journal.close(complete=True)
