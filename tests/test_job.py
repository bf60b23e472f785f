"""Job JSON schema, presets, and param tests."""
import json

import pytest

from handbrake_tpu.job import param, presets, schema as S
from handbrake_tpu.job.schema import Job, FilterSpec
from handbrake_tpu.job.title import Title, AudioTrack, Chapter
from handbrake_tpu.job import colormap, lang


def test_job_json_roundtrip():
    j = Job(path="/tmp/in.mp4", file="/tmp/out.mp4", mux="mkv",
            vcodec="h264_tpu", quality=20.0)
    j.filters = [FilterSpec(S.FILTER_CROP_SCALE,
                            {"width": 1280, "height": 720})]
    d = j.to_json()
    j2 = Job.from_json(d)
    assert j2.path == j.path and j2.mux == "mkv" and j2.quality == 20.0
    assert j2.filters[0].id == S.FILTER_CROP_SCALE
    assert j2.filters[0].settings["width"] == 1280
    # string form too
    j3 = Job.from_json(json.dumps(d))
    assert j3.file == "/tmp/out.mp4"


def test_job_bitrate_mode():
    j = Job(quality=None, vbitrate=4000, multipass=True)
    d = j.to_json()
    assert d["Video"]["Bitrate"] == 4000 and d["Video"]["MultiPass"]
    j2 = Job.from_json(d)
    assert j2.quality is None and j2.vbitrate == 4000 and j2.multipass


def test_filter_order_normalized():
    j = Job()
    j.filters = [FilterSpec(S.FILTER_CROP_SCALE, {}),
                 FilterSpec(S.FILTER_DETELECINE, {}),
                 FilterSpec(S.FILTER_VFR, {})]
    j2 = Job.from_json(j.to_json())
    ids = [f.id for f in j2.filters]
    # enum order is pipeline order: detelecine < vfr < crop_scale
    assert ids == [S.FILTER_DETELECINE, S.FILTER_VFR, S.FILTER_CROP_SCALE]


def test_param_presets_and_custom():
    st = param.generate_filter_settings(S.FILTER_NLMEANS, "medium", "film",
                                        "y_strength=4.5")
    assert st["y_strength"] == 4.5            # custom overrides preset
    assert st["y_strength_scale"] == 0.9      # tune applied
    with pytest.raises(param.ParamError):
        param.generate_filter_settings(S.FILTER_NLMEANS, "medium", "nope", "")
    with pytest.raises(param.ParamError):
        param.validate_filter_settings(S.FILTER_NLMEANS, {"bogus_key": 1})


def _title_1080p():
    return Title(index=1, path="/tmp/clip.mp4", width=1920, height=1080,
                 vrate_num=30000, vrate_den=1001, duration=90000 * 60,
                 audio=[AudioTrack(track=0)],
                 chapters=[Chapter("One", 90000 * 30), Chapter("Two", 90000 * 30)])


def test_builtin_presets_and_search():
    tree = presets.get_builtin()
    flat = presets.flatten(tree)
    assert len(flat) >= 40
    p = presets.preset_search("Fast 1080p30")
    assert p and p["PictureWidth"] == 1920
    p2 = presets.preset_search("General/Fast 1080p30")
    assert p2 and p2["PresetName"] == "Fast 1080p30"
    assert presets.preset_search("No Such Preset") is None


def test_preset_to_job_geometry_and_filters():
    t = _title_1080p()
    p = presets.preset_search("Fast 720p30")
    j = presets.preset_to_job(t, p)
    cs = [f for f in j.filters if f.id == S.FILTER_CROP_SCALE][0]
    assert cs.settings["width"] == 1280 and cs.settings["height"] == 720
    vfr = [f for f in j.filters if f.id == S.FILTER_VFR][0]
    assert vfr.settings["mode"] == 2 and vfr.settings["rate-num"] == 30
    assert j.quality == 22.0 and j.vcodec == "h264_tpu"
    assert len(j.audio) == 1
    # filters sorted by pipeline order
    ids = [f.id for f in j.filters]
    assert ids == sorted(ids, key=lambda i: S.FILTER_ORDER.index(i))


def test_preset_to_job_no_upscale():
    t = _title_1080p()
    p = presets.preset_search("Very Fast 2160p60 4K")
    j = presets.preset_to_job(t, p)
    cs = [f for f in j.filters if f.id == S.FILTER_CROP_SCALE][0]
    # source is 1080p; no upscaling allowed
    assert cs.settings["width"] == 1920 and cs.settings["height"] == 1080


def test_title_set_json():
    t = _title_1080p()
    from handbrake_tpu.job.title import title_set_to_json
    d = title_set_to_json([t])
    assert d["TitleList"][0]["Geometry"]["Width"] == 1920
    assert d["TitleList"][0]["Duration"]["Minutes"] == 1
    assert d["TitleList"][0]["Duration"]["Hours"] == 0
    assert len(d["TitleList"][0]["ChapterList"]) == 2


def test_colormap_and_lang():
    assert colormap.name_to_rgb("black") == 0
    assert colormap.name_to_rgb("#10FF20") == 0x10FF20
    y, u, v = colormap.rgb_to_yuv(0x000000)
    assert (y, u, v) == (16, 128, 128)
    y, u, v = colormap.rgb_to_yuv(0xFFFFFF)
    assert (y, u, v) == (235, 128, 128)
    assert lang.to_iso639_2("en") == "eng"
    assert lang.to_iso639_2("French") == "fre"
    assert lang.lookup("jpn")[0] == "Japanese"


def test_anamorphic_size2_modes():
    """hb_set_anamorphic_size2 math (hb.c:1231)."""
    from fractions import Fraction
    from handbrake_tpu.job.geometry import (ANAMORPHIC_CUSTOM,
                                            ANAMORPHIC_LOOSE,
                                            ANAMORPHIC_NONE,
                                            ANAMORPHIC_STRICT,
                                            GeometrySettings,
                                            set_anamorphic_size2)

    # strict: storage = cropped source, PAR preserved (DVD 720x480 16:9)
    par = Fraction(32, 27)
    w, h, p, dw = set_anamorphic_size2(
        720, 480, par, GeometrySettings(mode=ANAMORPHIC_STRICT,
                                        crop=(2, 2, 0, 0)))
    assert (w, h, p) == (720, 476, par)

    # none: square pixels, display aspect kept
    w, h, p, dw = set_anamorphic_size2(
        720, 480, par, GeometrySettings(mode=ANAMORPHIC_NONE, width=640,
                                        modulus=2))
    assert p == 1 and w == 640
    dar = Fraction(720, 480) * par
    assert abs(h - 640 / float(dar)) <= 2 and h % 2 == 0

    # loose: mod-16 storage, PAR rescaled so DAR is exact
    w, h, p, dw = set_anamorphic_size2(
        720, 480, par, GeometrySettings(mode=ANAMORPHIC_LOOSE, width=700,
                                        modulus=16))
    assert w % 16 == 0 and h % 16 == 0
    assert Fraction(w, h) * p == dar

    # max clamps apply
    w, h, p, _ = set_anamorphic_size2(
        1920, 1080, Fraction(1), GeometrySettings(
            mode=ANAMORPHIC_NONE, width=1920, max_width=1280, modulus=2))
    assert w == 1280 and h == 720

    # custom PAR passes through
    w, h, p, _ = set_anamorphic_size2(
        720, 480, par, GeometrySettings(mode=ANAMORPHIC_CUSTOM, width=704,
                                        height=480, par_num=40,
                                        par_den=33))
    assert p == Fraction(40, 33) and (w, h) == (704, 480)


def test_get_preview_runs_filter_chain(tmp_path):
    """hb_get_preview3 analog renders a stored preview through the job's
    filters at output geometry (hb.c:1065)."""
    import numpy as np
    from handbrake_tpu import hb as hbmod
    from handbrake_tpu.job import schema as S

    W, H, N = 96, 64, 4
    p = tmp_path / "in.y4m"
    with open(p, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C420\n".encode())
        for i in range(N):
            f.write(b"FRAME\n")
            f.write(np.full((H, W), 60 + i, np.uint8).tobytes())
            f.write(np.full((H // 2, W // 2), 128, np.uint8).tobytes())
            f.write(np.full((H // 2, W // 2), 128, np.uint8).tobytes())
    h = hbmod.Handle()
    h.scan(str(p))
    titles = h.scan_wait(30)
    assert titles
    job = S.Job(title=1)
    job.filters.append(S.FilterSpec(S.FILTER_CROP_SCALE, {
        "width": 48, "height": 32, "crop-top": 0, "crop-bottom": 0,
        "crop-left": 0, "crop-right": 0}))
    y, u, v = h.get_preview(job, 0)
    assert y.shape == (32, 48)
    assert u.shape == (16, 24)
    h.close()
