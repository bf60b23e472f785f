"""Core substrate tests: buffers, fifos, pipeline threading."""
import threading
import time

import numpy as np
import pytest

from handbrake_tpu.core.buffer import Buffer, BufFlags, FrameType, YUV420P
from handbrake_tpu.core.fifo import Fifo
from handbrake_tpu.core.pipeline import (FilterObject, Pipeline, WorkObject)


def test_buffer_frame_alloc():
    b = Buffer.frame(YUV420P, 64, 48)
    assert b.width == 64 and b.height == 48
    assert b.planes[0].shape == (48, 64)
    assert b.planes[1].shape == (24, 32)
    assert int(b.planes[0][0, 0]) == 16 and int(b.planes[1][0, 0]) == 128


def test_buffer_copy_props():
    a = Buffer(pts=100, stop=200, duration=100, frametype=FrameType.IDR,
               side_data={"dovi_rpu": b"\x01"}, new_chap=3)
    b = Buffer().copy_props(a)
    assert b.pts == 100 and b.frametype == FrameType.IDR
    assert b.side_data["dovi_rpu"] == b"\x01" and b.new_chap == 3
    b.side_data["x"] = 1
    assert "x" not in a.side_data  # deep-enough copy


def test_fifo_order_and_blocking():
    f = Fifo(capacity=2)
    assert f.push(Buffer(pts=1)) and f.push(Buffer(pts=2))
    got = []
    t = threading.Thread(target=lambda: got.append(f.push(Buffer(pts=3))))
    t.start()
    time.sleep(0.05)
    assert t.is_alive()  # blocked on full fifo
    assert f.get().pts == 1
    t.join(1.0)
    assert got == [True]
    assert [f.get().pts for _ in range(2)] == [2, 3]


def test_fifo_close_wakes_getter():
    f = Fifo()
    out = []
    t = threading.Thread(target=lambda: out.append(f.get()))
    t.start()
    time.sleep(0.05)
    f.close()
    t.join(1.0)
    assert out == [None]


class _Source(WorkObject):
    name = "src"
    def __init__(self, n):
        super().__init__()
        self.n = n
    def generate(self):
        for i in range(self.n):
            yield Buffer(pts=i * 3000, duration=3000)
        yield Buffer.eof()


class _Double(FilterObject):
    name = "double"
    def work(self, buf):
        out = Buffer(pts=buf.pts, duration=buf.duration)
        out.side_data["doubled"] = True
        return [out]


class _Sink(WorkObject):
    name = "sink"
    def __init__(self):
        super().__init__()
        self.got = []
    def work(self, buf):
        if not buf.is_eof():
            self.got.append(buf)
        return []


def test_pipeline_end_to_end():
    p = Pipeline()
    src, sink = _Source(10), _Sink()
    f1 = p.make_fifo(4)
    f2 = p.make_fifo(4)
    src.fifo_out = f1
    sink.fifo_in = f2
    p.add_work(src)
    p.add_filter(_Double({}), f1, f2)
    p.add_work(sink)
    p.run()
    assert p.error is None
    assert len(sink.got) == 10
    assert all(b.side_data.get("doubled") for b in sink.got)
    assert [b.pts for b in sink.got] == [i * 3000 for i in range(10)]


class _Boom(FilterObject):
    name = "boom"
    def work(self, buf):
        raise RuntimeError("kernel exploded")


def test_pipeline_stage_failure_propagates():
    p = Pipeline()
    src, sink = _Source(100000), _Sink()
    f1, f2 = p.make_fifo(4), p.make_fifo(4)
    src.fifo_out, sink.fifo_in = f1, f2
    p.add_work(src)
    p.add_filter(_Boom({}), f1, f2)
    p.add_work(sink)
    p.run()
    assert isinstance(p.error, RuntimeError)


class _ChapterDropper(FilterObject):
    """Drops every other frame — chapter marks must carry to next output."""
    name = "dropper"
    def __init__(self):
        super().__init__({})
        self.i = 0
    def work(self, buf):
        self.i += 1
        if self.i % 2 == 1:
            return []   # dropped
        return [Buffer(pts=buf.pts)]


def test_chapter_mark_carry():
    p = Pipeline()

    class ChapSource(WorkObject):
        def generate(self):
            for i in range(6):
                b = Buffer(pts=i)
                if i == 2:
                    b.new_chap = 1   # lands on a dropped frame (i=2 → 3rd)
                yield b
            yield Buffer.eof()

    src, sink = ChapSource(), _Sink()
    f1, f2 = p.make_fifo(4), p.make_fifo(4)
    src.fifo_out, sink.fifo_in = f1, f2
    p.add_work(src)
    p.add_filter(_ChapterDropper(), f1, f2)
    p.add_work(sink)
    p.run()
    assert sum(b.new_chap for b in sink.got) == 1
