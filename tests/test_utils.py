"""Observability utilities."""

import json

from srhmm_tpu.utils import EventLog, Throughput


def test_event_log_jsonl(tmp_path, capsys):
    log = EventLog(tmp_path / "ev.jsonl", echo=False)
    log.emit("hello", a=1)
    with log.span("work", tag="x"):
        pass
    log.close()
    lines = [json.loads(l) for l in (tmp_path / "ev.jsonl").read_text().splitlines()]
    assert lines[0]["event"] == "hello" and lines[0]["a"] == 1
    assert lines[1]["event"] == "work" and "seconds" in lines[1]


def test_throughput_counters():
    tp = Throughput(frame_shift_s=0.01)
    tp.add(num_frames=1000, seconds=0.5)
    assert abs(tp.frames_per_sec - 2000) < 1e-9
    assert abs(tp.audio_seconds_per_sec - 20.0) < 1e-9
    assert abs(tp.rtf - 0.05) < 1e-9
