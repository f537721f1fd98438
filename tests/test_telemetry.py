import json
import os
import time

from openvision_tpu.train.chrono import Chrono
from openvision_tpu.train.metrics import MetricWriter


def test_chrono_throughput_accounting():
    c = Chrono()
    c.warmup_iters = 0
    c.inform(total_steps=100, global_bs=64, steps_per_epoch=10)
    c.tick(1)
    time.sleep(0.05)
    m = c.tick(2)
    assert "img/sec/core" in m and m["img/sec/core"] > 0
    assert m["examples_seen"] == 128
    assert abs(m["epoch"] - 0.2) < 1e-9
    assert "core_hours" in m

    # paused time is excluded
    c.pause()
    time.sleep(0.05)
    c.resume()
    m2 = c.tick(3)
    assert m2["img/sec/core"] > 0

    state = c.save()
    c2 = Chrono()
    c2.load(state)
    assert c2.accum_train_time == c.accum_train_time


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), config={"a": 1})
    w.step_start(1)
    w.measure("loss", 0.5)
    w.step_start(2)
    w.measure("loss", 0.25)
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows == [{"step": 1, "loss": 0.5}, {"step": 2, "loss": 0.25}]
    assert json.load(open(tmp_path / "config.json")) == {"a": 1}
