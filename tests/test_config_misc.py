"""Config persistence, metrics module, logging, engine health checks."""

import numpy as np
import pytest

from rt_depth_map_tpu.config import EngineConfig, MatcherConfig
from rt_depth_map_tpu.metrics import (
    bad_pixel_fraction,
    disparity_report,
    validity_difference,
)


def test_config_yaml_roundtrip(tmp_path):
    cfg = EngineConfig(
        width=640, height=480, number_of_disparities=96, object_color="blue",
        matcher=MatcherConfig(kind="sgm", num_paths=4, p2=999),
    )
    path = str(tmp_path / "engine.yml")
    cfg.save(path)
    back = EngineConfig.load(path)
    assert back == cfg
    assert back.matcher.p2 == 999


def test_metrics_bad_pixel():
    ref = np.full((10, 10), 160, np.int16)
    d = ref.copy()
    d[0, :5] = 160 + 32  # 2 px off -> bad
    d[1, :2] = -16  # invalid
    frac = bad_pixel_fraction(d, ref)
    assert abs(frac - 5 / 98) < 1e-9
    assert abs(validity_difference(d, ref) - 2 / 100) < 1e-9
    rep = disparity_report(d, ref)
    assert rep["valid_fraction"] == 0.98


def test_engine_stream_health_fault():
    from rt_depth_map_tpu.pipeline import Engine
    from rt_depth_map_tpu.sources.base import StereoFrame

    class DeadSource:
        width, height, rectified = 64, 48, True

        def grab(self):
            bad = StereoFrame(encoding="mjpeg", data=b"\xff\xd8junk")
            return bad, bad

        def close(self):
            pass

    cfg = EngineConfig(width=64, height=48, number_of_disparities=16,
                       matcher=MatcherConfig(num_disparities=16, block_size=5))
    eng = Engine(cfg, source=DeadSource())
    eng.max_consecutive_decode_failures = 5
    with pytest.raises(RuntimeError, match="unhealthy"):
        for _ in range(10):
            eng.step()


def test_distributed_init_noop_without_env(monkeypatch):
    from rt_depth_map_tpu.parallel.launch import distributed_init

    monkeypatch.delenv("RTDM_COORDINATOR", raising=False)
    assert distributed_init() is False
