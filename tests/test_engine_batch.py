"""Engine.step_batch parity: each batched frame must equal Engine.step."""

import numpy as np
import pytest

from rt_depth_map_tpu.config import EngineConfig, MatcherConfig
from rt_depth_map_tpu.pipeline import Engine
from rt_depth_map_tpu.sources import SyntheticStereoSource


@pytest.mark.parametrize("kind", ["bm", "sgm"])
def test_step_batch_matches_step(kind):
    W, H, B = 192, 64, 2
    mcfg = MatcherConfig(
        kind=kind, num_disparities=32, block_size=9 if kind == "bm" else 5,
        speckle_window_size=20, speckle_range=32, disp12_max_diff=1,
    )
    src = SyntheticStereoSource(W, H, seed=3)
    cfg = EngineConfig(width=W, height=H, number_of_disparities=32,
                       matcher=mcfg, batch=B)
    eng = Engine(cfg, source=src)
    ref_eng = Engine(cfg.replace(batch=1), source=SyntheticStereoSource(
        W, H, seed=3))

    frames = [src.render(i)[:2] for i in range(B)]
    out = eng._step_batch(
        np.stack([f[0] for f in frames]),
        np.stack([f[1] for f in frames]),
        np.asarray(eng.hsv_low), np.asarray(eng.hsv_high),
        np.int32(eng.min_object_size),
    )
    # pipelined multi-stream mode (the production default): B independent
    # single-frame dispatches -- must agree with both the fused batch
    # program and the per-frame reference
    assert eng.batch_mode == "pipelined"
    piped = eng.process_batch(
        np.stack([f[0] for f in frames]), np.stack([f[1] for f in frames])
    )
    for b in range(B):
        ref = ref_eng._step(
            frames[b][0], frames[b][1],
            np.asarray(eng.hsv_low), np.asarray(eng.hsv_high),
            np.int32(eng.min_object_size),
        )
        for key in ("disparity", "depth_cm", "count", "boxes"):
            np.testing.assert_array_equal(
                np.asarray(out[key][b]), np.asarray(ref[key]),
                err_msg=f"{kind} frame {b} key {key}",
            )
            np.testing.assert_array_equal(
                np.asarray(getattr(piped[b], key)), np.asarray(ref[key]),
                err_msg=f"{kind} pipelined frame {b} key {key}",
            )
