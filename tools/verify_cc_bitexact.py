"""TPU-vs-CPU bit-identity of the CC-kernel consumers (speckle + detect).

Runs filter_speckles and detect_objects on scene-like 720p inputs on the
default backend (TPU: Pallas cc_sweep kernel) and in a CPU subprocess (XLA
propagation path), and asserts byte-identical outputs. Integer math end to
end, so the comparison is exact (VERDICT round 2 item 5: on-hardware
accuracy evidence).
"""
import json
import os
import subprocess
import sys

import numpy as np


def compute(outfile):
    import jax

    # honor JAX_PLATFORMS even when sitecustomize config-forces a PJRT
    # plugin (same dance as bench.py/cli.py)
    _plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if _plat:
        jax.config.update("jax_platforms", _plat)
    import jax.numpy as jnp

    from rt_depth_map_tpu.ops.detect import detect_objects
    from rt_depth_map_tpu.ops.speckle import filter_speckles
    from rt_depth_map_tpu.config import MatcherConfig
    from rt_depth_map_tpu.ops.sgbm import stereo_sgbm
    from rt_depth_map_tpu.sources import SyntheticStereoSource

    W, H, D = 1280, 720, 128
    src = SyntheticStereoSource(W, H, seed=0)
    fl, frt = src.grab()
    L = jnp.asarray(fl.array[..., 0])
    R = jnp.asarray(frt.array[..., 0])
    nop = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                        num_paths=8, pre_filter_cap=0,
                        backend="xla",  # same disparity input on both hosts
                        speckle_window_size=0, disp12_max_diff=-1)
    disp = stereo_sgbm(L, R, nop)
    speck = filter_speckles(disp, -16, 100, 32 * 16)

    rng = np.random.default_rng(1)
    blobs = np.zeros((H, W), np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(12):
        cy, cx = rng.integers(40, H - 40), rng.integers(40, W - 40)
        ry, rx = rng.integers(8, 60), rng.integers(8, 60)
        blobs |= ((yy - cy) ** 2 / ry**2 + (xx - cx) ** 2 / rx**2 < 1
                  ).astype(np.uint8)
    boxes = detect_objects(jnp.asarray(blobs), 100, 16)

    np.savez(outfile, speck=np.asarray(speck), boxes=np.asarray(boxes),
             backend=str(jax.default_backend()))
    print(f"backend={jax.default_backend()} wrote {outfile}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--compute":
        compute(sys.argv[2])
        return
    here = os.path.dirname(os.path.abspath(__file__))
    dev_out = "/tmp/cc_bitexact_dev.npz"
    cpu_out = "/tmp/cc_bitexact_cpu.npz"
    me = os.path.abspath(__file__)
    subprocess.run([sys.executable, me, "--compute", dev_out], check=True,
                   cwd=os.path.dirname(here))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, me, "--compute", cpu_out], check=True,
                   env=env, cwd=os.path.dirname(here))
    a, b = np.load(dev_out), np.load(cpu_out)
    speck_eq = bool((a["speck"] == b["speck"]).all())
    boxes_eq = bool((a["boxes"] == b["boxes"]).all())
    report = {
        "device_backend": str(a["backend"]),
        "speckle_bit_identical": speck_eq,
        "detect_boxes_bit_identical": boxes_eq,
        "speckle_mismatches": int((a["speck"] != b["speck"]).sum()),
        "n_boxes": int((a["boxes"][:, 4] > 0).sum()),
    }
    print(json.dumps(report), flush=True)
    if not (speck_eq and boxes_eq):
        sys.exit(1)


if __name__ == "__main__":
    main()
