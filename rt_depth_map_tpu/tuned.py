"""Apply hardware-tuned kernel knobs from a committed TUNED.env file.

The Pallas kernels read RTDM_* knobs (stripe heights, DMA block sizes,
window variants) from the environment at trace time; tools/tune_kb.py
sweeps them on the target hardware and prints a BEST line. Writing those
settings to `TUNED.env` at the repo root (KEY=VALUE lines, comments with
'#') makes them the defaults for the CLI and bench.py on this machine --
explicit environment variables always win. Every sweepable value is
bit-exactness-pinned in tests, so applying a TUNED.env can never change
output bits, only speed.
"""

from __future__ import annotations

import os

_ALLOWED_PREFIX = "RTDM_"


def apply_tuned_env(path: str | None = None) -> dict:
    """Load KEY=VALUE knob lines into os.environ (non-overriding).

    Only RTDM_* keys are honored. Returns the settings applied (empty when
    the file is missing). Search order: explicit path, $RTDM_TUNED_ENV,
    TUNED.env next to the repo root / current directory.
    """
    candidates = []
    if path:
        candidates.append(path)
    if os.environ.get("RTDM_TUNED_ENV"):
        candidates.append(os.environ["RTDM_TUNED_ENV"])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates += [os.path.join(here, "TUNED.env"), "TUNED.env"]

    applied = {}
    for cand in candidates:
        if not os.path.isfile(cand):
            continue
        with open(cand) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, val = line.partition("=")
                key, val = key.strip(), val.strip()
                if not key.startswith(_ALLOWED_PREFIX):
                    continue
                if val in ("", "None"):
                    continue
                if key not in os.environ:  # explicit env wins
                    os.environ[key] = val
                    applied[key] = val
        break
    return applied
