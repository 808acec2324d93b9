"""Streaming-soak smoke: ring -> paced producer -> receiver, short.

The full 5-minute soak lives in tools/soak.py (round-5 result: 300 s of
wire capture at 2.0x real time, zero dropped epochs, 410 fixes).  This
keeps the ring/pacing/drop-accounting logic covered in CI with a 6 s
capture at a modest pace.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def test_soak_smoke(tmp_path):
    from stm32f4_sdr_gps_tpu.runtime import native

    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "soak.py"),
         "--capture-s", "6", "--rate-x", "1.0", "--ring-ms", "3000",
         "--block-epochs", "500",
         "--state-dir", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["dropped_epochs"] == 0
    assert out["consumed_epochs"] >= 5500
    assert out["channels_tracking"] == 4
