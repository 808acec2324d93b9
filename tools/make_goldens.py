"""Regenerate the golden regression vectors (tests/goldens/).

Run after an *intentional* behavior change:
    JAX_PLATFORMS=cpu python tools/make_goldens.py
The goldens pin end-to-end outputs — decoded subframe bits exactly,
acquisition/tracking estimates to tolerance — so refactors that silently
change receiver behavior fail tests/test_goldens.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_receiver import _make_capture, CIB, PRNS  # noqa: E402
from stm32f4_sdr_gps_tpu.config import (  # noqa: E402
    ReceiverConfig,
    TrackConfig,
)
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver  # noqa: E402

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "receiver_golden.npz",
)


def build():
    num_epochs = 120 * CIB + 4 * 300 * CIB + 400
    x, truth = _make_capture(num_epochs, seed=11)
    cfg = ReceiverConfig(
        prns=PRNS,
        track=TrackConfig(codes_in_bit=CIB,
                          pll_bad_state_threshold=10**9),
        enable_position=False,
        track_block_epochs=500,
    )
    rx = Receiver(cfg)
    rx.run(x)
    out = {}
    for ch in rx.channels:
        p = ch.prn
        out[f"dop_{p}"] = np.float64(ch.doppler_hz)
        out[f"cp_{p}"] = np.float64(ch.code_phase_chips)
        out[f"sft_{p}"] = np.int64(ch.subframe_time_ms)
        out[f"tow_{p}"] = np.float64(ch.subframe_tow_s)
        out[f"mask_{p}"] = np.int64(ch.eph.received_mask_proc)
        out[f"cn0_{p}"] = np.float64(ch.cn0_dbhz)
        # exact ephemeris field fingerprint
        out[f"eph_{p}"] = np.array([
            ch.eph.week, ch.eph.iode, ch.eph.iodc,
        ], dtype=np.int64)
        out[f"ephf_{p}"] = np.array([
            ch.eph.A, ch.eph.e, ch.eph.M0, ch.eph.OMG0, ch.eph.i0,
            ch.eph.omg, ch.eph.f0, ch.eph.tgd, ch.eph.toes,
        ], dtype=np.float64)
    return out


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **build())
    print(f"wrote {GOLDEN_PATH}")
