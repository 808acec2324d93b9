"""Full-scale end-to-end test: real 20 ms nav bits, position fix.

~26 s of 4-satellite IQ at 2.046 MHz with geometrically consistent
delays derived from a planted receiver position — the complete
BASELINE.json pipeline through to a PVT solution.  Takes minutes on the
CPU test mesh, so it is gated behind RUN_SLOW=1 (the bench path runs the
same flow on the TPU).
"""

import os

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="set RUN_SLOW=1 to run"
)

from stm32f4_sdr_gps_tpu.config import (
    AcqConfig,
    CLIGHT,
    ReceiverConfig,
    TrackConfig,
)
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver
from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture

from tests.test_nav import TEST_EPH
from tests.test_pvt import make_eph, WEEK, TOE


def build_scenario(num_epochs: int, cn0=48.0, seed=21):
    """4 satellites with TOFs from real geometry at the planted position.

    Returns (samples, truth, rr_true, eph_map, prns).
    """
    from stm32f4_sdr_gps_tpu.pvt.gpstime import gpst2time
    from stm32f4_sdr_gps_tpu.pvt.ephpos import eph2pos
    from stm32f4_sdr_gps_tpu.pvt.solve import ecef2pos, pos2ecef, geodist

    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    geom = [(1.5, 4.65), (1.0, 5.17), (0.5, 0.0), (1.5, 4.13)]
    prns = (2, 7, 15, 24)
    start_tow_6s = int(TOE + 60) // 6

    # Transmit-time TOW of the first bit of subframe 1 in the stream.
    t0 = gpst2time(WEEK, start_tow_6s * 6.0)

    sats, eph_map = [], {}
    for prn, (m0, omg0) in zip(prns, geom):
        eph = make_eph(prn, M0=m0, OMG0=omg0)
        # field-accurate ephemeris must round-trip the LNAV encoding, so
        # rebuild the broadcast dict from the canonical test ephemeris
        # but with this satellite's geometry
        d = dict(TEST_EPH)
        d.update(M0=m0, OMG0=omg0, iode=eph.iode or 57, toes=TOE,
                 toc_s=TOE)
        # leading subframe 5 sacrificially resolves polarity
        bits = build_bitstream(d, start_tow_6s=start_tow_6s - 1,
                               num_subframes=5,
                               subframe_ids=(5, 1, 2, 3, 4))
        pos, dts, _ = eph2pos(t0, eph)
        rng_m, _ = geodist(np.concatenate([pos, np.zeros(3)]), rr_true)
        delay = rng_m / CLIGHT * 1000.0 - dts * 1000.0  # ms, incl sat clock
        dop = -800.0 + 700.0 * len(sats)  # plausible doppler spread
        sats.append(
            SimSat(prn=prn, doppler_hz=dop, cn0_dbhz=cn0, nav_bits=bits,
                   delay_ms=float(delay))
        )
        # decode target: eph fields as the receiver will decode them
        eph_map[prn] = eph
    x, truth = simulate_capture(sats, num_epochs=num_epochs, seed=seed)
    return x, truth, rr_true, eph_map, prns


@slow
def test_full_cold_start_to_fix():
    num_epochs = 26_000
    x, truth, rr_true, eph_map, prns = build_scenario(num_epochs)
    cfg = ReceiverConfig(
        prns=prns,
        acq=AcqConfig(),
        track=TrackConfig(),
        track_block_epochs=1000,
    )
    rx = Receiver(cfg)
    report = rx.run(x)
    for ch in report.channels:
        assert ch.eph.has_full_set, ch.prn
    assert report.solutions, "no position fix obtained"
    sol = report.solutions[-1]
    err = np.linalg.norm(sol.rr - rr_true)
    # relative pseudoranges carry tracking noise (~0.05 chip ≈ 15 m UERE)
    assert err < 500.0, f"position error {err:.1f} m"
