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
    from stm32f4_sdr_gps_tpu.pvt.gpstime import gpst2time, timeadd
    from stm32f4_sdr_gps_tpu.pvt.ephpos import eph2clk, ephpos
    from stm32f4_sdr_gps_tpu.pvt.solve import pos2ecef, geodist

    rr_true = pos2ecef(np.array([np.radians(51.5), np.radians(-0.1), 80.0]))
    # (M0, OMG0) giving elevations ~84/56/49/44 deg at spread azimuths —
    # a mix of high and low satellites keeps the clock/height axes of
    # the solve well conditioned.
    geom = [(1.5, 4.65), (0.5, 0.52), (2.0, 3.62), (1.5, 3.62)]
    prns = (2, 7, 15, 24)
    start_tow_6s = int(TOE + 60) // 6
    prefix_bits = 100
    # Bit 0 of the stream leaves the satellite prefix+300 bits before the
    # TOW that labels subframe 1's end boundary; capture t=0 aligns with
    # that transmit time, so GPS time at capture time T is
    # start_tow*6 - (prefix+300)*0.02 + T.
    t_gps0 = gpst2time(
        WEEK, start_tow_6s * 6.0 - (prefix_bits + 300) * 0.020
    )

    lam_l1 = CLIGHT / 1.57542e9
    sats, eph_map = [], {}
    for prn, (m0, omg0) in zip(prns, geom):
        eph = make_eph(prn, M0=m0, OMG0=omg0)
        # broadcast message must carry EXACTLY the planted ephemeris so
        # the decoded orbit matches the geometry the delays came from
        d = dict(
            week=WEEK, iodc=57, iode=57, sva=eph.sva, svh=0,
            tgd=eph.tgd, toc_s=TOE, f0=eph.f0, f1=eph.f1, f2=eph.f2,
            crs=eph.crs, deln=eph.deln, M0=eph.M0, cuc=eph.cuc,
            e=eph.e, cus=eph.cus, A=eph.A, toes=TOE, fit=0,
            cic=eph.cic, OMG0=eph.OMG0, cis=eph.cis, i0=eph.i0,
            crc=eph.crc, omg=eph.omg, OMGd=eph.OMGd, idot=eph.idot,
        )
        # 100-bit alternating run-in gives bit sync time before the
        # sacrificial subframe-5 TLM (which resolves polarity) arrives
        prefix = np.tile([0, 1], prefix_bits // 2).astype(np.int8)
        body = build_bitstream(d, start_tow_6s=start_tow_6s - 1,
                               num_subframes=5,
                               subframe_ids=(5, 1, 2, 3, 4))
        bits = np.concatenate([prefix, body])

        # TOF of the signal arriving at capture t=0, with satellite
        # clock advance; iterate the transmit time.
        delay_s = 0.070
        for _ in range(3):
            t_tx = timeadd(t_gps0, -delay_s)
            rs, dts, _, _ = ephpos(t_tx, eph)
            rng_m, e = geodist(rs, rr_true)
            delay_s = rng_m / CLIGHT - dts[0]
        # Doppler from the true range rate so the simulator's
        # code-Doppler drift reproduces the physical TOF evolution over
        # the capture (delay_eff(t) = delay - (fd/fL1) t = delay + rdot t/c)
        rdot = float(np.dot(rs[3:], e))
        dop = -rdot / lam_l1
        sats.append(
            SimSat(prn=prn, doppler_hz=float(dop), cn0_dbhz=cn0,
                   nav_bits=bits, delay_ms=float(delay_s * 1000.0))
        )
        eph_map[prn] = eph
    x, truth = simulate_capture(sats, num_epochs=num_epochs, seed=seed)
    return x, truth, rr_true, eph_map, prns


@slow
def test_full_cold_start_to_fix():
    # 2s run-in + 5 subframes (30s) + margin for the post-decode solve
    num_epochs = 29_000
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
