"""8-channel full-receiver decode (compressed time): every live channel
frames subframes and decodes ephemeris concurrently — the multi-channel
framing load the 4-channel tests don't exercise."""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.config import ReceiverConfig, TrackConfig
from stm32f4_sdr_gps_tpu.io.status import render_status
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver
from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture

from tests.test_nav import TEST_EPH

CIB = 3
PRNS = (1, 4, 8, 11, 16, 21, 27, 31)


@pytest.mark.parametrize("seed", [5])
def test_eight_channels_decode(seed):
    prefix = np.tile([0, 1], 60).astype(np.int8)
    rng = np.random.default_rng(seed)
    sats = []
    for i, prn in enumerate(PRNS):
        body = build_bitstream(dict(TEST_EPH), start_tow_6s=58800,
                               num_subframes=4, subframe_ids=(5, 1, 2, 3))
        sats.append(SimSat(
            prn=prn,
            doppler_hz=float(rng.uniform(-6000, 6000)),
            cn0_dbhz=46.0,
            nav_bits=np.concatenate([prefix, body]),
            codes_in_bit=CIB,
            delay_ms=float(rng.uniform(1.0, 20.0)),
        ))
    num_epochs = 120 * CIB + 4 * 300 * CIB + 400
    x, _ = simulate_capture(sats, num_epochs=num_epochs, seed=seed)
    cfg = ReceiverConfig(
        prns=PRNS,
        track=TrackConfig(codes_in_bit=CIB, pll_bad_state_threshold=10**9),
        enable_position=False,
        track_block_epochs=500,
    )
    rx = Receiver(cfg)
    report = rx.run(x)
    assert len(report.channels) == 8
    full = [ch.prn for ch in report.channels
            if (ch.eph.received_mask_proc & 0x7) == 0x7]
    assert len(full) >= 7, (full, render_status(rx))
    for ch in report.channels:
        assert abs(ch.eph.A - TEST_EPH["A"]) < 1.0 or ch.prn not in full
    # the dashboard shows the decoded UTC clock once eph time is known
    assert "EPH UTC" in render_status(rx)
