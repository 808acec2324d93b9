"""Late-rising satellite handoff: a PRN absent at cold start appears
mid-capture; background re-acquisition adds it to the live tracking
state (the firmware's channel set is fixed at flash time)."""

import numpy as np

from stm32f4_sdr_gps_tpu.config import ReceiverConfig, TrackConfig
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture

CIB = 3


def test_late_rising_satellite_joins():
    E = 3000
    rise_epoch = 1200
    sat_a = SimSat(prn=5, doppler_hz=1200.0, code_phase_chips=300.0,
                   cn0_dbhz=47.0, codes_in_bit=CIB)
    sat_b = SimSat(prn=18, doppler_hz=-2400.0, code_phase_chips=700.0,
                   cn0_dbhz=47.0, codes_in_bit=CIB)
    xa, _ = simulate_capture([sat_a], num_epochs=E, seed=31)
    xb, truth_b = simulate_capture([sat_b], num_epochs=E, seed=32)
    spe = 2046
    xb[: rise_epoch * spe] = (
        np.random.default_rng(33).standard_normal(rise_epoch * spe)
        + 1j * np.random.default_rng(34).standard_normal(rise_epoch * spe)
    ).astype(np.complex64) * 0.0
    x = xa + xb

    cfg = ReceiverConfig(
        prns=(5, 18),
        track=TrackConfig(codes_in_bit=CIB,
                          pll_bad_state_threshold=10**9),
        enable_position=False,
        track_block_epochs=250,
        reacquire_period_ms=500,
    )
    rx = Receiver(cfg)
    report = rx.run(x)
    by = {ch.prn: ch for ch in report.channels}
    assert 5 in by and by[5].state_name == "TRACKING"
    assert 18 in by, "late riser was never added"
    assert by[18].state_name == "TRACKING"
    assert abs(by[18].doppler_hz + 2400.0) < 15.0
    # code phase should match the simulator truth for the late riser
    cp_true = truth_b.code_phase_at_epoch(0, report.epochs_processed - 1)
    err = (by[18].code_phase_chips - cp_true + 511.5) % 1023 - 511.5
    assert abs(err) < 0.5
    assert not rx.standby_channels


def test_setting_satellite_is_dropped_and_rejoins():
    """A satellite lost mid-capture is demoted to standby; when the
    signal returns it re-joins via background re-acquisition."""
    from stm32f4_sdr_gps_tpu.signal.simulator import inject_fault

    E = 4000
    sat_a = SimSat(prn=5, doppler_hz=1200.0, code_phase_chips=300.0,
                   cn0_dbhz=47.0, codes_in_bit=CIB)
    sat_b = SimSat(prn=18, doppler_hz=-2400.0, code_phase_chips=700.0,
                   cn0_dbhz=47.0, codes_in_bit=CIB)
    xa, _ = simulate_capture([sat_a], num_epochs=E, seed=41)
    xb, _ = simulate_capture([sat_b], num_epochs=E, seed=42)
    spe = 2046
    # PRN 18 vanishes between 1.0 s and 2.5 s (its samples only)
    xb[1000 * spe: 2500 * spe] = 0
    x = xa + xb

    cfg = ReceiverConfig(
        prns=(5, 18),
        track=TrackConfig(codes_in_bit=CIB,
                          pll_bad_state_threshold=10**9),
        enable_position=False,
        track_block_epochs=250,
        reacquire_period_ms=500,
    )
    rx = Receiver(cfg)
    report = rx.run(x)
    by = {ch.prn: ch for ch in report.channels}
    assert by[5].state_name == "TRACKING"
    # PRN 18 must have come back and locked to the right Doppler again
    assert 18 in by, "lost satellite never rejoined"
    assert abs(by[18].doppler_hz + 2400.0) < 15.0
