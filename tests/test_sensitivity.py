"""Sensitivity characterization: behavior across C/N0 ("within its SNR
bound", BASELINE.md correctness row) + CLI smoke."""

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.config import AcqConfig, BASEBAND_PLAN, TrackConfig
from stm32f4_sdr_gps_tpu.acquire.engine import acquire
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture


def test_acquisition_detects_down_to_36dbhz():
    """10 non-coherent epochs: reliable detection at 36 dBHz."""
    hits = 0
    for seed in range(5):
        sat = SimSat(prn=23, doppler_hz=1234.0, code_phase_chips=321.0,
                     cn0_dbhz=36.0)
        x, _ = simulate_capture([sat], num_epochs=10, seed=seed)
        r = acquire(x, [23], BASEBAND_PLAN, AcqConfig())[0]
        hits += int(r.detected and abs(r.doppler_hz - 1234.0) < 300)
    assert hits >= 4, hits


def test_acquisition_no_false_alarms_across_seeds():
    for seed in range(6):
        x, _ = simulate_capture(
            [SimSat(prn=1, doppler_hz=0.0, cn0_dbhz=45.0)],
            num_epochs=10, seed=100 + seed)
        r = acquire(x, [22], BASEBAND_PLAN, AcqConfig())[0]
        assert not r.detected, (seed, r.peak_ratio)


def test_more_integration_helps_weak_signals():
    """At 33 dBHz, 10 epochs is unreliable but 40 epochs detects —
    non-coherent integration gain."""
    sat = SimSat(prn=6, doppler_hz=-800.0, code_phase_chips=101.0,
                 cn0_dbhz=33.0)
    x, _ = simulate_capture([sat], num_epochs=40, seed=3)
    r40 = acquire(x, [6], BASEBAND_PLAN,
                  AcqConfig(noncoherent_epochs=40))[0]
    assert r40.detected
    assert abs(r40.doppler_hz + 800.0) < 300.0


def test_tracking_holds_lock_at_38dbhz():
    import jax.numpy as jnp

    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.track.scan import track_block
    from stm32f4_sdr_gps_tpu.track.state import init_state

    sat = SimSat(prn=9, doppler_hz=900.0, code_phase_chips=400.0,
                 cn0_dbhz=38.0)
    E = 1500
    x, truth = simulate_capture([sat], num_epochs=E, seed=4)
    st = init_state(1, np.array([400.2]), np.array([915.0]))
    st, outs = track_block(
        st, jnp.asarray(x.reshape(E, 2046)),
        jnp.asarray(ca_table_bipolar([9])), BASEBAND_PLAN, TrackConfig()
    )
    dop = np.asarray(outs.doppler_hz)[:, 0]
    cp = np.asarray(outs.code_phase_chips)[:, 0]
    assert abs(np.mean(dop[-200:]) - 900.0) < 10.0
    err = (cp[-1] - truth.code_phase_at_epoch(0, E - 1) + 511.5) % 1023 - 511.5
    assert abs(err) < 0.5


def test_cli_acquire_smoke(tmp_path):
    from stm32f4_sdr_gps_tpu.__main__ import main

    sat = SimSat(prn=17, doppler_hz=2500.0, code_phase_chips=50.0,
                 cn0_dbhz=46.0)
    x, _ = simulate_capture([sat], num_epochs=12, seed=5)
    cap = str(tmp_path / "cap.npy")
    np.save(cap, x)
    rc = main(["acquire", cap, "--prns", "15-20", "--epochs", "10"])
    assert rc == 0


def test_cli_simulate_and_run_smoke(tmp_path, capsys):
    from stm32f4_sdr_gps_tpu.__main__ import main

    cap = str(tmp_path / "sim.npy")
    assert main(["simulate", "--out", cap, "--seconds", "1.5",
                 "--sat", "7:1500:47:68.1"]) == 0
    assert main(["run", cap, "--prns", "7"]) == 0
    out = capsys.readouterr().out
    assert "TRACKING" in out


def test_weak_signal_preset_tracks_29dbhz():
    """WEAK_SIGNAL_TRACK holds lock at 29 dBHz where the firmware-gain
    default degrades — a capability beyond the reference."""
    import jax.numpy as jnp

    from stm32f4_sdr_gps_tpu.config import WEAK_SIGNAL_TRACK
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.track.scan import track_block
    from stm32f4_sdr_gps_tpu.track.state import init_state

    sat = SimSat(prn=9, doppler_hz=900.0, code_phase_chips=400.0,
                 cn0_dbhz=29.0)
    E = 3000
    x, truth = simulate_capture([sat], num_epochs=E, seed=4)
    st = init_state(1, np.array([400.2]), np.array([905.0]))
    st, outs = track_block(
        st, jnp.asarray(x.reshape(E, 2046)),
        jnp.asarray(ca_table_bipolar([9])), BASEBAND_PLAN,
        WEAK_SIGNAL_TRACK,
    )
    dop = np.asarray(outs.doppler_hz)[:, 0]
    cp = np.asarray(outs.code_phase_chips)[:, 0]
    assert abs(np.mean(dop[-300:]) - 900.0) < 8.0
    err = (cp[-1] - truth.code_phase_at_epoch(0, E - 1) + 511.5) % 1023 - 511.5
    assert abs(err) < 0.3


def test_deep_acquisition_coherent_gain():
    """DEEP_ACQ (4 ms coherent spans + matched 100 Hz grid) detects at
    31 dBHz where the same integration applied non-coherently fails —
    verifying the inter-epoch phasor compensation."""
    from stm32f4_sdr_gps_tpu.config import DEEP_ACQ

    sat = SimSat(prn=5, doppler_hz=1730.0, code_phase_chips=512.0,
                 cn0_dbhz=31.0)
    x, _ = simulate_capture([sat], num_epochs=60, seed=2)
    nc = AcqConfig(noncoherent_epochs=60, doppler_step_hz=100.0)
    r_nc = acquire(x, [5], BASEBAND_PLAN, nc)[0]
    r_co = acquire(x, [5], BASEBAND_PLAN, DEEP_ACQ)[0]
    assert not r_nc.detected
    assert r_co.detected
    assert abs(r_co.doppler_hz - 1730.0) < 150.0
    assert abs(r_co.code_phase_chips - 512.0) < 1.0


def test_ultra_acq_detects_28dbhz_with_edge_hypotheses():
    """Full-bit coherent acquisition (ULTRA_ACQ): 20 ms spans with
    bit-edge hypotheses detect at 28 dBHz where DEEP_ACQ fails, with
    exact code phase and ~2 Hz Doppler; pure noise stays undetected."""
    import dataclasses

    from stm32f4_sdr_gps_tpu.config import DEEP_ACQ, ULTRA_ACQ

    ultra = dataclasses.replace(ULTRA_ACQ, doppler_span_hz=2000.0)
    deep = dataclasses.replace(DEEP_ACQ, doppler_span_hz=2000.0)
    rng = np.random.default_rng(0)
    sat = SimSat(prn=17, doppler_hz=1200.0, code_phase_chips=300.0,
                 cn0_dbhz=28.0, codes_in_bit=20,
                 nav_bits=list(rng.integers(0, 2, 40)))
    x, _ = simulate_capture([sat], num_epochs=130, seed=1)
    ru = acquire(x, [17], cfg=ultra)[0]
    rd = acquire(x, [17], cfg=deep)[0]
    assert ru.detected and ru.peak_ratio > 2.0
    assert abs(ru.doppler_hz - 1200.0) < 10.0
    assert abs(ru.code_phase_chips - 300.0) < 0.5
    assert not rd.detected  # 4 ms spans are not enough at 28 dBHz

    noise = (np.random.default_rng(10).standard_normal(130 * 2046)
             + 1j * np.random.default_rng(110).standard_normal(130 * 2046)
             ).astype(np.complex64)
    rn = acquire(noise, [17], cfg=ultra)[0]
    assert not rn.detected
