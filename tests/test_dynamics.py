"""Tracking under satellite dynamics (Doppler ramp).

A real GPS line-of-sight accelerates at up to ~0.9 Hz/s of Doppler rate;
the FLL/PLL must follow the ramp and carrier-aided code tracking must
keep the code phase aligned with the chirped code rate.
"""

import jax.numpy as jnp
import numpy as np

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture
from stm32f4_sdr_gps_tpu.track.scan import track_block
from stm32f4_sdr_gps_tpu.track.state import init_state

PLAN = BASEBAND_PLAN


def _phase_err(a, b):
    return (a - b + 511.5) % 1023.0 - 511.5


def test_tracks_doppler_ramp():
    rate = 0.9  # Hz/s — worst-case GPS geometry
    sat = SimSat(prn=14, doppler_hz=-1000.0, code_phase_chips=200.0,
                 cn0_dbhz=46.0, doppler_rate_hz_s=rate)
    E = 4000  # 4 s => 3.6 Hz of total Doppler change
    x, truth = simulate_capture([sat], num_epochs=E, seed=12)
    table = jnp.asarray(ca_table_bipolar([14]))
    st = init_state(1, np.array([200.2]), np.array([-980.0]))
    st, outs = track_block(st, jnp.asarray(x.reshape(E, 2046)), table,
                           PLAN, TrackConfig())
    dop = np.asarray(outs.doppler_hz)[:, 0]
    cp = np.asarray(outs.code_phase_chips)[:, 0]
    # Doppler follows the ramp: check at several times
    for e in (1000, 2000, 3900):
        want = -1000.0 + rate * (e / 1000.0)
        assert abs(np.mean(dop[e - 50: e + 50]) - want) < 5.0, e
    # code phase stays aligned with the chirped truth
    errs = [_phase_err(cp[e], truth.code_phase_at_epoch(0, e))
            for e in range(E - 200, E)]
    assert np.max(np.abs(errs)) < 0.3


def test_simulator_chirp_truth_consistency():
    """Chirp bookkeeping: code phase drift equals the Doppler integral
    scaled by the code/carrier ratio."""
    sat = SimSat(prn=4, doppler_hz=2000.0, code_phase_chips=0.0,
                 cn0_dbhz=60.0, doppler_rate_hz_s=0.5)
    _, truth = simulate_capture([sat], num_epochs=2, seed=0)
    t = 1e-3
    dop_int = 2000.0 * t + 0.25 * t * t
    want = (1.023e6 * (t + dop_int / 1.57542e9)) % 1023
    got = truth.code_phase_at_epoch(0, 1)
    assert abs(got - want) < 1e-9


def test_tracking_survives_signal_dropout():
    """A 40 ms blockage (zeroed samples) must not break lock: the loops
    coast on zero discriminators and re-converge (failure-recovery
    capability class of SURVEY.md §5)."""
    from stm32f4_sdr_gps_tpu.signal.simulator import inject_fault
    from stm32f4_sdr_gps_tpu.config import TrackConfig

    sat = SimSat(prn=6, doppler_hz=1500.0, code_phase_chips=100.0,
                 cn0_dbhz=46.0)
    E = 2000
    x, truth = simulate_capture([sat], num_epochs=E, seed=7)
    x = inject_fault(x, start_ms=800.0, duration_ms=40.0, mode="dropout")
    st = init_state(1, np.array([100.1]), np.array([1510.0]))
    st, outs = track_block(
        st, jnp.asarray(x.reshape(E, 2046)),
        jnp.asarray(ca_table_bipolar([6])), PLAN, TrackConfig(),
    )
    dop = np.asarray(outs.doppler_hz)[:, 0]
    cp = np.asarray(outs.code_phase_chips)[:, 0]
    assert abs(np.mean(dop[-200:]) - 1500.0) < 10.0
    err = _phase_err(cp[-1], truth.code_phase_at_epoch(0, E - 1))
    assert abs(err) < 0.3


def test_tracking_survives_noise_burst():
    from stm32f4_sdr_gps_tpu.signal.simulator import inject_fault
    from stm32f4_sdr_gps_tpu.config import TrackConfig

    sat = SimSat(prn=6, doppler_hz=-700.0, code_phase_chips=512.0,
                 cn0_dbhz=46.0)
    E = 2000
    x, truth = simulate_capture([sat], num_epochs=E, seed=8)
    x = inject_fault(x, start_ms=900.0, duration_ms=60.0, mode="noise",
                     seed=1)
    st = init_state(1, np.array([512.1]), np.array([-690.0]))
    st, outs = track_block(
        st, jnp.asarray(x.reshape(E, 2046)),
        jnp.asarray(ca_table_bipolar([6])), PLAN, TrackConfig(),
    )
    dop = np.asarray(outs.doppler_hz)[:, 0]
    cp = np.asarray(outs.code_phase_chips)[:, 0]
    assert abs(np.mean(dop[-200:]) + 700.0) < 10.0
    err = _phase_err(cp[-1], truth.code_phase_at_epoch(0, E - 1))
    assert abs(err) < 0.3
