"""Pallas fused E/P/L kernel vs the jnp reference path (interpret mode
on the CPU test mesh; the TPU-native run is covered by bench.py)."""

import jax.numpy as jnp
import numpy as np

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
from stm32f4_sdr_gps_tpu.ops.correlate import epl_correlate
from stm32f4_sdr_gps_tpu.ops.pallas_epl import (
    epl_correlate_pallas,
    upsampled_code_doubled,
)
from stm32f4_sdr_gps_tpu.ops.replica import sample_replicas
from stm32f4_sdr_gps_tpu.ops.wipeoff import carrier_wipeoff
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture
from stm32f4_sdr_gps_tpu.track.scan import track_block
from stm32f4_sdr_gps_tpu.track.state import init_state

PLAN = BASEBAND_PLAN


def _reference_epl(x, table, cp, dop, ph):
    c = len(cp)
    freq = jnp.full(c, PLAN.chips_per_sample, jnp.float32)
    reps = sample_replicas(jnp.asarray(table), jnp.asarray(cp), freq,
                           2046, (-0.5, 0.0, 0.5))
    y, _ = carrier_wipeoff(jnp.asarray(x), jnp.asarray(dop),
                           jnp.asarray(ph), PLAN.sample_rate_hz)
    return np.asarray(epl_correlate(y, reps))


def test_kernel_matches_reference_random_phases():
    rng = np.random.default_rng(0)
    table = ca_table_bipolar([3, 11, 27, 31])
    u2 = jnp.asarray(upsampled_code_doubled(table))
    x = (rng.standard_normal(2046) + 1j * rng.standard_normal(2046)
         ).astype(np.complex64)
    cp = rng.uniform(0, 1023, 4).astype(np.float32)
    dop = rng.uniform(-5000, 5000, 4).astype(np.float32)
    ph = rng.uniform(0, 1, 4).astype(np.float32)
    ref = _reference_epl(x, table, cp, dop, ph)
    got = np.asarray(
        epl_correlate_pallas(jnp.asarray(x), u2, jnp.asarray(cp),
                             jnp.asarray(dop), jnp.asarray(ph),
                             PLAN.sample_rate_hz, interpret=True)
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_kernel_wrap_boundaries():
    """Code phases at the wrap edges exercise the 0 -> S fold."""
    table = ca_table_bipolar([7])
    u2 = jnp.asarray(upsampled_code_doubled(table))
    x = (np.random.default_rng(1).standard_normal(2046)
         + 0j).astype(np.complex64)
    for cp in (0.0, 0.2, 0.49, 0.51, 1022.6, 1022.99):
        ref = _reference_epl(x, table, np.array([cp], np.float32),
                             np.zeros(1, np.float32),
                             np.zeros(1, np.float32))
        got = np.asarray(
            epl_correlate_pallas(
                jnp.asarray(x), u2,
                jnp.asarray([cp], jnp.float32),
                jnp.zeros(1, jnp.float32), jnp.zeros(1, jnp.float32),
                PLAN.sample_rate_hz, interpret=True)
        )
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4, cp


def test_tracking_scan_with_pallas_backend():
    """Short closed-loop run with the Pallas correlator (interpret mode)
    matches the jnp backend's trajectory."""
    sat = SimSat(prn=5, doppler_hz=1200.0, code_phase_chips=300.0,
                 cn0_dbhz=48.0)
    E = 30
    x, _ = simulate_capture([sat], num_epochs=E, seed=4)
    epochs = jnp.asarray(x.reshape(E, 2046))
    table = ca_table_bipolar([5])
    st0 = init_state(1, np.array([300.05]), np.array([1210.0]))

    cfg_ref = TrackConfig()
    st_ref, out_ref = track_block(st0, epochs, jnp.asarray(table),
                                  PLAN, cfg_ref)

    cfg_pl = TrackConfig(use_pallas=True, pallas_interpret=True)
    u2 = jnp.asarray(upsampled_code_doubled(table))
    st_pl, out_pl = track_block(st0, epochs, u2, PLAN, cfg_pl)

    np.testing.assert_allclose(
        np.asarray(out_pl.doppler_hz), np.asarray(out_ref.doppler_hz),
        atol=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(out_pl.code_phase_chips),
        np.asarray(out_ref.code_phase_chips), atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_pl.ip), np.asarray(out_ref.ip),
        rtol=2e-2, atol=2.0,
    )
