"""In-kernel Pallas tracking scan vs the production lax.scan path.

Both paths use the identical half-chip-shift correlator semantics
(ops.pallas_epl), so with the watchdog disabled the trajectories must
agree to float32 rounding — including the integer bit-sync decisions.
Runs in interpret mode on the CPU test mesh; the TPU-native wall-clock
comparison is round-2 work (docs/ROADMAP.md §2).
"""

import jax.numpy as jnp
import numpy as np

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (
    pallas_track_scan,
    state_from_track_state,
)
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture
from stm32f4_sdr_gps_tpu.track.scan import track_block
from stm32f4_sdr_gps_tpu.track.state import init_state

PLAN = BASEBAND_PLAN
PRNS = [1, 4, 7, 9, 13, 18, 22, 30]
CIB = 3  # compressed bit period so bit sync converges within the block


def _scenario(num_epochs, seed=11):
    rng = np.random.default_rng(seed)
    sats = []
    for i, prn in enumerate(PRNS):
        sats.append(SimSat(
            prn=prn,
            doppler_hz=float(rng.uniform(-4000, 4000)),
            code_phase_chips=float(rng.uniform(0, 1023)),
            cn0_dbhz=48.0,
            codes_in_bit=CIB,
            nav_bits=list(rng.integers(0, 2, 200)),
        ))
    x, truth = simulate_capture(sats, num_epochs=num_epochs, seed=seed)
    return x, sats


def test_in_kernel_scan_matches_production_scan():
    E = 90
    x, sats = _scenario(E)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    table = ca_table_bipolar(PRNS)
    u2 = jnp.asarray(upsampled_code_doubled(table))

    cp0 = np.array([s.code_phase_chips + 0.1 for s in sats])
    dop0 = np.array([s.doppler_hz + 15.0 for s in sats])
    st0 = init_state(len(PRNS), cp0, dop0)

    # watchdog unreachable: the kernel does not implement it (module doc)
    cfg = TrackConfig(
        codes_in_bit=CIB,
        use_pallas=True,
        pallas_interpret=True,
        pll_bad_state_threshold=10**6,
    )

    st_ref, out_ref = track_block(st0, epochs, u2, PLAN, cfg)

    k0 = state_from_track_state(st0)
    k_end, outs = pallas_track_scan(
        k0, epochs, u2, 0, PLAN, cfg, interpret=True
    )
    outs = np.asarray(outs)

    # the kernel's polynomial Costas discriminator differs from atan2 by
    # <4e-6 half-cycles/epoch; over 90 closed-loop epochs that drifts
    # the carrier phase (hence I/Q) by a few parts in 1e3
    np.testing.assert_allclose(
        outs[:, :, 0], np.asarray(out_ref.ip), rtol=2e-2, atol=2.0)
    np.testing.assert_allclose(
        outs[:, :, 1], np.asarray(out_ref.qp), rtol=2e-2, atol=2.0)
    np.testing.assert_allclose(
        outs[:, :, 2], np.asarray(out_ref.code_phase_chips),
        atol=5e-3)
    np.testing.assert_allclose(
        outs[:, :, 3], np.asarray(out_ref.doppler_hz), atol=0.5)

    # integer bit-sync decisions must agree exactly
    np.testing.assert_array_equal(
        outs[:, :, 4] > 0.5, np.asarray(out_ref.bit_ready))
    np.testing.assert_array_equal(
        outs[:, :, 7] > 0.5, np.asarray(out_ref.period_sync_ok))
    ready = outs[:, :, 4] > 0.5
    np.testing.assert_array_equal(
        outs[:, :, 5][ready],
        np.asarray(out_ref.bit_value).astype(np.float32)[ready])
    np.testing.assert_array_equal(
        outs[:, :, 6][ready],
        np.asarray(out_ref.bit_epoch).astype(np.float32)[ready])
    assert ready.any(), "scenario never produced a nav bit"

    # final state planes
    k_ref = state_from_track_state(st_ref)
    np.testing.assert_allclose(
        np.asarray(k_end.f32)[0], np.asarray(k_ref.f32)[0], atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(k_end.f32)[1], np.asarray(k_ref.f32)[1], atol=0.5)
    np.testing.assert_array_equal(
        np.asarray(k_end.i32)[1:], np.asarray(k_ref.i32)[1:])


def test_in_kernel_scan_is_resumable():
    """Two 40-epoch kernel calls == one 80-epoch call (state handoff)."""
    E = 80
    x, sats = _scenario(E, seed=5)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    table = ca_table_bipolar(PRNS)
    u2 = jnp.asarray(upsampled_code_doubled(table))
    st0 = init_state(
        len(PRNS),
        np.array([s.code_phase_chips for s in sats]),
        np.array([s.doppler_hz for s in sats]),
    )
    cfg = TrackConfig(codes_in_bit=CIB, use_pallas=True,
                      pallas_interpret=True,
                      pll_bad_state_threshold=10**6)
    k0 = state_from_track_state(st0)

    k_full, out_full = pallas_track_scan(
        k0, epochs, u2, 0, PLAN, cfg, interpret=True)
    k_a, out_a = pallas_track_scan(
        k0, epochs[:40], u2, 0, PLAN, cfg, interpret=True)
    k_b, out_b = pallas_track_scan(
        k_a, epochs[40:], u2, 40, PLAN, cfg, interpret=True)

    np.testing.assert_allclose(
        np.asarray(out_full),
        np.concatenate([np.asarray(out_a), np.asarray(out_b)]),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(k_full.f32), np.asarray(k_b.f32), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(k_full.i32), np.asarray(k_b.i32))