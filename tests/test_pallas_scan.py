"""In-kernel Pallas tracking scan (v2) vs the production lax.scan path.

Both paths use the identical half-chip-shift correlator semantics
(ops.pallas_epl), so with matched configs the trajectories must agree
to float32 rounding — including the integer bit-sync decisions, the
in-kernel SNR estimator, the false-lock watchdog counters and the
coherent-PLL mode.  Runs in interpret mode on the CPU test mesh; the
TPU-native run is exercised by bench.py / test_pallas on device.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (
    pallas_track_scan,
    state_from_track_state,
    state_to_track_state,
    track_block_pallas,
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


def _run_both(E, cfg, seed=11, cp_off=0.1, dop_off=15.0):
    x, sats = _scenario(E, seed=seed)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    table = ca_table_bipolar(PRNS)
    u2 = jnp.asarray(upsampled_code_doubled(table))
    st0 = init_state(
        len(PRNS),
        np.array([s.code_phase_chips + cp_off for s in sats]),
        np.array([s.doppler_hz + dop_off for s in sats]),
        window=cfg.pll_check_window,
    )
    st_ref, out_ref = track_block(st0, epochs, u2, PLAN, cfg)
    st_k, out_k = track_block_pallas(st0, epochs, u2, PLAN, cfg,
                                     interpret=True)
    return st_ref, out_ref, st_k, out_k


def _assert_outputs_match(out_ref, out_k):
    # the kernel's polynomial Costas discriminator differs from atan2 by
    # <4e-6 half-cycles/epoch; over ~100 closed-loop epochs that drifts
    # the carrier phase (hence I/Q) by a few parts in 1e3
    np.testing.assert_allclose(np.asarray(out_k.ip),
                               np.asarray(out_ref.ip), rtol=2e-2, atol=2.0)
    np.testing.assert_allclose(np.asarray(out_k.qp),
                               np.asarray(out_ref.qp), rtol=2e-2, atol=2.0)
    np.testing.assert_allclose(np.asarray(out_k.code_phase_chips),
                               np.asarray(out_ref.code_phase_chips),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_k.doppler_hz),
                               np.asarray(out_ref.doppler_hz), atol=0.5)
    np.testing.assert_allclose(np.asarray(out_k.snr_db),
                               np.asarray(out_ref.snr_db), atol=0.1)
    # integer decisions must agree exactly
    np.testing.assert_array_equal(np.asarray(out_k.bit_ready),
                                  np.asarray(out_ref.bit_ready))
    np.testing.assert_array_equal(np.asarray(out_k.period_sync_ok),
                                  np.asarray(out_ref.period_sync_ok))
    ready = np.asarray(out_ref.bit_ready)
    np.testing.assert_array_equal(np.asarray(out_k.bit_value)[ready],
                                  np.asarray(out_ref.bit_value)[ready])
    np.testing.assert_array_equal(np.asarray(out_k.bit_epoch)[ready],
                                  np.asarray(out_ref.bit_epoch)[ready])
    assert ready.any(), "scenario never produced a nav bit"


def _assert_states_match(st_ref, st_k):
    np.testing.assert_allclose(np.asarray(st_k.code_phase_chips),
                               np.asarray(st_ref.code_phase_chips),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(st_k.doppler_hz),
                               np.asarray(st_ref.doppler_hz), atol=0.5)
    np.testing.assert_allclose(np.asarray(st_k.snr_db),
                               np.asarray(st_ref.snr_db), atol=0.1)
    for f in ("fll_primed", "prev_ip_sign", "last_swap_epoch",
              "right_period_cnt", "period_sync_ok", "old_remainder",
              "bit_pos_cnt", "bit_neg_cnt", "pll_bad_cnt",
              "pll_bad_master_cnt", "snr_cnt", "epoch_idx", "code_wraps",
              "ip_sign_window", "ext_bit_cnt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_k, f)).astype(np.int32),
            np.asarray(getattr(st_ref, f)).astype(np.int32), err_msg=f)
    np.testing.assert_allclose(np.asarray(st_k.ext_ip_sum),
                               np.asarray(st_ref.ext_ip_sum),
                               rtol=2e-2, atol=10.0)
    np.testing.assert_allclose(np.asarray(st_k.ext_qp_sum),
                               np.asarray(st_ref.ext_qp_sum),
                               rtol=2e-2, atol=10.0)


def test_in_kernel_scan_matches_production_scan():
    cfg = TrackConfig(
        codes_in_bit=CIB,
        use_pallas=True,
        pallas_interpret=True,
        pll_bad_state_threshold=10**6,
    )
    st_ref, out_ref, st_k, out_k = _run_both(90, cfg)
    _assert_outputs_match(out_ref, out_k)
    _assert_states_match(st_ref, st_k)


def test_in_kernel_watchdog_window_not_4():
    """v2 lifts the pll_check_window==4 restriction."""
    cfg = TrackConfig(
        codes_in_bit=CIB,
        use_pallas=True,
        pallas_interpret=True,
        pll_check_window=6,
        pll_bad_state_threshold=10**6,
    )
    st_ref, out_ref, st_k, out_k = _run_both(60, cfg)
    _assert_outputs_match(out_ref, out_k)
    _assert_states_match(st_ref, st_k)


def test_in_kernel_watchdog_counters_live():
    """Watchdog counters accumulate identically on a junk channel (state
    initialized far off the true code phase -> noise prompts)."""
    cfg = TrackConfig(
        codes_in_bit=CIB,
        use_pallas=True,
        pallas_interpret=True,
        pll_bad_state_threshold=10**6,   # no kick: counters must MATCH
    )
    st_ref, out_ref, st_k, out_k = _run_both(
        60, cfg, cp_off=300.0, dop_off=15.0)   # 300 chips off: pure noise
    np.testing.assert_array_equal(
        np.asarray(st_k.pll_bad_cnt), np.asarray(st_ref.pll_bad_cnt))
    np.testing.assert_array_equal(
        np.asarray(st_k.pll_bad_master_cnt),
        np.asarray(st_ref.pll_bad_master_cnt))
    assert np.asarray(st_ref.pll_bad_cnt).max() > 0, \
        "junk scenario never tripped the watchdog counters"


def test_in_kernel_coherent_pll_mode():
    """The 20 ms coherent-PLL mode (grid-locked bit sync + whole-bit
    Costas) runs in-kernel and matches the production scan."""
    cfg = TrackConfig(
        codes_in_bit=CIB,
        use_pallas=True,
        pallas_interpret=True,
        coherent_pll=True,
        pll_bad_state_threshold=10**6,
    )
    st_ref, out_ref, st_k, out_k = _run_both(90, cfg)
    _assert_outputs_match(out_ref, out_k)
    _assert_states_match(st_ref, st_k)


def test_in_kernel_ext_pll_mode():
    """The extended K-bit data-wipeoff PLL (pll_ext_bits > 1) runs
    in-kernel and matches the production scan, including the ext
    accumulator state."""
    cfg = TrackConfig(
        codes_in_bit=CIB,
        use_pallas=True,
        pallas_interpret=True,
        coherent_pll=True,
        pll_ext_bits=4,
        pll_bad_state_threshold=10**6,
    )
    st_ref, out_ref, st_k, out_k = _run_both(90, cfg)
    _assert_outputs_match(out_ref, out_k)
    _assert_states_match(st_ref, st_k)
    # the scenario must actually exercise the K-bit accumulator
    assert np.asarray(st_ref.ext_bit_cnt).max() > 0


@pytest.mark.parametrize("split", [40, 44])
def test_in_kernel_scan_is_resumable(split):
    """Two split kernel calls == one 80-epoch call (state handoff).

    split=44 exercises the EPB-padding path: neither 44 nor 36 is a
    multiple of the kernel's epochs-per-grid-step, so the trailing pad
    epochs must not advance state (and the carried ramp/dref cache must
    hand off exactly)."""
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
        k0, epochs, u2, plan=PLAN, cfg=cfg, interpret=True)
    k_a, out_a = pallas_track_scan(
        k0, epochs[:split], u2, plan=PLAN, cfg=cfg, interpret=True)
    k_b, out_b = pallas_track_scan(
        k_a, epochs[split:], u2, plan=PLAN, cfg=cfg, interpret=True)

    assert out_a.shape[0] == split and out_b.shape[0] == E - split
    np.testing.assert_allclose(
        np.asarray(out_full),
        np.concatenate([np.asarray(out_a), np.asarray(out_b)]),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(k_full.f32), np.asarray(k_b.f32), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(k_full.i32), np.asarray(k_b.i32))
    np.testing.assert_array_equal(
        np.asarray(k_full.win), np.asarray(k_b.win))


def test_state_pack_roundtrip():
    st0 = init_state(8, np.linspace(0, 1000, 8), np.linspace(-4e3, 4e3, 8))
    st1 = state_to_track_state(state_from_track_state(st0))
    for f in st0._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st0, f)), np.asarray(getattr(st1, f)),
            err_msg=f)


def test_in_kernel_scan_wide_channel_batch():
    """Kernel == reference at 128 channels (capacity configuration).

    Channel capacity on one chip is a headline capability (docs/
    SCALING.md: 7000+ channel-ms/ms aggregate at 128-256 channels); the
    wide batch exercises the multi-sublane-tile layouts of every (C, 1)
    state plane and the per-channel replica/ramp caches.  Channels
    beyond the 8 simulated satellites track noise — parity must hold
    regardless."""
    E = 10
    C = 128
    x, sats = _scenario(E, seed=13)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    prns = [(i % 32) + 1 for i in range(C)]
    table = ca_table_bipolar(prns)
    u2 = jnp.asarray(upsampled_code_doubled(table))
    rng = np.random.default_rng(13)
    cfg = TrackConfig(codes_in_bit=CIB)
    st0 = init_state(
        C,
        rng.uniform(0, 1023, C),
        rng.uniform(-4000, 4000, C),
        window=cfg.pll_check_window,
    )
    st_ref, out_ref = track_block(st0, epochs, jnp.asarray(table), PLAN, cfg)
    # reference path uses full-resolution replicas; the kernel shares
    # pallas_epl's half-chip-shift equivalence, so compare the kernel to
    # the pallas-epl production config instead
    cfg_epl = dataclasses.replace(cfg, use_pallas=True,
                                  pallas_interpret=True)
    st_epl, out_epl = track_block(st0, epochs, u2, PLAN, cfg_epl)
    st_k, out_k = track_block_pallas(st0, epochs, u2, PLAN, cfg,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out_k.ip),
                               np.asarray(out_epl.ip), rtol=2e-4, atol=2.0)
    np.testing.assert_allclose(np.asarray(out_k.code_phase_chips),
                               np.asarray(out_epl.code_phase_chips),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_k.doppler_hz),
                               np.asarray(out_epl.doppler_hz), atol=0.5)


def test_track_block_dispatches_in_kernel_scan():
    """cfg.in_kernel_scan routes track_block through the Pallas kernel
    (the production TPU path, receiver-wired) — including at a channel
    count that is NOT a multiple of the 8-sublane tile (auto-padding).

    Equivalence target is the pallas-epl config (same half-chip
    replica semantics as the in-kernel scan)."""
    E = 40
    C = 5
    x, sats = _scenario(E, seed=17)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    prns = PRNS[:C]
    table = ca_table_bipolar(prns)
    u2 = jnp.asarray(upsampled_code_doubled(table))
    cfg0 = TrackConfig(codes_in_bit=CIB)
    st0 = init_state(
        C,
        np.array([s.code_phase_chips + 0.1 for s in sats[:C]]),
        np.array([s.doppler_hz + 15.0 for s in sats[:C]]),
        window=cfg0.pll_check_window,
    )
    cfg_epl = dataclasses.replace(cfg0, use_pallas=True,
                                  pallas_interpret=True)
    st_a, out_a = track_block(st0, epochs, u2, PLAN, cfg_epl)
    cfg_ik = dataclasses.replace(cfg0, in_kernel_scan=True,
                                 pallas_interpret=True)
    st_b, out_b = track_block(st0, epochs, u2, PLAN, cfg_ik)
    assert np.asarray(out_b.ip).shape == (E, C)
    np.testing.assert_allclose(np.asarray(out_b.ip), np.asarray(out_a.ip),
                               rtol=2e-4, atol=2.0)
    np.testing.assert_allclose(np.asarray(out_b.code_phase_chips),
                               np.asarray(out_a.code_phase_chips),
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out_b.bit_ready),
                                  np.asarray(out_a.bit_ready))
    np.testing.assert_allclose(np.asarray(st_b.doppler_hz),
                               np.asarray(st_a.doppler_hz), atol=0.5)


def test_track_and_digest_in_kernel():
    """The Receiver's single-jit track+digest program runs on the
    in-kernel scan (cfg.in_kernel_scan) and produces the same block
    digest as the pallas-epl path — the receiver-facing contract of the
    production TPU path."""
    from stm32f4_sdr_gps_tpu.runtime.receiver import _track_and_digest

    E = 40
    x, sats = _scenario(E, seed=19)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    table = ca_table_bipolar(PRNS)
    u2 = jnp.asarray(upsampled_code_doubled(table))
    cfg0 = TrackConfig(codes_in_bit=CIB)
    st0 = init_state(
        len(PRNS),
        np.array([s.code_phase_chips + 0.1 for s in sats]),
        np.array([s.doppler_hz + 15.0 for s in sats]),
        window=cfg0.pll_check_window,
    )
    cfg_epl = dataclasses.replace(cfg0, use_pallas=True,
                                  pallas_interpret=True)
    cfg_ik = dataclasses.replace(cfg0, in_kernel_scan=True,
                                 pallas_interpret=True)
    import jax as _jax

    st_a, d_a = _track_and_digest(st0, epochs, u2, PLAN, cfg_epl, 8, False)
    st_b, d_b = _track_and_digest(st0, epochs, u2, PLAN, cfg_ik, 8, False)
    la, _ = _jax.tree.flatten(d_a)
    lb, _ = _jax.tree.flatten(d_b)
    assert len(la) == len(lb)
    for va, vb in zip(la, lb):
        va = np.asarray(va)
        vb = np.asarray(vb)
        if va.dtype.kind in "fc":
            np.testing.assert_allclose(vb, va, rtol=3e-3, atol=2.0)
        else:
            np.testing.assert_array_equal(vb, va)
