"""Grid-locked coherent nav-bit extraction (cfg.coherent_bit_vote).

The firmware's bit sync (nav_data.c:46-138) rebases the bit boundary
on every prompt sign flip, so low-C/N0 noise flips fragment bits and a
window never contains mixed signs.  Coherent mode freezes the bit grid
once synced and decides each bit by the sign of the prompt-I sum over
the full bit.  Tests: a constructed mixed-sign bit (firmware mode
fragments it and reports the wrong symbol; coherent mode integrates
through it), clean-signal stream equivalence, and a noisy closed-loop
run where firmware-mode fragmentation is visible and coherent mode
recovers the planted bits exactly.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture
from stm32f4_sdr_gps_tpu.track.scan import track_block
from stm32f4_sdr_gps_tpu.track.state import init_state

PLAN = BASEBAND_PLAN
CIB = 20


def _frozen_cfg(**kw):
    """Loops frozen: only the bit-extraction stage acts."""
    return TrackConfig(
        codes_in_bit=CIB,
        dll_c1=0.0, dll_c2=0.0,
        pll_wide_c1=0.0, pll_wide_c2=0.0,
        pll_narrow_c1=0.0, pll_narrow_c2=0.0,
        fll_c1=0.0, fll_c2=0.0,
        pll_bad_state_threshold=10**9,
        **kw,
    )


def _synced_state():
    st = init_state(1, np.array([0.0]), np.array([0.0]))
    return st._replace(
        period_sync_ok=jnp.ones(1, bool),
        right_period_cnt=jnp.full((1,), 10, jnp.int32),
    )


def _run(cfg, amps):
    """Per-epoch prompt amplitudes -> (decided bits, their epochs).

    Epoch e carries code * amps[e]; with zero Doppler and frozen loops
    the prompt I is amps[e] * 2046, so the per-epoch sign/magnitude
    pattern is exactly `amps`.
    """
    code = ca_table_bipolar([9])[0]
    up = np.repeat(code, 2).astype(np.float32)
    x = np.concatenate([a * up for a in amps]).astype(np.complex64)
    epochs = jnp.asarray(x.reshape(len(amps), PLAN.samples_per_epoch))
    _, outs = track_block(_synced_state(), epochs,
                          jnp.asarray(ca_table_bipolar([9])), PLAN, cfg)
    ready = np.asarray(outs.bit_ready)[:, 0]
    return (list(np.asarray(outs.bit_value)[:, 0][ready]),
            list(np.asarray(outs.bit_epoch)[:, 0][ready]))


def test_mixed_sign_bit_fragmented_vs_integrated():
    # bit 0 carries 11 weak wrong-sign epochs and 9 strong right-sign
    # epochs: the physical symbol (an AGC-free coherent sum) is
    # positive (+18-11=+7).  Firmware mode rebases at the mid-bit flip
    # and reports a fragmented wrong-symbol bit; grid-locked coherent
    # mode integrates through the flip and reports the symbol.
    contested = [-1.0] * 11 + [2.0] * 9
    amps = contested + [1.0] * CIB + [-1.0] * CIB
    fw_bits, fw_epochs = _run(_frozen_cfg(), amps)
    assert fw_bits[0] == 0            # majority of the 11-epoch fragment
    co_bits, co_epochs = _run(_frozen_cfg(coherent_bit_vote=True), amps)
    assert co_bits[0] == 1            # coherent sum over the full bit
    assert co_epochs[0] == 0 and co_epochs[1] == CIB  # grid held


def test_clean_signal_bit_streams_identical():
    rng = np.random.default_rng(7)
    bits = list(rng.integers(0, 2, 40))
    sat = SimSat(prn=17, doppler_hz=800.0, code_phase_chips=0.0,
                 cn0_dbhz=45.0, codes_in_bit=3, nav_bits=bits)
    E = 3 * len(bits)
    x, _ = simulate_capture([sat], num_epochs=E, seed=7)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    table = jnp.asarray(ca_table_bipolar([17]))
    st0 = init_state(1, np.array([0.0]), np.array([800.0]))

    streams = {}
    for coh in (False, True):
        cfg = TrackConfig(codes_in_bit=3, coherent_bit_vote=coh,
                          pll_bad_state_threshold=10**9)
        _, outs = track_block(st0, epochs, table, PLAN, cfg)
        ready = np.asarray(outs.bit_ready)[:, 0]
        streams[coh] = list(np.asarray(outs.bit_value)[:, 0][ready])
    assert len(streams[False]) >= 15
    assert streams[False] == streams[True]


def test_subframe_decode_floor_contrast_38dbhz():
    """RUN_SLOW: at 38 dBHz (default gains, real 20 ms bits, 30 s) the
    firmware-mode bit stream is too fragmented for any subframe to pass
    parity, while grid-locked coherent extraction decodes subframes
    1-3 with zero bit errors.  Measured floors (seed 42): firmware mode
    needs ~42 dBHz, coherent mode ~38 dBHz (PLL-cycle-slip limited
    below ~37)."""
    import os
    import pytest
    if not os.environ.get("RUN_SLOW"):
        pytest.skip("RUN_SLOW not set")
    from stm32f4_sdr_gps_tpu.nav.frame import NavFramer
    from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream
    from stm32f4_sdr_gps_tpu.signal.scenarios import CANONICAL_EPH

    bits = build_bitstream(CANONICAL_EPH, start_tow_6s=40,
                           num_subframes=5, subframe_ids=(5, 1, 2, 3, 1))
    sat = SimSat(prn=12, doppler_hz=250.0, code_phase_chips=0.0,
                 cn0_dbhz=38.0, codes_in_bit=CIB, nav_bits=list(bits))
    E = CIB * len(bits)
    x, _ = simulate_capture([sat], num_epochs=E, seed=42)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    table = jnp.asarray(ca_table_bipolar([12]))
    st0 = init_state(1, np.array([0.0]), np.array([250.0]))

    decoded = {}
    for coh in (False, True):
        cfg = TrackConfig(coherent_bit_vote=coh)
        _, outs = track_block(st0, epochs, table, PLAN, cfg)
        ready = np.asarray(outs.bit_ready)[:, 0]
        vals = np.asarray(outs.bit_value)[:, 0][ready]
        eps = np.asarray(outs.bit_epoch)[:, 0][ready]
        fr = NavFramer()
        evs = []
        for v, e in zip(vals, eps):
            evs += fr.push_bit(int(v), int(e))
        decoded[coh] = sorted(ev.subframe_id for ev in evs)
    assert decoded[False] == []
    assert {1, 2, 3} <= set(decoded[True])


def test_low_cn0_fragmentation_vs_coherent_recovery():
    """28 dBHz, real 20 ms bits: firmware-mode noise flips fragment the
    bit stream (boundaries off the 20-epoch grid); grid-locked coherent
    mode emits exactly one bit per 20 epochs and recovers the planted
    sequence."""
    rng = np.random.default_rng(21)
    bits = list(rng.integers(0, 2, 60))
    sat = SimSat(prn=23, doppler_hz=0.0, code_phase_chips=0.0,
                 cn0_dbhz=28.0, codes_in_bit=CIB, nav_bits=bits)
    E = CIB * len(bits)
    x, _ = simulate_capture([sat], num_epochs=E, seed=21)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    table = jnp.asarray(ca_table_bipolar([23]))

    results = {}
    for coh in (False, True):
        cfg = _frozen_cfg(coherent_bit_vote=coh)
        _, outs = track_block(_synced_state(), epochs, table, PLAN, cfg)
        ready = np.asarray(outs.bit_ready)[:, 0]
        results[coh] = (
            list(np.asarray(outs.bit_value)[:, 0][ready]),
            np.asarray(outs.bit_epoch)[:, 0][ready],
        )

    co_bits, co_epochs = results[True]
    assert np.all(np.diff(co_epochs) == CIB), "coherent grid broke"
    planted = [bits[int(e) // CIB] for e in co_epochs]
    planted_pol = planted if planted[0] == co_bits[0] else [
        1 - b for b in planted]
    errs = sum(a != b for a, b in zip(co_bits, planted_pol))
    assert errs <= 1, f"coherent BER too high: {errs}/{len(co_bits)}"

    fw_bits, fw_epochs = results[False]
    assert np.any(np.diff(fw_epochs) != CIB), (
        "expected firmware-mode fragmentation at 28 dBHz")