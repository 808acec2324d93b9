"""20 ms coherent PLL (cfg.coherent_pll / COHERENT_TRACK preset).

Once synced, the Costas loop closes on whole-bit coherent prompt sums
(one update per bit, redesigned 50 Hz-cadence gains), extending phase
hold ~10 dB below the per-epoch floor.  Scenario: post-handoff state
(synced, Doppler from refine_doppler) — the aided/fading use case.
"""

import numpy as np
import jax.numpy as jnp

from stm32f4_sdr_gps_tpu.config import (
    BASEBAND_PLAN,
    COHERENT_TRACK,
    DEEP_COHERENT_TRACK,
    TrackConfig,
)
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream
from stm32f4_sdr_gps_tpu.signal.scenarios import CANONICAL_EPH
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture
from stm32f4_sdr_gps_tpu.track.scan import track_block
from stm32f4_sdr_gps_tpu.track.state import init_state

PLAN = BASEBAND_PLAN
CIB = 20


def _handoff_state(doppler):
    st = init_state(1, np.array([0.0]), np.array([doppler]))
    return st._replace(
        period_sync_ok=jnp.ones(1, bool),
        right_period_cnt=jnp.full((1,), 10, jnp.int32),
    )


def _track_bits(cfg, epochs, bits):
    _, outs = track_block(_handoff_state(250.0), epochs,
                          jnp.asarray(ca_table_bipolar([12])), PLAN, cfg)
    ready = np.asarray(outs.bit_ready)[:, 0]
    vals = np.asarray(outs.bit_value)[:, 0][ready]
    eps = np.asarray(outs.bit_epoch)[:, 0][ready].astype(int)
    planted = np.array([bits[e // CIB] for e in eps])
    errs = min(int(np.sum(vals != planted)),
               int(np.sum((1 - vals) != planted)))
    dop_err = np.abs(np.asarray(outs.doppler_hz)[:, 0] - 250.0)
    return errs, len(vals), float(np.percentile(dop_err, 95))


def _capture(cn0, n_bits, seed=42):
    stream = build_bitstream(CANONICAL_EPH, start_tow_6s=40,
                             num_subframes=3, subframe_ids=(1, 2, 3))
    bits = list(stream[:n_bits])
    sat = SimSat(prn=12, doppler_hz=250.0, code_phase_chips=0.0,
                 cn0_dbhz=cn0, codes_in_bit=CIB, nav_bits=bits)
    E = CIB * len(bits)
    x, _ = simulate_capture([sat], num_epochs=E, seed=seed)
    return jnp.asarray(x.reshape(E, PLAN.samples_per_epoch)), bits


def test_coherent_pll_holds_where_per_epoch_slips():
    """29 dBHz, 15 s: per-epoch Costas (grid-locked bits, so the bit
    stream is intact if phase holds) slips half-cycles and garbles the
    bits; the 20 ms coherent PLL tracks cleanly."""
    epochs, bits = _capture(29.0, 37)

    errs_pe, n_pe, dop_pe = _track_bits(
        TrackConfig(coherent_bit_vote=True), epochs, bits)
    errs_co, n_co, dop_co = _track_bits(COHERENT_TRACK, epochs, bits)

    assert errs_co <= 1, (errs_co, n_co)
    assert dop_co < 3.0, dop_co
    # the per-epoch loop must be visibly broken on the same capture
    assert errs_pe > 5 * max(errs_co, 1), (errs_pe, errs_co)


def test_coherent_pll_clean_at_high_cn0():
    """45 dBHz sanity: coherent PLL is not a regression when strong."""
    epochs, bits = _capture(45.0, 25, seed=3)
    errs, n, dop = _track_bits(COHERENT_TRACK, epochs, bits)
    assert errs == 0 and n >= 20
    assert dop < 1.0


def test_ext_pll_holds_where_per_bit_slips():
    """24 dBHz, 15 s: the per-bit coherent loop slips half-cycles; the
    100 ms data-wipeoff loop (DEEP_COHERENT_TRACK, pll_ext_bits=5)
    tracks cleanly.  Full sweep evidence (20-26 dBHz, 3 seeds) in
    tools/ext_pll_tune.py / the DEEP_COHERENT_TRACK docstring."""
    epochs, bits = _capture(24.0, 37)

    errs_bit, n_bit, dop_bit = _track_bits(COHERENT_TRACK, epochs, bits)
    errs_ext, n_ext, dop_ext = _track_bits(DEEP_COHERENT_TRACK, epochs, bits)

    assert errs_ext <= 1, (errs_ext, n_ext)
    assert dop_ext < 1.0, dop_ext
    assert errs_bit > 3 * max(errs_ext, 1), (errs_bit, errs_ext)


def test_ext_pll_clean_at_high_cn0():
    """45 dBHz sanity: the extended loop is not a regression when
    strong."""
    epochs, bits = _capture(45.0, 25, seed=3)
    errs, n, dop = _track_bits(DEEP_COHERENT_TRACK, epochs, bits)
    assert errs == 0 and n >= 20
    assert dop < 1.0