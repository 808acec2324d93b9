"""Sub-epoch bit-edge timing: reconstructed boundary arrival vs truth.

The firmware refines the nav-bit swap position INSIDE its 4 ms slot
window by comparing correlation magnitudes (the "accurate swap time"
mechanism, nav_data.c:145-218), because a bit edge that lands mid-window
attenuates rather than flips the correlation.  This framework's
equivalent chain is:

  1. the tracking scan's bit-sync histogram settles on the epoch whose
     prompt majority-votes the new bit — i.e. the epoch boundary NEAREST
     the true edge (round convention);
  2. ``Receiver._dejitter_boundary`` removes isolated +/-1-epoch slips;
  3. ``pvt.observables.boundary_arrival_ms`` reconstructs the true
     sub-ms arrival: round(ledger_epoch - frac) + frac, with frac the
     live code-NCO delay.

This test quantifies the end-to-end bound the VERDICT asked for: for
bit edges planted at awkward sub-epoch positions (2%, 25%, 46%, 54%,
75%, 98% into an epoch) the reconstructed subframe-boundary arrival
must match the planted arrival to < 5 us — i.e. the integer epoch is
resolved EXACTLY and the sub-ms part tracks the code NCO at sub-chip
error.  A razor-edge channel (49.95% — decision margin below the noise
floor of the per-bit majority vote) is allowed to resolve to either
neighboring epoch; the reconstruction must then be a CLEAN +/-1 ms
integer offset (which the solve-level integrity layer — residual gate,
identify_grid_fault — is built to absorb), never a fractional smear.
"""

import numpy as np

from stm32f4_sdr_gps_tpu.config import ReceiverConfig, TrackConfig
from stm32f4_sdr_gps_tpu.pvt.observables import boundary_arrival_ms
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver
from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture

from tests.test_nav import TEST_EPH

CIB = 3
FL1 = 1.57542e9
PREFIX_BITS = 120
START_TOW6 = 58800

PRNS = (2, 5, 7, 13, 15, 20, 24)
#          2%     25%    46%    54%    75%    98%    razor 49.95%
DELAYS = (1.020, 3.250, 5.460, 7.540, 9.750, 11.980, 13.4995)
DOPPLERS = (-2200.0, 650.0, 2900.0, -350.0, 1500.0, -1800.0, 900.0)


def _true_boundary_ms(delay_ms: float, doppler_hz: float,
                      bit_index: int) -> float:
    """Receiver-time arrival (ms) of the leading edge of nav bit
    ``bit_index``: solves t*(1 + fd/fL1) = delay + bit_index*CIB ms
    (the simulator's code-Doppler timeline, signal/simulator.py)."""
    return (delay_ms + bit_index * CIB) / (1.0 + doppler_hz / FL1)


def test_boundary_arrival_matches_planted_edges():
    prefix = np.tile([0, 1], PREFIX_BITS // 2).astype(np.int8)
    sats = []
    for prn, delay, dop in zip(PRNS, DELAYS, DOPPLERS):
        body = build_bitstream(dict(TEST_EPH), start_tow_6s=START_TOW6,
                               num_subframes=2, subframe_ids=(5, 1))
        sats.append(SimSat(
            prn=prn, doppler_hz=dop, cn0_dbhz=49.0,
            nav_bits=np.concatenate([prefix, body]),
            codes_in_bit=CIB, delay_ms=delay,
        ))
    num_epochs = (PREFIX_BITS + 2 * 300) * CIB + 300
    x, _ = simulate_capture(sats, num_epochs=num_epochs, seed=13)

    cfg = ReceiverConfig(
        prns=PRNS,
        track=TrackConfig(codes_in_bit=CIB, pll_bad_state_threshold=10**9),
        enable_position=False,
        track_block_epochs=250,
    )
    report = Receiver(cfg).run(x)

    razor_offsets = {}
    for ch, delay, dop in zip(report.channels, DELAYS, DOPPLERS):
        assert ch.subframe_count >= 1, ch.prn
        # the ledger boundary is the start of the subframe AFTER the
        # one whose HOW labels it: bit index prefix + 300*(tow6-START)
        tow6 = int(round(ch.subframe_tow_s / 6.0))
        bit_index = PREFIX_BITS + 300 * (tow6 - START_TOW6)
        truth_ms = _true_boundary_ms(delay, dop, bit_index)
        rec_ms = boundary_arrival_ms(ch.subframe_time_ms,
                                     ch.code_phase_chips)
        err_ms = rec_ms - truth_ms
        # nearest integer-ms offset and the residual around it
        off = int(np.round(err_ms))
        sub_us = abs(err_ms - off) * 1e3
        frac = delay % 1.0
        if abs(frac - 0.5) < 0.01:
            # razor edge: either epoch is acceptable, but the error must
            # be a CLEAN integer-ms offset (sub-us residual), so the
            # solve-level integer-ms integrity machinery can absorb it
            assert off in (-1, 0, 1), (ch.prn, err_ms)
            assert sub_us < 5.0, (ch.prn, err_ms)
            razor_offsets[ch.prn] = off
        else:
            assert off == 0, (ch.prn, err_ms, delay)
            assert sub_us < 5.0, (ch.prn, err_ms, delay)
