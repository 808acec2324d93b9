"""Aided bit sync (track.aided_sync + Receiver._maybe_aided_sync).

The histogram boundary search replaces the run-time flip counters at
C/N0 where those can never converge, seeding the grid-locked coherent
loop (see config.TrackConfig.coherent_pll).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stm32f4_sdr_gps_tpu.config import (
    BASEBAND_PLAN,
    COHERENT_TRACK,
    ReceiverConfig,
)
from stm32f4_sdr_gps_tpu.acquire.engine import AcqResult
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
from stm32f4_sdr_gps_tpu.signal.nav_message import build_bitstream
from stm32f4_sdr_gps_tpu.signal.scenarios import CANONICAL_EPH
from stm32f4_sdr_gps_tpu.signal.simulator import SimSat, simulate_capture
from stm32f4_sdr_gps_tpu.track.aided_sync import (
    engage_bit_sync,
    find_bit_boundary,
)
from stm32f4_sdr_gps_tpu.track.scan import track_block
from stm32f4_sdr_gps_tpu.track.state import init_state
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver

PLAN = BASEBAND_PLAN
CIB = 20


def test_histogram_finds_boundary_under_noise():
    """Synthetic prompt signs: 16%/epoch sign errors (≈30 dBHz), true
    boundary at phase 7 — found with >5 sigma confidence."""
    rng = np.random.default_rng(0)
    n_bits = 200
    bit_vals = rng.choice([-1.0, 1.0], n_bits)
    ip = np.repeat(bit_vals, CIB)
    flip = rng.random(ip.shape) < 0.16
    ip = ip * np.where(flip, -1.0, 1.0)
    # shift so bits start at global epochs ≡ 7 (mod 20)
    phases, confs = find_bit_boundary(ip, CIB, first_epoch=7)
    assert phases[0] == 7
    assert confs[0] > 5.0


def test_engage_produces_clean_grid():
    """Engaged state yields the first completed bit exactly at the next
    boundary with a full vote count."""
    bits = [1, 0, 1, 1, 0]
    sat = SimSat(prn=4, doppler_hz=0.0, code_phase_chips=0.0,
                 cn0_dbhz=48.0, codes_in_bit=CIB, nav_bits=bits)
    E = CIB * len(bits)
    x, _ = simulate_capture([sat], num_epochs=E, seed=1)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    st = init_state(1, np.array([0.0]), np.array([0.0]))
    st = engage_bit_sync(st, np.array([0]), next_epoch=0, cib=CIB)
    _, outs = track_block(st, epochs, jnp.asarray(ca_table_bipolar([4])),
                          PLAN, COHERENT_TRACK)
    ready = np.asarray(outs.bit_ready)[:, 0]
    t = np.nonzero(ready)[0]
    np.testing.assert_array_equal(t, np.arange(CIB, E, CIB))
    vals = np.asarray(outs.bit_value)[:, 0][ready]
    got = [int(v) for v in vals]
    planted = bits[: len(got)]
    assert got == planted or got == [1 - b for b in planted]


def test_digest_flip_hist_matches_host_statistic():
    """The device digest's flip_hist must be the exact sufficient
    statistic the host aided search computes from the (T, C) prompts —
    same bins, same residue convention — so the digest-fed path and the
    full-readback path make identical decisions."""
    from stm32f4_sdr_gps_tpu.runtime.digest import digest_block
    from stm32f4_sdr_gps_tpu.track.scan import track_block

    sat = SimSat(prn=4, doppler_hz=800.0, code_phase_chips=100.0,
                 cn0_dbhz=33.0, codes_in_bit=CIB,
                 nav_bits=list(np.random.default_rng(3).integers(0, 2, 40)))
    start = 37                       # non-trivial global epoch offset
    E = 400
    x, _ = simulate_capture([sat], num_epochs=E, seed=2)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    st = init_state(1, np.array([100.0]), np.array([800.0]),
                    start_epoch=start)
    st2, outs = track_block(st, epochs, jnp.asarray(ca_table_bipolar([4])),
                            PLAN, COHERENT_TRACK)
    d = digest_block(outs, st2, COHERENT_TRACK, 100, True)

    ip = np.asarray(outs.ip)[:, 0]
    signs = ip > 0
    flips = signs[1:] != signs[:-1]
    res = (start + np.arange(1, E)) % CIB
    want = np.bincount(res[flips], minlength=CIB)
    np.testing.assert_array_equal(np.asarray(d.flip_hist)[:, 0], want)
    assert int(d.first_ip_sign[0]) == (1 if signs[0] else -1)
    assert int(d.last_ip_sign[0]) == (1 if signs[-1] else -1)
    assert float(d.code_phase_first[0]) == float(
        np.asarray(outs.code_phase_chips)[0, 0])
    assert int(d.swap_residue[0]) == int(
        np.asarray(st2.last_swap_epoch)[0]) % CIB


def test_refine_doppler_device_matches_host():
    """Batched device refine_doppler returns the host version's answer
    for every channel (same replica scan, same squared-prompt FFT)."""
    from stm32f4_sdr_gps_tpu.acquire.engine import (
        refine_doppler,
        refine_doppler_device,
    )

    prns = [4, 9]
    true_dop = [1234.0, -2650.0]
    sats = [SimSat(prn=p, doppler_hz=d, code_phase_chips=50.0 * i,
                   cn0_dbhz=40.0, codes_in_bit=CIB,
                   nav_bits=[1, 0] * 20)
            for i, (p, d) in enumerate(zip(prns, true_dop))]
    E = 128
    x, _ = simulate_capture(sats, num_epochs=E, seed=7)
    epochs = jnp.asarray(x.reshape(E, PLAN.samples_per_epoch))
    cps = np.array([0.0, 50.0])
    coarse = np.array([1200.0, -2600.0])
    dev = np.asarray(refine_doppler_device(
        epochs, jnp.asarray(ca_table_bipolar(prns)),
        jnp.asarray(cps, jnp.float32), jnp.asarray(coarse, jnp.float32),
        PLAN))
    for i, prn in enumerate(prns):
        host = refine_doppler(x, prn, cps[i], coarse[i], PLAN,
                              num_epochs=E)
        assert abs(dev[i] - host) < 0.5, (prn, dev[i], host)
        assert abs(dev[i] - true_dop[i]) < 4.0, (prn, dev[i])


@pytest.mark.parametrize("device_digest", [True, False])
def test_receiver_engages_aided_sync_at_30dbhz(device_digest):
    """Full receiver path at 30 dBHz from an acquisition handoff: the
    run-time counters can't sync there; the aided search engages the
    coherent loop and grid-locked bits flow.  Runs both the digest-fed
    (device-resident) and the full-readback paths — they share the
    decision logic and must both engage."""
    stream = build_bitstream(CANONICAL_EPH, start_tow_6s=40,
                             num_subframes=2, subframe_ids=(1, 2))
    n_bits = 400
    bits = list(stream[:n_bits])
    sat = SimSat(prn=9, doppler_hz=1200.0, code_phase_chips=500.0,
                 cn0_dbhz=30.0, codes_in_bit=CIB, nav_bits=bits)
    E = CIB * n_bits // 2          # 4000 epochs = 4 s
    x, _ = simulate_capture([sat], num_epochs=E + 4000, seed=5)

    cfg = ReceiverConfig(
        prns=(9,), track=COHERENT_TRACK,
        enable_position=False, aided_sync_window_ms=3000,
        device_digest=device_digest,
    )
    rx = Receiver(cfg)
    ch = rx.channels[0]
    ch.acq = AcqResult(prn=9, detected=True, code_phase_chips=500.0,
                       doppler_hz=1200.0, peak_power=1.0,
                       peak_ratio=3.0, peak_to_mean=10.0)
    ch.state_name = "ACQ_DONE"
    # the weak-signal preset wants ~100 epochs of pre-track and ~256
    # epochs of fine-Doppler span
    rx.start_tracking(x[: PLAN.samples_per_epoch * 300])
    spe = PLAN.samples_per_epoch
    blk = 500 * spe
    for i in range(0, len(x) - blk + 1, blk):
        rx.process_block(x[i:i + blk])

    assert ch.bit_synced, "aided sync never engaged"
    # bits flow only after the aided engagement (~3 s into the 8 s run)
    assert ch.bit_count > 80
    assert bool(np.asarray(rx.track_state.period_sync_ok)[0])