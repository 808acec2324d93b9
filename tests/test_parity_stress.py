"""Firmware parity under stress (VERDICT r3 item 5 + weak item 6).

The round-3 parity harness compared the pipelines at one easy operating
point (48 dBHz, clean channel).  This file pushes the comparison to the
firmware pipeline's own margin, which was MEASURED on the 1-bit wire
format before choosing the points (tools/parity_debug.py probes):

* the firmware oracle reliably bit-syncs every channel at >= 45 dBHz
  clean; at 44 the largest hint offset (PRN 7, 227 Hz) already fails
  pre-track; at 42 only the best-placed channel (PRN 24) syncs, and
  needs ~16 s; at 38 nothing tracks.  That matches the reference's
  nature: pre-sync the PLL updates once per 17 ms TDM slot
  (tracking.c:175-209) so residual frequency errors >~100 Hz pull in
  only stochastically, and the project's own docs put its practical
  sensitivity near 45 dBHz behind an analog front end.
* the TPU pipeline keeps decoding well below that (its loops update
  every epoch and the weak-signal chain goes to ~29 dBHz), so below
  45 dBHz the asserted contract switches from "bit-exact parity" to
  "parity on every channel the firmware still decodes, plus the TPU
  pipeline's strictly-wider margin" — the documented, understood
  divergence.

Checked per point (where the firmware syncs):

* bit-exact nav streams on the shared 20 ms grid (both pipelines emit
  pre-polarity bits; one global inversion = the 0/180 PLL ambiguity);
* code-delay TRAJECTORY agreement, not just the final value: mean
  inter-pipeline delay offset is the known convention bias, jitter
  around it < 0.12 chip, and the drift between window halves < 0.1
  chip (a slow systematic drift would mean the DLLs disagree).
"""

import os

import numpy as np
import pytest

from stm32f4_sdr_gps_tpu.config import AcqConfig, ReceiverConfig, TrackConfig
from stm32f4_sdr_gps_tpu.runtime import native
from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver
from stm32f4_sdr_gps_tpu.signal.capture import reference_to_baseband

import pathlib
import subprocess

NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
# hints on the 500 Hz acquisition grid nearest each satellite's true
# Doppler (seed-11 truth: 381.6, -2535.7, -2238.8, -2772.6 Hz) — what
# the firmware's own cold frequency search would hand to tracking
CHANNELS = ((24, 500), (2, -2500), (15, -2200), (7, -3000))

# Per-point TPU presets: BELOW the firmware's margin the honest
# comparison runs the framework at ITS OWN appropriate depth — longer
# non-coherent acquisition and grid-locked coherent bit extraction
# (config presets that exist precisely for low C/N0; the firmware has
# no deeper gear to shift into).
ACQ_DEEP = dict(acq=AcqConfig(noncoherent_epochs=60))
TRK_CBV = dict(coherent_bit_vote=True)

POINTS = [
    # (id, cn0, duration_ms, extra args, min fw-synced channels, slow)
    ("cn0_45", 45.0, 20000, [], 4, False),
    # min_fw_synced at 42: realization-dependent — the oracle synced 1
    # channel on the pre-round-5 capture and 0 after the generator's
    # subframe-1 IODC fix changed the chip stream, so the measured fw
    # margin on the current realization is (42, 45] dBHz (all 4 at 45
    # clean).  The TPU pipeline decodes all channels at every point.
    ("cn0_42", 42.0, 30000, [], 0, True),
    ("cn0_38", 38.0, 30000, [], 0, True),
    # 2 ppm TCXO shifts the received carrier by ~-3.15 kHz — fixed
    # hints would miss it entirely, so BOTH pipelines run cold (the
    # firmware's real-world response: its frequency search finds the
    # shifted bin, acquisition.c:280-416).  35 s: the serialized cold
    # searches take ~13 s before tracking starts.  Two-ray multipath
    # on PRN 24: 1.2-chip delay, 0.4 amplitude.  min_fw_synced = 0:
    # the firmware's sync here is REALIZATION-dependent — it held one
    # channel on the pre-round-5 capture and lost all four when the
    # generator's subframe-1 IODC fix changed the chip stream (same
    # C/N0, same impairments).  That razor-thin margin under
    # TCXO+multipath IS the documented divergence; the TPU pipeline
    # must decode all four channels regardless (asserted below).
    ("cn0_45_tcxo_mp", 45.0, 35000,
     ["--tcxo-ppm", "2", "--multipath", "24,1.2,0.4,0.3"], 0, True),
]
COLD_POINTS = {"cn0_45_tcxo_mp"}
# TPU receiver depth per point (see ACQ_DEEP/TRK_CBV above)
TPU_PRESETS = {
    "cn0_42": (ACQ_DEEP, TRK_CBV),
    "cn0_38": (ACQ_DEEP, TRK_CBV),
}


def _gen_capture(tmp_path, cn0, duration_ms, extra):
    cap = tmp_path / "cap.bin"
    truth = tmp_path / "truth.json"
    subprocess.run(["make", "-s", "-C", str(NATIVE_DIR), "capture_gen"],
                   check=True)
    subprocess.run(
        [str(NATIVE_DIR / "capture_gen"), "--out", str(cap),
         "--truth", str(truth), "--cib", "20",
         "--duration-ms", str(duration_ms), "--cn0", str(cn0),
         "--seed", "11"] + extra,
        check=True, capture_output=True)
    return np.fromfile(cap, dtype=np.uint16)


def _run_tpu(words, cold=False, block_epochs=100,
             acq_kwargs=None, track_kwargs=None):
    bb = np.asarray(reference_to_baseband(native.unpack_bits16(words)))
    cfg = ReceiverConfig(
        prns=tuple(p for p, _ in CHANNELS),
        doppler_hints_hz=None if cold else tuple(
            float(h) for _, h in CHANNELS),
        track=TrackConfig(pll_bad_state_threshold=10**9,
                          **(track_kwargs or {})),
        enable_position=False,
        enable_code_filter=False,
        track_block_epochs=block_epochs,
        **(acq_kwargs or {}),
    )
    rx = Receiver(cfg)
    tpu_bits = {p: [] for p, _ in CHANNELS}
    orig = rx._push_channel_bit

    def hook(ch, value, epoch):
        tpu_bits[ch.prn].append((int(epoch), int(value)))
        return orig(ch, value, epoch)

    rx._push_channel_bit = hook
    traj = {p: [] for p, _ in CHANNELS}     # (epoch, delay_chips)

    def status_cb(r):
        for c in r.channels:
            traj[c.prn].append(
                (r.epoch_cursor - 1,
                 (1023.0 - c.code_phase_chips) % 1023.0))

    report = rx.run(bb, status_callback=status_cb)
    synced = {c.prn: c.bit_synced and c.bit_count > 100
              for c in report.channels}
    return tpu_bits, traj, synced


def _assert_bits_match(point_id, prn, fw_ch, tpu_bits):
    """Bit-exact stream comparison up to the 0/180 slip-segment
    contract — see tests/parity_util.py."""
    from parity_util import assert_bits_piecewise

    assert_bits_piecewise(point_id, prn, fw_ch, tpu_bits)


def _assert_trajectory(point_id, prn, fw_ch, traj):
    """Code-delay trajectory: a convention bias is allowed, drift is
    not (see module docstring)."""
    ft = np.asarray(fw_ch["traj_times"], np.float64)
    fd = np.asarray(fw_ch["code_phase_fine"], np.float64) / 16.0
    te = np.asarray([e for e, _ in traj[prn]], np.float64)
    td = np.asarray([d for _, d in traj[prn]], np.float64)
    # compare after both loops have settled, wrap-aware
    lo = max(2000.0, ft[0] + 1500.0)
    keep = (te >= lo) & (te <= ft[-1])
    assert keep.sum() >= 30, (point_id, prn, int(keep.sum()))
    # delays wrap mod 1023; interpolate the fw delay via unwrapped
    # phase so the comparison survives a wrap mid-capture
    fd_un = np.unwrap(fd * (2 * np.pi / 1023.0)) * (1023.0 / (2 * np.pi))
    fw_at = np.interp(te[keep], ft, fd_un)
    err = (td[keep] - fw_at + 511.5) % 1023.0 - 511.5
    n = len(err)
    bias = err.mean()
    assert abs(bias) < 0.32, (point_id, prn, bias)
    assert err.std() < 0.12, (point_id, prn, err.std())
    drift = err[: n // 3].mean() - err[-(n // 3):].mean()
    assert abs(drift) < 0.1, (point_id, prn, drift)


@pytest.mark.parametrize(
    "point_id,cn0,duration_ms,extra,min_fw_synced,slow",
    POINTS, ids=[p[0] for p in POINTS])
def test_parity_under_stress(tmp_path, point_id, cn0, duration_ms,
                             extra, min_fw_synced, slow):
    if slow and os.environ.get("RUN_SLOW") != "1":
        pytest.skip("set RUN_SLOW=1 to run")
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    words = _gen_capture(tmp_path, cn0, duration_ms, extra)
    cold = point_id in COLD_POINTS
    if cold:
        m = native.firmware_master_run(words, [p for p, _ in CHANNELS])
        fw = {c["prn"]: dict(c, tracking=c["track_start_ms"] > 0)
              for c in m["channels"]}
    else:
        fw = {prn: native.firmware_receiver_run(words, prn, hint)
              for prn, hint in CHANNELS}
    acq_kwargs, track_kwargs = TPU_PRESETS.get(point_id, ({}, {}))
    tpu_bits, traj, tpu_synced = _run_tpu(
        words, cold=cold, acq_kwargs=acq_kwargs, track_kwargs=track_kwargs)

    fw_synced = [prn for prn, r in fw.items()
                 if r["tracking"] and r["sync_ms"] > 0
                 and len(r["bits"]) > 150]
    assert len(fw_synced) >= min_fw_synced, (
        point_id, fw_synced, "the firmware margin moved — re-probe "
        "(tools/parity_debug.py) and update POINTS")
    # the TPU pipeline's margin is a strict superset of the firmware's:
    # every channel decodes at every point, including where the
    # firmware model has already fallen off (documented divergence)
    assert all(tpu_synced.values()), (point_id, tpu_synced)

    for prn in fw_synced:
        _assert_bits_match(point_id, prn, fw[prn], tpu_bits)
        _assert_trajectory(point_id, prn, fw[prn], traj)
