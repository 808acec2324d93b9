"""Receiver checkpoint / resume.

The firmware has no checkpointing; its closest analogue is warm-start
Doppler seeding (gps_master.c:490-510, SURVEY.md §5).  Here the entire
receiver is explicit state: the device-side TrackState pytree plus the
host-side channel bookkeeping (framers, ephemerides, ledgers), so a
streaming job can stop mid-capture and resume bit-exactly.

Format: a single .npz holding the TrackState leaves + a pickled host
blob (framers/ephemeris are plain dataclasses).

Trust boundary: the host blob is a Python pickle — loading a
checkpoint executes whatever that pickle encodes, so only load
checkpoints you produced (same stance as torch.load; the
``allow_pickle=False`` on np.load guards the *array* entries only).
"""

from __future__ import annotations

import io
import pickle

import jax.numpy as jnp
import numpy as np

from ..track.state import TrackState


def save_receiver(path: str, receiver) -> str:
    """Write the checkpoint; returns the actual file path (numpy appends
    .npz when missing, which would otherwise break load_receiver)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    arrays = {}
    if receiver.track_state is not None:
        for f in TrackState._fields:
            arrays[f"ts_{f}"] = np.asarray(getattr(receiver.track_state, f))
        arrays["code_table"] = np.asarray(receiver.code_table)
    host = dict(
        config=receiver.config,
        channels=receiver.channels,
        epoch_cursor=receiver.epoch_cursor,
        solutions=receiver.solutions,
        solution_epochs=receiver.solution_epochs,
        last_solve_ms=receiver._last_solve_ms,
        # cadence/standby/aided-sync ledgers — without these, resume
        # drops late-rise PRNs and restarts the RTCM/reacq clocks
        standby_channels=receiver.standby_channels,
        rtcm_frames=receiver.rtcm_frames,
        last_rtcm_ms=receiver._last_rtcm_ms,
        last_reacq_ms=receiver._last_reacq_ms,
        ip_hist=receiver._ip_hist,
        ip_hist_start=receiver._ip_hist_start,
        aided_low_conf=receiver._aided_low_conf,
        pending_phase=receiver._pending_phase,
        pending_cnt=receiver._pending_cnt,
        phase_ref_prn=receiver._phase_ref_prn,
    )
    blob = io.BytesIO()
    pickle.dump(host, blob)
    arrays["host_blob"] = np.frombuffer(blob.getvalue(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_receiver(path: str):
    from .receiver import Receiver

    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    host = pickle.loads(data["host_blob"].tobytes())
    rx = Receiver(host["config"])
    rx.channels = host["channels"]
    rx.epoch_cursor = int(host["epoch_cursor"])
    rx.solutions = host["solutions"]
    rx.solution_epochs = host["solution_epochs"]
    rx._last_solve_ms = int(host["last_solve_ms"])
    rx.standby_channels = host.get("standby_channels", [])
    rx.rtcm_frames = host.get("rtcm_frames", [])
    rx._last_rtcm_ms = int(host.get("last_rtcm_ms", 0))
    rx._last_reacq_ms = int(host.get("last_reacq_ms", 0))
    rx._ip_hist = host.get("ip_hist")
    rx._ip_hist_start = int(host.get("ip_hist_start", 0))
    if host.get("aided_low_conf") is not None:
        rx._aided_low_conf = host["aided_low_conf"]
    if host.get("pending_phase") is not None:
        rx._pending_phase = host["pending_phase"]
    if host.get("pending_cnt") is not None:
        rx._pending_cnt = host["pending_cnt"]
    rx._phase_ref_prn = int(host.get("phase_ref_prn", 0))
    if "code_table" in data:
        rx.code_table = jnp.asarray(data["code_table"])
        rx.track_state = TrackState(
            **{
                f: jnp.asarray(data[f"ts_{f}"])
                for f in TrackState._fields
            }
        )
    return rx
