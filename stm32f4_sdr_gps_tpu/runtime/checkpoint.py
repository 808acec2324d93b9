"""Receiver checkpoint / resume.

The firmware has no checkpointing; its closest analogue is warm-start
Doppler seeding (gps_master.c:490-510, SURVEY.md §5).  Here the entire
receiver is explicit state: the device-side TrackState pytree plus the
host-side channel bookkeeping (framers, ephemerides, ledgers), so a
streaming job can stop mid-capture and resume bit-exactly.

Format: a single .npz holding the TrackState leaves + a pickled host
blob (framers/ephemeris are plain dataclasses).
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
    if "code_table" in data:
        rx.code_table = jnp.asarray(data["code_table"])
        rx.track_state = TrackState(
            **{
                f: jnp.asarray(data[f"ts_{f}"])
                for f in TrackState._fields
            }
        )
    return rx
