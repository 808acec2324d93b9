"""Mesh-sharded streaming receiver (BASELINE config 5 shape).

A :class:`~stm32f4_sdr_gps_tpu.runtime.receiver.Receiver` whose device
stages run on an explicit ``jax.sharding.Mesh``:

* acquisition shards PRNs over ``chan`` and epoch blocks over ``time``
  with ``psum`` merge (parallel.streaming.acquire_sharded);
* tracking keeps the channel axis sharded across every device with
  state resident between blocks (parallel.streaming.StreamingTracker).

Host-side decode/PVT is unchanged — nav bits are 50 bps/channel, far
below any host boundary's bandwidth.  On a multi-process mesh each host
would run the framers for its own channel shard; this class targets the
single-process view (one controller, N devices).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from jax.sharding import Mesh

from ..acquire.engine import AcqResult
from ..parallel.streaming import StreamingTracker, acquire_sharded
from ..signal.ca_code import ca_table_bipolar
from ..track.state import init_state
from ..track.pretrack import refine_code_phase
from .receiver import Receiver


class MeshReceiver(Receiver):
    """Receiver with mesh-sharded acquisition and tracking."""

    def __init__(self, config, mesh: Mesh):
        super().__init__(config)
        self.mesh = mesh
        self.tracker: Optional[StreamingTracker] = None

    def acquire_all(self, samples: np.ndarray,
                    extra_hints: Optional[dict] = None) -> List[AcqResult]:
        cfg = self.config
        hints = {}
        for prn, h in zip(cfg.prns, cfg.doppler_hints_hz):
            if h is not None:
                hints[int(prn)] = float(h)
        if extra_hints:
            hints.update(extra_hints)
        results = acquire_sharded(
            samples, list(cfg.prns), self.mesh, cfg.plan, cfg.acq,
            doppler_hints_hz=hints or None,
        )
        for ch, res in zip(self.channels, results):
            ch.acq = res
            ch.state_name = "ACQ_DONE" if res.detected else "ACQ_FAILED"
        return results

    def start_tracking(self, samples: np.ndarray,
                       start_epoch: int = 0) -> None:
        cfg = self.config
        live = [ch for ch in self.channels if ch.acq and ch.acq.detected]
        if not live:
            raise RuntimeError("no channels acquired")
        # pad the channel set to a mesh multiple with ghost copies of the
        # first channel (their outputs are ignored)
        n_dev = self.mesh.devices.size
        pad = (-len(live)) % n_dev
        tracked = live + live[:1] * pad
        prns = [ch.prn for ch in tracked]
        self.channels = live
        self._n_live = len(live)

        table = ca_table_bipolar(prns)
        phases = np.array([ch.acq.code_phase_chips for ch in tracked])
        dopplers = np.array([ch.acq.doppler_hz for ch in tracked])
        from ..acquire.engine import refine_doppler

        dopplers = np.array([
            refine_doppler(samples, ch.prn, ch.acq.code_phase_chips,
                           ch.acq.doppler_hz, cfg.plan)
            for ch in tracked
        ])
        refined = refine_code_phase(
            samples, table, phases, dopplers, cfg.plan, cfg.track
        )
        state = init_state(len(tracked), refined, dopplers,
                           start_epoch=start_epoch,
                           window=cfg.track.pll_check_window)
        self.tracker = StreamingTracker(state, table, self.mesh,
                                        cfg.plan, cfg.track)
        for ch in live:
            ch.state_name = "TRACKING"

    def process_block(self, samples: np.ndarray) -> None:
        cfg = self.config
        spe = cfg.plan.samples_per_epoch
        n_epochs = len(samples) // spe
        with self.profiler.stage("track", budget_s=n_epochs * 1e-3).time():
            outs = self.tracker.process(samples[: n_epochs * spe])
        with self.profiler.stage("decode").time():
            self._consume_outputs(outs, n_epochs)
        # aided bit sync operates on the sharded state directly: the
        # engage updates are elementwise jnp.where ops, so the result
        # feeds straight back into the sharded scan (pjit re-shards)
        self.track_state = self.tracker.state
        self._maybe_aided_sync(outs, n_epochs, samples[: n_epochs * spe])
        self.tracker.state = self.track_state
        self.epoch_cursor += n_epochs
        # track_state doubles as the checkpoint alias (runtime.checkpoint
        # reads it; restoring a MeshReceiver yields a plain Receiver —
        # re-shard with StreamingTracker to resume on a mesh)
