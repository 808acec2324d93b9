"""Multi-process decode: the gps_master role distributed across hosts.

On a multi-process mesh the tracking scan shards channels over EVERY
device (parallel.streaming.StreamingTracker), so each process's devices
hold a contiguous channel block.  Nav decode is 50 bps/channel of
control-heavy host work — exactly what should NOT be centralized: each
process runs the framers/ephemeris decode for ITS OWN channel shard
(:class:`ShardDecoder`, reusing the single-process Receiver's decode
path verbatim via runtime.receiver.push_channel_bit), and only the
tiny per-channel observables + decoded ephemerides are gathered (JSON
blobs over ``multihost_utils.process_allgather``) to the process that
forms observations and solves PVT.

Reference role: ``gps_master_nav_handling`` + ``gps_master_calculate_pos``
(gps_master.c:159-425) — a single-MCU loop here split as
per-host decode → gather → one solver, the standard controller layout
for a sharded streaming receiver.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

import numpy as np

from ..config import ReceiverConfig
from ..pvt.observables import ChannelObservables, form_observations
from ..pvt.solve import pntpos
from .digest import BlockDigest, cn0_from_moments
from .receiver import ChannelStatus, push_channel_bit


def local_digest_block(d: BlockDigest) -> Tuple[BlockDigest, int]:
    """Extract THIS process's channel columns from a globally-sharded
    BlockDigest (leaves (C,) or (K, C) with the channel axis sharded
    over the whole mesh).

    Returns ``(numpy digest over the local channel block, col_start)``.
    Channel blocks are contiguous per process because
    shard_track_state/StreamingTracker shard the channel axis over the
    flattened device order and jax assigns devices to processes in
    blocks.
    """
    starts = None
    cols: Optional[slice] = None
    leaves = []
    for leaf in d:
        ax = leaf.ndim - 1                    # channel axis is last
        shards = sorted(leaf.addressable_shards,
                        key=lambda s: s.index[ax].start or 0)
        lo = min((s.index[ax].start or 0) for s in shards)
        hi = max(s.index[ax].stop or leaf.shape[ax] for s in shards)
        out = np.zeros(leaf.shape[:ax] + (hi - lo,),
                       np.asarray(shards[0].data).dtype)
        for s in shards:
            sl = s.index[ax]
            a = (sl.start or 0) - lo
            out[..., a: a + (sl.stop - (sl.start or 0))] = \
                np.asarray(s.data)
        leaves.append(out)
        if starts is None:
            starts, cols = lo, slice(lo, hi)
        elif (lo, hi) != (cols.start, cols.stop):
            raise ValueError("inconsistent channel shards across leaves")
    return BlockDigest(*leaves), int(starts)


class ShardDecoder:
    """Per-process framers/ephemeris for a channel shard.

    Consumes (local columns of) per-block digests and maintains the
    same ChannelStatus the single-process Receiver would for those
    channels: nav bits → framer → subframes → ephemeris → boundary
    ledger, plus the loop observables PVT needs.
    """

    def __init__(self, prns, config: ReceiverConfig,
                 start_epoch: int = 0):
        self.config = config
        self.epoch_cursor = start_epoch
        cib = config.track.codes_in_bit
        self.channels: List[ChannelStatus] = [
            ChannelStatus(prn=int(p)) for p in prns
        ]
        for ch in self.channels:
            ch.framer.polarity_timeout_ms = 600 * cib
            ch.state_name = "TRACKING"

    def consume_digest(self, d: BlockDigest, n_epochs: int) -> None:
        """Fold one block's digest (numpy leaves, columns = this
        shard's channels in order) into the channel states."""
        cfg = self.config
        cib = cfg.track.codes_in_bit
        for c, ch in enumerate(self.channels):
            for k in range(int(d.bit_count[c])):
                push_channel_bit(ch, int(d.bit_value[k, c]),
                                 int(d.bit_epoch[k, c]), cib)
            ch.snr_db = float(d.snr_db[c])
            ch.bit_synced = bool(d.period_sync_ok[c])
            ch.cn0_dbhz = cn0_from_moments(
                float(d.cn0_m2[c]), float(d.cn0_m4[c]), int(d.cn0_n[c]))
            ch.doppler_hz = float(d.doppler_hz[c])
            ch.carrier_cycles += float(d.doppler_sum[c]) * 1e-3
            ch.code_phase_chips = float(
                d.code_phase_filtered[c] if cfg.enable_code_filter
                else d.code_phase_chips[c])
        self.epoch_cursor += n_epochs

    # -- gather + solve ----------------------------------------------------

    def encode_shard(self) -> bytes:
        """Observables + decoded ephemerides of this shard as a JSON
        blob (the structured checkpoint codec — no pickle)."""
        from .checkpoint import _encode

        rows = []
        for ch in self.channels:
            rows.append(dict(
                prn=ch.prn,
                subframe_time_ms=ch.subframe_time_ms,
                tow_s=ch.subframe_tow_s,
                week=ch.eph.week,
                code_phase_chips=ch.code_phase_chips,
                doppler_hz=ch.doppler_hz,
                snr_db=ch.snr_db,
                has_eph=bool(ch.eph.has_full_set),
                eph=_encode(ch.eph),
            ))
        return json.dumps(rows).encode("utf-8")


def allgather_blobs(blob: bytes, max_len: int = 1 << 16) -> List[bytes]:
    """All-gather one variable-length byte blob per process (fixed-size
    uint8 padding over multihost_utils.process_allgather)."""
    from jax.experimental import multihost_utils

    if len(blob) > max_len:
        raise ValueError(f"shard blob {len(blob)} > max_len {max_len}")
    arr = np.zeros(max_len + 8, np.uint8)
    arr[:8] = np.frombuffer(
        np.uint64(len(blob)).tobytes(), np.uint8)
    arr[8: 8 + len(blob)] = np.frombuffer(blob, np.uint8)
    gathered = multihost_utils.process_allgather(arr)  # (n_proc, L)
    out = []
    for row in np.asarray(gathered):
        n = int(np.frombuffer(row[:8].tobytes(), np.uint64)[0])
        out.append(row[8: 8 + n].tobytes())
    return out


def gather_and_solve(decoder: ShardDecoder, meas_epoch_ms: int,
                     x0=None, solve: bool = True):
    """Gather every process's shard observables, form one observation
    set, and (optionally) run PVT.

    Every process calls this collectively (the allgather is a
    collective); each gets the same (obs, solution) back, so any
    process can act on the fix.  Returns (obs, solution_or_None).
    """
    from .checkpoint import _decode

    blobs = allgather_blobs(decoder.encode_shard())
    rows = []
    for blob in blobs:
        rows.extend(json.loads(blob.decode("utf-8")))
    eph_map = {}
    chobs = []
    seen = set()
    for r in rows:
        if r["subframe_time_ms"] <= 0:
            continue
        if r["prn"] in seen:
            continue       # ghost padding duplicates a real channel
        seen.add(r["prn"])
        chobs.append(ChannelObservables(
            prn=r["prn"], subframe_time_ms=r["subframe_time_ms"],
            tow_s=r["tow_s"], week=r["week"],
            code_phase_chips=r["code_phase_chips"],
            doppler_hz=r["doppler_hz"], snr_db=r["snr_db"]))
        if r["has_eph"]:
            eph_map[r["prn"]] = _decode(r["eph"])
    obs = form_observations(chobs, meas_epoch_ms)
    if obs is None or not solve:
        return obs, None
    usable = [o for o in obs if o.sat in eph_map]
    if len(usable) < 4:
        return obs, None
    sol = pntpos(usable, eph_map, x0=x0)
    return obs, sol
