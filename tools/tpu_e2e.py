"""The COMPLETE receiver on the TPU: cold start to position fix.

The reference's defining property is the whole pipeline live on its
target hardware (main.c:86-104 — acquisition, tracking, decode, solve,
output on the MCU).  This driver reproduces that bar on the TPU:

* stimulus: the INDEPENDENT C++ generator's wire-format capture
  (native/capture_gen.cpp — 1-bit real signs at 16.368 MHz packed into
  uint16 SPI words, 2 046 bytes/ms, signal_capture.c:9-11,143-177);
* ingest (--ingest): 'wire' uploads whole-epoch word chunks at ~0.5 MB
  each (under the axon tunnel's ~1 MB host->device cap) and conditions
  to complex baseband ON DEVICE (reference_to_baseband_device) — the
  16x larger complex stream only ever exists in HBM; 'baseband'
  conditions on the host and uploads complex64 pieces (the isolation /
  poisoned-cache workaround mode);
* pipeline: the stock Receiver — acquisition cube (+ device peak
  analysis), batched fine-Doppler + pre-track, the in-kernel Pallas
  track+digest program per block (backend-aware default), host decode /
  PVT.  The only per-block device->host transfer is the ~kB digest;
* verdict: solved position vs the generator's planted truth (<500 m),
  plus an honest whole-receiver wall-clock x-real-time number.  Wall
  clock IS valid here: every block ends in a digest READBACK, which
  (unlike block_until_ready on this transport) returns real data and
  therefore really synchronizes — but it includes the tunnel RTT per
  block, so the number is a lower bound on what co-located hardware
  sustains; per-block times are logged so the RTT floor is visible.

Transport discipline (CLAUDE.md): the process self-watchdogs via
signal.alarm + os._exit and is resumable — every run processes at most
--blocks-per-run blocks, checkpoints the full receiver state
(runtime.checkpoint), and exits; rerun to continue.  A wedged tunnel
window therefore costs one run, not the capture.

Usage:
    python tools/tpu_e2e.py [--duration-ms 29000] [--cn0 48] [--cib 20]
        [--blocks-per-run 60] [--block-epochs 256]
        [--state-dir /tmp/tpu_e2e] [--fresh] [--budget-s 1500]
Artifacts: <state-dir>/progress.json (cumulative), TPU_E2E.json at the
repo root when the capture completes.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = Path(__file__).resolve().parents[1]
NATIVE_DIR = REPO / "native"
WORDS_PER_EPOCH = 1023          # 16368 samples/ms / 16 bits per word
_LAST = ["start"]


def log(m):
    _LAST[0] = m
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _alarm(sig, frm):  # noqa: ARG001
    print(f"SELF-ALARM after: {_LAST[0]}", file=sys.stderr, flush=True)
    os._exit(3)


def ensure_capture(state: Path, duration_ms: int, cn0: float, cib: int,
                   seed: int, repeats: int):
    """Generate (once) the independent wire-format capture + truth."""
    cap, truth = state / "cap.bin", state / "truth.json"
    if cap.exists() and truth.exists():
        return np.fromfile(cap, dtype=np.uint16), json.loads(
            truth.read_text())
    log(f"generating {duration_ms} ms capture (capture_gen, cib={cib}, "
        f"cn0={cn0})")
    subprocess.run(["make", "-s", "-C", str(NATIVE_DIR), "capture_gen"],
                   check=True)
    subprocess.run(
        [str(NATIVE_DIR / "capture_gen"), "--out", str(cap),
         "--truth", str(truth), "--cib", str(cib),
         "--duration-ms", str(duration_ms), "--cn0", str(cn0),
         "--seed", str(seed), "--repeats", str(repeats)],
        check=True, capture_output=True)
    return np.fromfile(cap, dtype=np.uint16), json.loads(truth.read_text())


class BasebandDeviceCapture:
    """Host-conditioned ingest: the whole capture is converted to
    complex baseband on the host once (fast strided conditioner,
    ~26 ms/s of capture), then served to the device in <1 MB pieces
    assembled by one cached concat program.  Functionally equivalent
    to ChunkedDeviceCapture with the conditioning moved off-device."""

    PIECE_E = 48                      # 48 epochs x 2046 c64 = 786 KB

    def __init__(self, words: np.ndarray, spe: int,
                 one_piece: bool = False):
        self.one_piece = one_piece
        from stm32f4_sdr_gps_tpu.runtime import native as native_mod
        from stm32f4_sdr_gps_tpu.signal.capture import (
            reference_to_baseband,
        )

        t0 = time.perf_counter()
        self.bb = reference_to_baseband(
            native_mod.unpack_bits16(np.asarray(words)))
        self.spe = spe
        self.total_epochs = len(self.bb) // spe
        self.upload_s = 0.0
        self.uploads = 0
        self._assemble = None
        print(f"host conditioner: {self.total_epochs} epochs in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr,
              flush=True)

    def epochs(self, start_epoch: int, n_epochs: int):
        import jax
        import jax.numpy as jnp

        end = min(start_epoch + n_epochs, self.total_epochs)
        t0 = time.perf_counter()
        if self.one_piece:
            # one device_put per block (multi-MB uploads measured OK on
            # this transport) — introduces NO device programs at all,
            # which matters when fresh compiles are failing/poisoned
            out = jax.device_put(
                self.bb[start_epoch * self.spe: end * self.spe])
            self.upload_s += time.perf_counter() - t0
            self.uploads += 1
            return out
        pe = self.PIECE_E
        pieces = []
        for e0 in range(start_epoch, end, pe):
            e1 = min(e0 + pe, end)
            pieces.append(jax.device_put(
                self.bb[e0 * self.spe: e1 * self.spe]))
        self.upload_s += time.perf_counter() - t0
        self.uploads += len(pieces)
        if len(pieces) == 1:
            return pieces[0]
        if self._assemble is None:
            self._assemble = jax.jit(
                lambda *ps: jnp.concatenate(ps))
        return self._assemble(*pieces)


class ChunkedDeviceCapture:
    """Serves arbitrary whole-epoch ranges of the capture as device
    arrays, uploading + conditioning fixed-size wire chunks on demand
    and dropping chunks behind the read cursor (bounded HBM)."""

    def __init__(self, words: np.ndarray, chunk_epochs: int, spe: int):
        import jax

        self.words = words
        self.chunk_epochs = chunk_epochs
        self.spe = spe
        self.total_epochs = len(words) // WORDS_PER_EPOCH
        self._chunks: dict = {}
        from stm32f4_sdr_gps_tpu.signal.capture import (
            reference_to_baseband_device,
        )

        self._condition = jax.jit(reference_to_baseband_device)
        self.upload_s = 0.0
        self.uploads = 0

    def _chunk(self, idx: int):
        import jax

        c = self._chunks.get(idx)
        if c is not None:
            return c
        w0 = idx * self.chunk_epochs * WORDS_PER_EPOCH
        w1 = min(w0 + self.chunk_epochs * WORDS_PER_EPOCH, len(self.words))
        t0 = time.perf_counter()
        dev_words = jax.device_put(self.words[w0:w1])
        bb = self._condition(dev_words)
        self.upload_s += time.perf_counter() - t0
        self.uploads += 1
        self._chunks[idx] = bb
        return bb

    def epochs(self, start_epoch: int, n_epochs: int):
        """Flat (n_epochs * spe,) complex64 device array."""
        import jax.numpy as jnp

        end_epoch = min(start_epoch + n_epochs, self.total_epochs)
        i0 = start_epoch // self.chunk_epochs
        i1 = (end_epoch - 1) // self.chunk_epochs
        parts = [self._chunk(i) for i in range(i0, i1 + 1)]
        flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        off = (start_epoch - i0 * self.chunk_epochs) * self.spe
        # free chunks strictly behind the new cursor
        for k in [k for k in self._chunks if k < i0]:
            del self._chunks[k]
        return flat[off: off + (end_epoch - start_epoch) * self.spe]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration-ms", type=int, default=29_000)
    ap.add_argument("--cn0", type=float, default=48.0)
    ap.add_argument("--cib", type=int, default=20)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--blocks-per-run", type=int, default=60)
    ap.add_argument("--block-epochs", type=int, default=256)
    ap.add_argument("--chunk-epochs", type=int, default=256)
    ap.add_argument("--state-dir", default="/tmp/tpu_e2e")
    ap.add_argument("--budget-s", type=int, default=1500)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--ingest", default="wire",
                    choices=("wire", "baseband", "baseband1"),
                    help="'wire' uploads 1-bit words and conditions on "
                         "device (2 KB/ms); 'baseband' conditions on "
                         "the host and uploads complex64 in <1MB "
                         "pieces (16 KB/ms) — bypasses the on-device "
                         "conditioner (isolation mode; also the "
                         "workaround for a poisoned conditioner cache "
                         "entry)")
    ap.add_argument("--jnp-track", action="store_true",
                    help="force the jnp lax.scan tracking backend "
                         "(no Mosaic kernel) — numerical-correctness "
                         "runs on transports whose fresh Mosaic "
                         "compiles are suspect")
    ap.add_argument("--acq", default="host",
                    choices=("host", "device", "auto"),
                    help="cold-start bootstrap: 'host' (default) runs "
                         "the one-time 300-epoch acquisition + handoff "
                         "on the CPU backend — the streaming pipeline "
                         "(the throughput claim) is on the TPU either "
                         "way, and a device attempt can HANG for the "
                         "whole run budget in a degraded tunnel "
                         "window; 'device' requires the device chain; "
                         "'auto' tries device then falls back")
    ap.add_argument("--require-device-acq", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--allow-cpu", action="store_true")
    ap.add_argument("--force-cpu", action="store_true",
                    help="run the whole flow on the CPU backend "
                         "(tool smoke test; this machine's sitecustomize "
                         "ignores JAX_PLATFORMS, so set it in-process)")
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(args.budget_s)
    # signal.alarm cannot fire while the main thread is blocked inside
    # a C call (grpc/XLA RPC) — a timer THREAD os._exit()s regardless
    import threading

    def _die():
        print(f"HARD-DEADLINE after: {_LAST[0]}", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = threading.Timer(args.budget_s + 60, _die)
    t.daemon = True
    t.start()

    state = Path(args.state_dir)
    state.mkdir(parents=True, exist_ok=True)
    if args.fresh:
        for f in ("ckpt.npz", "progress.json"):
            (state / f).unlink(missing_ok=True)

    words, truth = ensure_capture(state, args.duration_ms, args.cn0,
                                  args.cib, args.seed, args.repeats)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
        args.allow_cpu = True
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    if dev.platform != "tpu" and not args.allow_cpu:
        log("not a TPU (use --allow-cpu to run anyway)")
        sys.exit(2)

    from stm32f4_sdr_gps_tpu.config import (
        BASEBAND_PLAN,
        ReceiverConfig,
        TrackConfig,
    )
    from stm32f4_sdr_gps_tpu.runtime.checkpoint import (
        load_receiver,
        save_receiver,
    )
    from stm32f4_sdr_gps_tpu.runtime.receiver import Receiver

    spe = BASEBAND_PLAN.samples_per_epoch
    cap = (BasebandDeviceCapture(
               words, spe, one_piece=args.ingest == "baseband1")
           if args.ingest.startswith("baseband")
           else ChunkedDeviceCapture(words, args.chunk_epochs, spe))
    prns = tuple(s["prn"] for s in truth["sats"])

    prog_path = state / "progress.json"
    prog = (json.loads(prog_path.read_text()) if prog_path.exists()
            else {"cursor": 0, "block_wall_s": [], "stage_s": {},
                  "started": time.time(), "runs": 0})
    prog["runs"] += 1

    ckpt = state / "ckpt.npz"
    if ckpt.exists():
        rx = load_receiver(str(ckpt))
        # the checkpoint's own ledger is the cursor of record (a crash
        # between a mid-run checkpoint and the progress write would
        # otherwise desync them)
        prog["cursor"] = rx.epoch_cursor
        log(f"resuming from checkpoint at epoch {prog['cursor']}")
    else:
        # keep acquisition + handoff inside the first chunk; matmul-DFT
        # acquisition (MXU path, tiny uploads — measured 1.9 ms/cube)
        import dataclasses

        cfg = ReceiverConfig(
            prns=prns,
            track=TrackConfig(codes_in_bit=args.cib,
                              pll_bad_state_threshold=10**9,
                              in_kernel_scan=(False if args.jnp_track
                                              else None)),
            track_block_epochs=args.block_epochs,
        )
        cfg = cfg.replace(
            acq=dataclasses.replace(cfg.acq, use_matmul_dft=True))
        rx = Receiver(cfg)
        acq_e = cfg.acq.noncoherent_epochs
        handoff_e = max(256 + acq_e, args.chunk_epochs)
        t0 = time.perf_counter()
        results = None
        if args.acq in ("device", "auto"):
            samples0 = cap.epochs(0, handoff_e)
            log("cold start: acquiring on device")
            # the tunnel flips UNIMPLEMENTED (or HANGS until the run
            # deadline) in degraded windows minutes long (CLAUDE.md)
            attempts = 3 if args.acq == "device" else 1
            for attempt in range(attempts):
                try:
                    results = rx.acquire_all(samples0)
                    break
                except Exception as e:  # noqa: BLE001
                    log(f"device acquire attempt {attempt}: "
                        f"{type(e).__name__}: "
                        f"{str(e).splitlines()[0][:80]}")
                    if attempt + 1 < attempts:
                        time.sleep(60)
        host_bootstrap = False
        if results is None:
            if args.acq == "device" or args.require_device_acq:
                sys.exit(4)
            log("cold start: falling back to HOST (CPU-backend) "
                "acquisition + handoff on the same wire data")
            host_bootstrap = True
            prog["host_acq_fallback"] = True
            from stm32f4_sdr_gps_tpu.runtime import native as native_mod
            from stm32f4_sdr_gps_tpu.signal.capture import (
                reference_to_baseband,
            )

            host_bb = reference_to_baseband(native_mod.unpack_bits16(
                np.asarray(words[: handoff_e * WORDS_PER_EPOCH])))
            cpu_dev = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu_dev):
                rx.acquire_all(host_bb)
                rx.start_tracking(host_bb[acq_e * spe:],
                                  start_epoch=acq_e)
            # re-home the bootstrap state: numpy leaves re-upload to
            # the TPU at the first tracking dispatch.  The code table
            # MUST be rebuilt for the resolved (TPU) backend — the
            # CPU-context bootstrap may have built the raw jnp-scan
            # form, which the Pallas kernel would read as garbage.
            rx.track_state = jax.tree.map(np.asarray, rx.track_state)
            rx.code_table = rx._device_code_table(rx.code_table_np)
        for r in (rx.channels and [c.acq for c in rx.channels if c.acq]
                  or []):
            log(f"  PRN {r.prn}: detected={r.detected} "
                f"dop={r.doppler_hz:+.0f} Hz cp={r.code_phase_chips:.1f} "
                f"ratio={r.peak_ratio:.2f}")
        if not host_bootstrap:
            log("cold start: fine Doppler + pre-track handoff")
            rx.start_tracking(samples0[acq_e * spe:], start_epoch=acq_e)
        rx.epoch_cursor = acq_e
        prog["cold_start_s"] = time.perf_counter() - t0
        prog["cursor"] = acq_e
        log(f"cold start done in {prog['cold_start_s']:.1f}s "
            f"(incl. first-run compiles)")
        # checkpoint NOW: a later degraded window must not redo the
        # cold start (the expensive compile chain)
        save_receiver(str(ckpt), rx)
        prog_path.write_text(json.dumps(prog))

    # ---- stream blocks ---------------------------------------------------
    be = args.block_epochs
    done_blocks = 0
    fails = 0
    while (prog["cursor"] + be <= cap.total_epochs
           and done_blocks < args.blocks_per_run):
        t0 = time.perf_counter()
        try:
            block = cap.epochs(prog["cursor"], be)
            rx.process_block(block)
        except Exception as e:  # noqa: BLE001
            # degraded-window failure mid-stream: the receiver state
            # for this block is indeterminate — reload the last good
            # checkpoint and wait the window out IN-PROCESS (process
            # churn wedges the tunnel's claim for minutes), giving up
            # only after repeated failures
            fails += 1
            log(f"block at epoch {prog['cursor']} failed ({fails}): "
                f"{type(e).__name__}: {str(e).splitlines()[0][:80]}")
            if fails >= 3:
                prog_path.write_text(json.dumps(prog))
                sys.exit(4)
            time.sleep(150)
            try:
                rx = load_receiver(str(ckpt))
                prog["cursor"] = rx.epoch_cursor
            except Exception as e2:  # noqa: BLE001
                # still inside the bad window (the reload's device_put
                # failed) — give the run up; the next invocation resumes
                log(f"checkpoint reload failed too: {type(e2).__name__}")
                prog_path.write_text(json.dumps(prog))
                sys.exit(4)
            getattr(cap, "_chunks", {}).clear()  # re-upload past the bad window
            continue
        wall = time.perf_counter() - t0
        prog["cursor"] += be
        prog["block_wall_s"].append(round(wall, 4))
        done_blocks += 1
        if done_blocks % 10 == 0 or done_blocks == 1:
            n_sf = sum(ch.subframe_count for ch in rx.channels)
            log(f"epoch {prog['cursor']}/{cap.total_epochs}  "
                f"block {wall*1e3:.0f} ms  subframes={n_sf} "
                f"fixes={len(rx.solutions)}")
        if done_blocks % 20 == 0:
            save_receiver(str(ckpt), rx)
            prog_path.write_text(json.dumps(prog))

    save_receiver(str(ckpt), rx)
    for name, st in rx.profiler.stages.items():
        prog.setdefault("stage_s", {})[name] = round(st.total_s, 3)
    prog["upload_s"] = round(cap.upload_s, 3)
    prog_path.write_text(json.dumps(prog))

    n_solutions = len(rx.solutions)
    log(f"run complete: cursor={prog['cursor']} blocks+={done_blocks} "
        f"solutions={n_solutions}")
    for ch in rx.channels:
        log(f"  PRN {ch.prn}: {ch.state_name} bits={ch.bit_count} "
            f"subframes={ch.subframe_count} eph_full={ch.eph.has_full_set} "
            f"cn0={ch.cn0_dbhz:.1f}")

    if prog["cursor"] + be > cap.total_epochs:
        # capture consumed — final verdict
        out = {
            "device": str(dev),
            "epochs_processed": prog["cursor"],
            "cold_start_s": prog.get("cold_start_s"),
            "runs": prog["runs"],
            "blocks": len(prog["block_wall_s"]),
            "block_epochs": be,
            "upload_s": prog["upload_s"],
            "solutions": n_solutions,
        }
        bw = np.asarray(prog["block_wall_s"])
        if len(bw):
            # drop the first block (first-run compile tail) for the
            # sustained figure; report the spread either way
            steady = bw[1:] if len(bw) > 1 else bw
            out["block_wall_s_min_med_max"] = [
                round(float(f(steady)), 4)
                for f in (np.min, np.median, np.max)]
            out["sustained_rt_x"] = round(
                be * 1e-3 / float(np.median(steady)), 3)
            out["whole_capture_rt_x"] = round(
                len(bw) * be * 1e-3 / float(bw.sum()), 3)
        if rx.solutions:
            rr_true = np.asarray(truth["rr_ecef"])
            errs = [float(np.linalg.norm(s.rr - rr_true))
                    for s in rx.solutions]
            out["fix_error_m_last"] = round(errs[-1], 1)
            out["fix_error_m_min"] = round(min(errs), 1)
            out["fix_error_m_all"] = [round(e, 1) for e in errs]
            ok = errs[-1] < 500.0
            out["pass"] = bool(ok and all(
                ch.eph.has_full_set for ch in rx.channels))
            log(f"FIX: {errs[-1]:.1f} m from planted truth "
                f"({n_solutions} solutions) => "
                f"{'PASS' if out['pass'] else 'FAIL'}")
        else:
            out["pass"] = False
            log("NO FIX obtained")
        (REPO / "TPU_E2E.json").write_text(json.dumps(out, indent=1))
        log(f"wrote {REPO / 'TPU_E2E.json'}")
    else:
        log(f"capture not finished — rerun to continue "
            f"({cap.total_epochs - prog['cursor']} epochs left)")


if __name__ == "__main__":
    main()
