"""Wait for a healthy tunnel window, then validate the TPU pipeline.

Today's bisect established the transport's actual failure law: in
degraded windows (often tens of minutes) compiling-and-running any NEW
program fails at its first sync, while fully-CACHED programs keep
executing.  Worse, a program whose FIRST compile+run happened inside a
degraded window can enter the persistent cache poisoned — the e2e's
256-epoch conditioner produced deterministic garbage baseband on two
separate runs while the same math in interpret mode locks perfectly.

This driver:
  1. probes the window with a tiny UNIQUE program (forced fresh
     compile) + readback every --poll seconds;
  2. on a good window, immediately runs the conditioner value
     cross-check and the 1-channel in-kernel tracking check
     (tools/tpu_kernel_check.py logic, inline) — fresh compiles with
     sizes namespaced by --tag so a poisoned cache entry can be
     retired by changing the tag.

Usage: python tools/tpu_window_check.py [--budget-s 3600] [--poll 240]
       [--tag a]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_LAST = ["start"]


def log(m):
    _LAST[0] = m
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=int, default=3600)
    ap.add_argument("--poll", type=int, default=240)
    ap.add_argument("--tag", default="a",
                    help="cache namespace: changes the checked program "
                         "sizes slightly so a poisoned cache entry is "
                         "bypassed")
    args = ap.parse_args()

    def _die():
        print(f"HARD-DEADLINE after: {_LAST[0]}", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = threading.Timer(args.budget_s, _die)
    t.daemon = True
    t.start()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    log(f"device: {jax.devices()[0]}")

    # --- 1. window canary: unique fresh program + readback ---------------
    def window_good() -> bool:
        salt = int(time.time()) % 100000

        @jax.jit
        def probe(a):
            return jnp.sum(a * a) + salt

        try:
            v = float(np.asarray(probe(jnp.arange(64.0))))
            log(f"canary OK ({v:.0f})")
            return True
        except Exception as e:  # noqa: BLE001
            log(f"canary failed: {type(e).__name__}")
            return False

    while not window_good():
        log(f"degraded window — sleeping {args.poll}s")
        time.sleep(args.poll)

    # --- 2. conditioner value cross-check (fresh sizes via tag) ----------
    from stm32f4_sdr_gps_tpu.config import (
        BASEBAND_PLAN,
        REFERENCE_PLAN,
        TrackConfig,
    )
    from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled
    from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (
        state_from_track_state,
    )
    from stm32f4_sdr_gps_tpu.runtime.digest import cn0_from_moments
    from stm32f4_sdr_gps_tpu.runtime.receiver import (
        _track_and_digest_carried,
    )
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.signal.capture import (
        pack_bits_lsb16,
        reference_to_baseband,
        reference_to_baseband_device,
    )
    from stm32f4_sdr_gps_tpu.signal.simulator import (
        SimSat,
        simulate_capture,
    )
    from stm32f4_sdr_gps_tpu.track.state import init_state

    # tag-dependent epoch count => different shapes => fresh cache rows
    n_epochs = {"a": 96, "b": 112, "c": 80}.get(args.tag, 96)
    spe = 2046
    prn, dop_true, cp_true, cn0 = 7, 1234.0, 300.25, 55.0
    sat = SimSat(prn=prn, doppler_hz=dop_true, code_phase_chips=cp_true,
                 cn0_dbhz=cn0, codes_in_bit=20,
                 nav_bits=list(np.random.default_rng(0).integers(0, 2, 64)))
    x, _ = simulate_capture([sat], num_epochs=n_epochs,
                            plan=REFERENCE_PLAN, seed=2)
    words = pack_bits_lsb16(x)
    wd = jax.device_put(words)
    bb = jax.jit(reference_to_baseband_device)(wd)
    # scalar checksums via jit: eager-slice ARRAY readbacks are the one
    # readback class this transport reliably rejects, while jit SCALAR
    # outputs read back fine (r5 findings) — three moments pin the
    # values well enough to catch any wrong-unpack/mix/decimate
    host_bb = reference_to_baseband(x[: n_epochs * 16368])

    @jax.jit
    def sums(b):
        w = jnp.arange(b.shape[0], dtype=jnp.float32) * 1e-4
        return (jnp.sum(jnp.abs(b) ** 2), jnp.sum(b.real * w),
                jnp.sum(b.imag * w))

    try:
        dev_s = [float(np.asarray(v)) for v in sums(bb)]
    except Exception as e:  # noqa: BLE001
        log(f"conditioner readback failed mid-window: {type(e).__name__}")
        sys.exit(3)
    w = np.arange(len(host_bb), dtype=np.float32) * 1e-4
    host_s = [float((np.abs(host_bb) ** 2).sum()),
              float((host_bb.real * w).sum()),
              float((host_bb.imag * w).sum())]
    errs = [abs(a - b) / max(abs(b), 1.0)
            for a, b in zip(dev_s, host_s)]
    log(f"conditioner checksums ({n_epochs} ep): dev {dev_s} vs "
        f"host {host_s} (rel err {max(errs):.2e})")
    if max(errs) > 1e-3:
        log("CONDITIONER WRONG on this hardware (fresh compile!)")
        sys.exit(2)

    # --- 3. in-kernel tracking check -------------------------------------
    cfg = TrackConfig(pll_bad_state_threshold=10**9)
    u2 = jnp.asarray(upsampled_code_doubled(ca_table_bipolar([prn])))
    state = init_state(1, np.array([cp_true]), np.array([dop_true]),
                       window=cfg.pll_check_window)
    ps = state_from_track_state(state)
    epochs = bb[: n_epochs * spe].reshape(n_epochs, spe)
    epochs = epochs.astype(jnp.complex64)
    t0 = time.perf_counter()
    log("compiling + running the in-kernel scan (fresh)")
    ps2, ts, d = _track_and_digest_carried(ps, epochs, u2, BASEBAND_PLAN,
                                           cfg, 100, True)
    d = jax.tree.map(np.asarray, d)
    log(f"kernel block in {time.perf_counter()-t0:.1f}s (incl. compile)")
    dop = float(d.doppler_hz[0])
    cn0_est = cn0_from_moments(float(d.cn0_m2[0]), float(d.cn0_m4[0]),
                               int(d.cn0_n[0]))
    log(f"doppler {dop:+.1f} (planted {dop_true:+.1f}); C/N0 "
        f"{cn0_est:.1f} (planted {cn0})")
    ok = abs(dop - dop_true) < 10.0 and cn0_est > cn0 - 12.0
    log("KERNEL " + ("OK" if ok else "WRONG"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
