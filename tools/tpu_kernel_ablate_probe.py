"""Locate the Mosaic-vs-interpret divergence INSIDE the kernel using
its own ablation knobs (TrackConfig.ablate) — one hardware run per
variant, scalar readbacks only, interpret truth computed in-process on
the CPU backend.

Signal: noise-free, zero Doppler, integer code phase — the prompt
correlation is then a pure code autocorrelation and every loop input
is deterministic, so ANY |P| disagreement is the lowering divergence,
and which ablation makes it vanish names the construct:

  ""            full kernel
  freeze_ramp   carrier-ramp cache built once (rules out the refresh)
  wipeoff       carrier wipe-off skipped (irrelevant at 0 Hz anyway)
  nobarrel      replica barrel bypassed (E=P=L=base window)
  noforest      loop-filter forest stripped (state frozen)

Usage: python tools/tpu_kernel_ablate_probe.py [ablate ...]
"""

from __future__ import annotations

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


def _die():
    print(f"HARD-DEADLINE after: {_LAST[0]}", file=sys.stderr, flush=True)
    os._exit(3)


t = threading.Timer(int(os.environ.get("PROBE_BUDGET_S", "1500")), _die)
t.daemon = True
t.start()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN, TrackConfig  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (  # noqa: E402
    outputs_from_raw,
    pallas_track_scan,
    state_from_track_state,
)
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.simulator import (  # noqa: E402
    SimSat,
    simulate_capture,
)
from stm32f4_sdr_gps_tpu.track.state import init_state  # noqa: E402

log(f"device: {jax.devices()[0]}")

prn, cp = 7, 300.0
E = 16
sat = SimSat(prn=prn, doppler_hz=0.0, code_phase_chips=cp,
             cn0_dbhz=60.0, codes_in_bit=20, nav_bits=[0] * 4)
x, _ = simulate_capture([sat], num_epochs=E, seed=3, noise_sigma=0.0)
u2_np = upsampled_code_doubled(ca_table_bipolar([prn] * 8))
x_np = x.reshape(E, 2046).astype(np.complex64)


def run_variant(ablate: str, interpret: bool, device=None):
    cfg = TrackConfig(pll_bad_state_threshold=10**9, ablate=ablate)
    st = init_state(8, np.full(8, cp), np.zeros(8))
    ps = state_from_track_state(st)

    def f(ps, ep, u2):
        ps2, raw = pallas_track_scan(ps, ep, u2, 0, plan=BASEBAND_PLAN,
                                     cfg=cfg, interpret=interpret)
        outs = outputs_from_raw(raw, cfg)
        pmag = jnp.sqrt(outs.ip[:, 0] ** 2 + outs.qp[:, 0] ** 2)
        return (jnp.mean(pmag), pmag[0], pmag[-1],
                outs.code_phase_chips[-1, 0], outs.doppler_hz[-1, 0])

    ctx = jax.default_device(device) if device is not None else None
    if ctx:
        with ctx:
            vals = jax.jit(f)(ps, jnp.asarray(x_np), jnp.asarray(u2_np))
            return [float(np.asarray(v)) for v in vals]
    vals = jax.jit(f)(ps, jnp.asarray(x_np), jnp.asarray(u2_np))
    return [float(np.asarray(v)) for v in vals]


cpu = jax.local_devices(backend="cpu")[0]
variants = sys.argv[1:] if len(sys.argv) > 1 else [
    "", "freeze_ramp", "wipeoff", "nobarrel", "noforest"]

if os.environ.get("ABLATE_HW_ONE"):
    # child mode: ONE hardware variant (a single TPU failure poisons
    # the whole client, CPU backend included)
    ab = os.environ["ABLATE_HW_ONE"].replace("@", "")
    hw = run_variant(ab, interpret=False)
    print("HW_RESULT", ab, *[f"{v:.4f}" for v in hw], flush=True)
    sys.exit(0)

# parent: interpret refs first (pure CPU-device), then one subprocess
# per hardware variant
import subprocess

refs = {}
for ab in variants:
    try:
        refs[ab] = run_variant(ab, interpret=True, device=cpu)
        log(f"[{ab or 'full'}] interpret ref |P| mean {refs[ab][0]:.1f}")
    except Exception as e:  # noqa: BLE001
        log(f"[{ab or 'full'}] interpret ref failed: {type(e).__name__}")

for ab in variants:
    if ab not in refs:
        continue
    env = dict(os.environ, ABLATE_HW_ONE=ab or "@")
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True,
                       timeout=900)
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("HW_RESULT")]
    if not line:
        err = [ln for ln in r.stderr.splitlines() if "Error" in ln]
        log(f"[{ab or 'full'}] hw child failed: "
            f"{err[-1][:70] if err else r.returncode}")
        time.sleep(20)
        continue
    hw = [float(v) for v in line[0].split()[2:]]
    ref = refs[ab]
    match = abs(hw[0] - ref[0]) / max(ref[0], 1.0) < 0.02
    log(f"[{ab or 'full'}] |P| mean hw {hw[0]:.1f} vs ref {ref[0]:.1f} "
        f"({'MATCH' if match else 'DIVERGE'}); first/last hw "
        f"{hw[1]:.1f}/{hw[2]:.1f} ref {ref[1]:.1f}/{ref[2]:.1f}; "
        f"cp_end hw {hw[3]:.3f} ref {ref[3]:.3f}")
    time.sleep(10)
