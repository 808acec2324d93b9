"""Bisect the tpu_e2e cold-start acquisition chain on the TPU.

tools/tpu_e2e.py deterministically hits UNIMPLEMENTED reading back the
(P,)-vector outputs of analyze_power_device when the input epochs come
from the uploaded-wire-words conditioner.  The readback probe showed
kB-scale readbacks work in general, and bench.py executes the same
acquisition program (trace-timed, never read back) — so bisect: which
step of THIS chain poisons the readback?

Stages (each reads back a tiny value):
  cond       upload 266 epochs of wire words, condition, scalar checksum
  slice      + reshape/slice to (10, 2046) epoch matrix, scalar checksum
  cube-fft   + FFT acquisition cube, scalar checksum of the cube mean
  cube-mm    + matmul-DFT acquisition cube, scalar checksum
  analyze-fft / analyze-mm   + analyze_power_device, read (P,) vectors

Usage: python tools/tpu_acq_bisect.py <stage>
"""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LAST = ["start"]


def log(m):
    _LAST[0] = m
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _alarm(sig, frm):  # noqa: ARG001
    print(f"SELF-ALARM after: {_LAST[0]}", file=sys.stderr, flush=True)
    os._exit(3)


signal.signal(signal.SIGALRM, _alarm)
signal.alarm(int(os.environ.get("PROBE_BUDGET_S", "420")))

# signal.alarm alone cannot fire while the main thread is blocked
# inside a C call (grpc/XLA RPC) — a timer THREAD os._exit()s anyway.
import threading as _th


def _hard_deadline(budget_s: float):
    def _die():
        print(f"HARD-DEADLINE after: {_LAST[0]}", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = _th.Timer(budget_s, _die)
    t.daemon = True
    t.start()


_hard_deadline(int(os.environ.get("PROBE_BUDGET_S", "420")) + 30)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from stm32f4_sdr_gps_tpu.config import AcqConfig, BASEBAND_PLAN  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.capture import (  # noqa: E402
    reference_to_baseband_device,
)

stage = sys.argv[1] if len(sys.argv) > 1 else "analyze-mm"
plan = BASEBAND_PLAN
s = plan.samples_per_epoch
dev = jax.devices()[0]
log(f"device: {dev} ({dev.platform}); stage={stage}")

n_up = int(os.environ.get("PROBE_EPOCHS", "266"))
words_path = "/tmp/tpu_e2e/cap.bin"
if os.path.exists(words_path) and not os.environ.get("PROBE_RANDOM"):
    words = np.fromfile(words_path, dtype=np.uint16)[: n_up * 1023]
    log(f"using the real e2e capture words ({n_up} epochs)")
else:
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 16, n_up * 1023).astype(np.uint16)
    log(f"using random words ({n_up} epochs)")

wd = jax.device_put(words)
bb = jax.jit(reference_to_baseband_device)(wd)
log("conditioner dispatched")
if stage == "cond":
    v = float(np.asarray(jnp.sum(jnp.abs(bb) ** 2)))
    log(f"cond checksum OK: {v:.1f}")
    sys.exit(0)

e = 10
if stage.endswith("-rand"):
    # bench-style input: fresh on-device PRNG epochs, NOT the
    # conditioner chain — separates "cube+readback fails in general"
    # from "chaining from the conditioner breaks it"
    @jax.jit
    def _mk(k):
        kr, ki = jax.random.split(k)
        return (jax.random.normal(kr, (e, s), jnp.float32)
                + 1j * jax.random.normal(ki, (e, s), jnp.float32))

    epochs = _mk(jax.random.PRNGKey(2))
    stage = stage[: -len("-rand")]
else:
    epochs = jnp.asarray(bb[: e * s].reshape(e, s), jnp.complex64)
if stage == "slice":
    v = float(np.asarray(jnp.sum(jnp.abs(epochs) ** 2)))
    log(f"slice checksum OK: {v:.1f}")
    sys.exit(0)

from stm32f4_sdr_gps_tpu.acquire.engine import (  # noqa: E402
    acquisition_power,
    analyze_power_device,
    exclusion_lags,
)
from stm32f4_sdr_gps_tpu.ops.correlate import (  # noqa: E402
    code_fft_conj,
    code_spectrum_conj_matmul,
    dft_tables_device,
    pack_code_bits,
    unpack_code_table,
)
from stm32f4_sdr_gps_tpu.ops.wipeoff import doppler_rotations  # noqa: E402

prns = [2, 7, 15, 24]
acq = AcqConfig()
bins = np.asarray(acq.doppler_bins_hz, dtype=np.float32)
rot = doppler_rotations(jnp.asarray(bins), s, plan.sample_rate_hz)

if stage == "fused-copy":
    # rematerialize the conditioner-derived epochs through a trivial
    # jit before the acquisition program
    epochs = jax.jit(lambda a: a + 0)(epochs)
    stage = "fused-analyze-mm"

if stage == "mega":
    # EVERYTHING in one jit: wire words -> conditioner -> acquisition
    # -> peak vectors; no intermediate program outputs at all
    from stm32f4_sdr_gps_tpu.signal.capture import (
        reference_to_baseband_device as r2b,
    )

    dft = dft_tables_device(s)
    packed = jnp.asarray(pack_code_bits(prns, plan))
    cfc = code_spectrum_conj_matmul(unpack_code_table(packed, s), *dft)
    excl = exclusion_lags(acq, plan)

    @jax.jit
    def mega(w, c, r, b, w0, w1):
        bb2 = r2b(w)
        ep = bb2[: e * s].reshape(e, s).astype(jnp.complex64)
        pw = acquisition_power(ep, c, r, coherent=1, dft=(w0, w1),
                               dft_precision=jax.lax.Precision.DEFAULT)
        return analyze_power_device(pw, b, excl)

    out = mega(wd, cfc, rot, jnp.asarray(bins), *dft)
    vals = [np.asarray(v) for v in out]
    log(f"mega readback OK: peak={vals[0]}, dop={vals[2]}")
    sys.exit(0)

if stage == "fused-mm":
    # the bench-style shape: cube -> scalar INSIDE one jit, so the
    # (P, D, S) cube is never a program OUTPUT (hypothesis: programs
    # with large outputs fail at runtime on this transport, CLAUDE.md)
    dft = dft_tables_device(s)
    packed = jnp.asarray(pack_code_bits(prns, plan))
    cfc = code_spectrum_conj_matmul(unpack_code_table(packed, s), *dft)

    @jax.jit
    def fused(e, c, r, w0, w1):
        pw = acquisition_power(e, c, r, coherent=1, dft=(w0, w1),
                               dft_precision=jax.lax.Precision.DEFAULT)
        return jnp.mean(pw)

    v = float(np.asarray(fused(epochs, cfc, rot, *dft)))
    log(f"fused cube mean OK: {v:.3f}")
    sys.exit(0)

if stage == "fused-analyze-mm":
    dft = dft_tables_device(s)
    packed = jnp.asarray(pack_code_bits(prns, plan))
    cfc = code_spectrum_conj_matmul(unpack_code_table(packed, s), *dft)
    excl = exclusion_lags(acq, plan)

    @jax.jit
    def fused(e, c, r, b, w0, w1):
        pw = acquisition_power(e, c, r, coherent=1, dft=(w0, w1),
                               dft_precision=jax.lax.Precision.DEFAULT)
        return analyze_power_device(pw, b, excl)

    out = fused(epochs, cfc, rot, jnp.asarray(bins), *dft)
    vals = [np.asarray(v) for v in out]
    log(f"fused analyze readback OK: peak={vals[0]}, dop={vals[2]}")
    sys.exit(0)

if stage.endswith("-mm"):
    dft = dft_tables_device(s)
    packed = jnp.asarray(pack_code_bits(prns, plan))
    cfc = code_spectrum_conj_matmul(unpack_code_table(packed, s), *dft)
    power = acquisition_power(epochs, cfc, rot, coherent=1, dft=dft,
                              dft_precision=jax.lax.Precision.DEFAULT)
else:
    cfc = code_fft_conj(prns, plan)
    power = acquisition_power(epochs, cfc, rot, coherent=1)
log(f"power cube dispatched ({stage})")

if stage.startswith("cube"):
    v = float(np.asarray(jnp.mean(power)))
    log(f"cube mean OK: {v:.3f}")
    sys.exit(0)

excl = exclusion_lags(acq, plan)
out = analyze_power_device(power, jnp.asarray(bins), excl)
log("analyze dispatched")
vals = [np.asarray(v) for v in out]
log(f"analyze readback OK: peak={vals[0]}, dop={vals[2]}")
