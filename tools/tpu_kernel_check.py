"""Correctness check of the REAL in-kernel Pallas scan on the TPU.

Every kernel equivalence test runs in interpret mode on CPU; bench
times the real kernel but never validates its numbers.  This probe
plants one clean satellite, hands the kernel the EXACT code phase and
Doppler, runs the production track+digest program on the TPU, and
reads back the digest: a correct kernel must hold the planted Doppler
(within a few Hz) and report a strong C/N0; a lowering/numerics bug
shows up as drift or noise-level C/N0 immediately.

The signal uploads in the 1-bit wire form (196 KB for 96 epochs) and
is conditioned on device — same ingest as tools/tpu_e2e.py.

Usage: python tools/tpu_kernel_check.py [epochs=96] [cn0=55]
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


t = threading.Timer(int(os.environ.get("PROBE_BUDGET_S", "900")), _die)
t.daemon = True
t.start()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from stm32f4_sdr_gps_tpu.config import REFERENCE_PLAN, TrackConfig  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_epl import upsampled_code_doubled  # noqa: E402
from stm32f4_sdr_gps_tpu.ops.pallas_track_scan import (  # noqa: E402
    state_from_track_state,
)
from stm32f4_sdr_gps_tpu.runtime.digest import cn0_from_moments  # noqa: E402
from stm32f4_sdr_gps_tpu.runtime.receiver import (  # noqa: E402
    _track_and_digest_carried,
)
from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar  # noqa: E402
from stm32f4_sdr_gps_tpu.signal.capture import (  # noqa: E402
    pack_bits_lsb16,
    reference_to_baseband_device,
)
from stm32f4_sdr_gps_tpu.signal.simulator import (  # noqa: E402
    SimSat,
    simulate_capture,
)
from stm32f4_sdr_gps_tpu.track.state import init_state  # noqa: E402

n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 96
cn0 = float(sys.argv[2]) if len(sys.argv) > 2 else 55.0
plan_bb_spe = 2046
dev = jax.devices()[0]
log(f"device: {dev} ({dev.platform}); {n_epochs} epochs at {cn0} dBHz")

prn, dop_true, cp_true = 7, 1234.0, 300.25
sat = SimSat(prn=prn, doppler_hz=dop_true, code_phase_chips=cp_true,
             cn0_dbhz=cn0, codes_in_bit=20,
             nav_bits=list(np.random.default_rng(0).integers(0, 2, 64)))
x, _ = simulate_capture([sat], num_epochs=n_epochs, plan=REFERENCE_PLAN,
                        seed=2)
words = pack_bits_lsb16(x)
log(f"wire capture: {words.nbytes} bytes")

wd = jax.device_put(words)
bb = jax.jit(reference_to_baseband_device)(wd)
epochs = bb[: n_epochs * plan_bb_spe].reshape(n_epochs, plan_bb_spe)
epochs = epochs.astype(jnp.complex64)

# conditioner VALUE cross-check on this hardware: the device unpack
# (uint16 shifts) + quarter-rate mix has only ever been checked by
# scalar checksums on TPU; compare an actual slice against the host
# conditioner (2 KB readback)
from stm32f4_sdr_gps_tpu.signal.capture import (  # noqa: E402
    reference_to_baseband,
)

host_bb = reference_to_baseband(x[: 16368])       # 1 epoch = 16 KB
dev_bb = np.asarray(bb[: len(host_bb)])
cond_err = float(np.abs(dev_bb - host_bb).max())
log(f"conditioner cross-check: max |device-host| = {cond_err:.2e} "
    f"over {len(host_bb)} samples")
if cond_err > 1e-3:
    log("CONDITIONER WRONG on this hardware")
    sys.exit(2)

from stm32f4_sdr_gps_tpu.config import BASEBAND_PLAN  # noqa: E402

cfg = TrackConfig(pll_bad_state_threshold=10**9)
u2 = jnp.asarray(upsampled_code_doubled(ca_table_bipolar([prn])))
# exact handoff: the conditioner's group delay is baked into the
# simulator truth convention used by the receiver tests
state = init_state(1, np.array([cp_true]), np.array([dop_true]),
                   window=cfg.pll_check_window)
ps = state_from_track_state(state)
t0 = time.perf_counter()
ps2, ts, d = _track_and_digest_carried(ps, epochs, u2, BASEBAND_PLAN,
                                       cfg, 100, True)
d = jax.tree.map(np.asarray, d)
log(f"block done in {time.perf_counter()-t0:.1f}s (incl. compile)")
dop = float(d.doppler_hz[0])
cn0_est = cn0_from_moments(float(d.cn0_m2[0]), float(d.cn0_m4[0]),
                           int(d.cn0_n[0]))
cp_out = float(d.code_phase_chips[0])
log(f"doppler {dop:+.1f} Hz (planted {dop_true:+.1f}, err "
    f"{dop-dop_true:+.2f}); code phase {cp_out:.2f} (planted drifts "
    f"from {cp_true}); C/N0 est {cn0_est:.1f} dBHz (planted {cn0})")
ok = abs(dop - dop_true) < 10.0 and cn0_est > cn0 - 12.0
log("KERNEL " + ("OK" if ok else "WRONG"))
sys.exit(0 if ok else 1)
