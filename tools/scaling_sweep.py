"""Mesh scaling sweep: sharded acquisition + channel-sharded tracking
at 1/2/4/8 devices.

Runs the REAL sharded programs (parallel.mesh / parallel.streaming) at
every mesh size and records samples/s/chip.  On this round's hardware
the only multi-device mesh available is the virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), whose devices share the
host's physical cores — wall-clock there measures COLLECTIVE + SPMD
OVERHEAD versus the single-device baseline, not speedup (the
single-device XLA CPU run already uses all cores).  The same script
produces real scaling numbers unchanged when pointed at a TPU slice
(set SWEEP_PLATFORM=tpu with >=2 devices).

Writes SCALING_SWEEP.json at the repo root and prints the markdown
table that docs/SCALING.md §3 embeds.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    platform = os.environ.get("SWEEP_PLATFORM", "cpu")
    if platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ROOT)
    from stm32f4_sdr_gps_tpu.config import (AcqConfig, BASEBAND_PLAN,
                                            TrackConfig)
    from stm32f4_sdr_gps_tpu.ops.correlate import code_fft_conj
    from stm32f4_sdr_gps_tpu.ops.wipeoff import doppler_rotations
    from stm32f4_sdr_gps_tpu.parallel.mesh import (
        make_mesh,
        replicated,
        shard_code_table,
        shard_track_state,
        sharded_acquisition_power,
    )
    from stm32f4_sdr_gps_tpu.signal.ca_code import ca_table_bipolar
    from stm32f4_sdr_gps_tpu.track.scan import track_block
    from stm32f4_sdr_gps_tpu.track.state import init_state

    plan = BASEBAND_PLAN
    devs = jax.devices()
    print(f"platform={devs[0].platform} devices={len(devs)}",
          file=sys.stderr)

    prns = list(range(1, 33))
    rng = np.random.default_rng(0)
    acq = AcqConfig()
    cfg = TrackConfig()
    table = ca_table_bipolar(prns)
    cfc = code_fft_conj(prns, plan)
    bins = np.asarray(acq.doppler_bins_hz, np.float32)
    rot = doppler_rotations(jnp.asarray(bins), plan.samples_per_epoch,
                            plan.sample_rate_hz)
    e_acq = 8
    acq_epochs = jnp.asarray(
        (rng.standard_normal((e_acq, plan.samples_per_epoch))
         + 1j * rng.standard_normal((e_acq, plan.samples_per_epoch))
         ).astype(np.complex64))
    t_trk = 500
    trk_epochs = jnp.asarray(
        (rng.standard_normal((t_trk, plan.samples_per_epoch))
         + 1j * rng.standard_normal((t_trk, plan.samples_per_epoch))
         ).astype(np.complex64))
    state0 = init_state(32, rng.uniform(0, 1023, 32),
                        rng.uniform(-5e3, 5e3, 32))

    rows = []
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    for n in sizes:
        mesh = make_mesh(time=1, chan=n, devices=devs[:n])

        # --- acquisition: PRNs sharded over chan, psum-free (time=1) ---
        with jax.sharding.set_mesh(mesh):
            pw = sharded_acquisition_power(acq_epochs, cfc, rot, mesh)
            pw.block_until_ready()          # compile + warm
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                pw = sharded_acquisition_power(acq_epochs, cfc, rot, mesh)
            pw.block_until_ready()
            acq_s = (time.perf_counter() - t0) / reps

        # --- tracking: 32 channels sharded over the mesh ----------------
        st = shard_track_state(state0, mesh)
        tb = shard_code_table(jnp.asarray(table), mesh)
        with jax.sharding.set_mesh(mesh):
            ep = replicated(trk_epochs, mesh)
            fn = jax.jit(lambda s, e: track_block(s, e, tb, plan, cfg))
            s1, o = fn(st, ep)
            jax.block_until_ready((s1, o))
            reps = 3
            t0 = time.perf_counter()
            s1 = st
            for _ in range(reps):
                s1, o = fn(s1, ep)
            jax.block_until_ready((s1, o))
            trk_s = (time.perf_counter() - t0) / reps

        rt = t_trk * 1e-3 / trk_s
        rows.append(dict(
            devices=n,
            acq_ms_32prn=round(acq_s * 1e3, 1),
            track_rt_multiple=round(rt, 2),
            track_samples_per_s_per_chip=round(
                plan.sample_rate_hz * rt / n, 1),
        ))
        print(f"n={n}: acq {acq_s*1e3:.1f} ms, tracking {rt:.2f}x RT "
              f"({rows[-1]['track_samples_per_s_per_chip']:.3g} "
              f"samples/s/chip)", file=sys.stderr)

    out = dict(
        platform=devs[0].platform,
        physical_cores=os.cpu_count(),
        virtual_mesh=devs[0].platform == "cpu",
        note=("virtual CPU devices share the host cores: this measures "
              "SPMD/collective overhead vs the 1-device baseline, not "
              "speedup — same script yields real scaling on a TPU slice"),
        acq_epochs=e_acq, track_epochs=t_trk, channels=32,
        rows=rows,
    )
    with open(os.path.join(ROOT, "SCALING_SWEEP.json"), "w") as f:
        json.dump(out, f, indent=1)

    print("\n| devices | acq 32-PRN cube (ms) | tracking ×RT "
          "| samples/s/chip |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['devices']} | {r['acq_ms_32prn']} "
              f"| {r['track_rt_multiple']} "
              f"| {r['track_samples_per_s_per_chip']:,.0f} |")


if __name__ == "__main__":
    main()
