"""Patient TPU-number harvester for a flaky remote transport.

The axon tunnel alternates between healthy windows (device ops + the
jax.profiler trace work) and degraded windows (everything raises
UNIMPLEMENTED, or hangs at backend init).  Killing a client mid-claim
wedges the tunnel further (CLAUDE.md), so this driver NEVER kills a
child: it runs one short-lived client at a time, waits however long
each takes, and retries until one tracking path lands a device-reported
timing.

Host-only (no jax import here).  Results accumulate in
/tmp/harvest/<path>.json; a summary lands in /tmp/harvest/result.json.
Touch /tmp/harvest/stop to end the loop between children.
"""
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = pathlib.Path("/tmp/harvest")
OUT.mkdir(exist_ok=True)
STOP = OUT / "stop"

PATHS = ["pallas-in-kernel-scan", "pallas-epl-scan", "jnp-scan"]
MAX_HOURS = float(os.environ.get("HARVEST_HOURS", "8"))
SLEEP_S = 180


def run(cmd, env=None, log=None):
    """Run to natural completion (no kill).  Returns (rc, seconds)."""
    t0 = time.time()
    with open(log, "ab") if log else open(os.devnull, "wb") as f:
        f.write(f"\n=== {time.strftime('%H:%M:%S')} {cmd}\n".encode())
        f.flush()
        rc = subprocess.run(cmd, cwd=ROOT, env=env,
                            stdout=f, stderr=subprocess.STDOUT).returncode
    return rc, time.time() - t0


def main():
    deadline = time.time() + MAX_HOURS * 3600
    results = {}
    it = 0
    while time.time() < deadline and not STOP.exists():
        it += 1
        rc, dt = run([sys.executable, "tools/tpu_probe.py"],
                     log=OUT / "probe.log")
        print(f"[{time.strftime('%H:%M:%S')}] iter {it}: probe rc={rc} "
              f"({dt:.0f}s)", flush=True)
        if rc != 0:
            time.sleep(SLEEP_S)
            continue
        for path in PATHS:
            if path in results or STOP.exists():
                continue
            # full-size first; if that fails in a window where the
            # probe passed, retry once at 1/8 block size (a short
            # healthy window may not survive the big compile)
            for block in ("2000", "250"):
                env = dict(os.environ)
                env.update(BENCH_TPU_ATTEMPT="1", BENCH_ASSUME_ASYNC="1",
                           BENCH_PATHS=path, BENCH_BLOCK_EPOCHS=block)
                log = OUT / f"{path}.log"
                t0 = time.time()
                with open(log, "ab") as f:
                    f.write(f"\n=== {time.strftime('%H:%M:%S')} "
                            f"block={block}\n".encode())
                    f.flush()
                    p = subprocess.run([sys.executable, "bench.py"],
                                       cwd=ROOT, env=env,
                                       stdout=subprocess.PIPE, stderr=f)
                dt = time.time() - t0
                line = None
                for ln in p.stdout.decode().splitlines():
                    ln = ln.strip()
                    if ln.startswith("{"):
                        line = ln
                print(f"[{time.strftime('%H:%M:%S')}] {path} "
                      f"block={block}: rc={p.returncode} ({dt:.0f}s) "
                      f"{line}", flush=True)
                if p.returncode == 0 and line:
                    results[path] = json.loads(line)
                    (OUT / f"{path}.json").write_text(line)
                    break
        if results:
            best = max(results.items(),
                       key=lambda kv: kv[1]["vs_baseline"])
            summary = dict(best[1], path=best[0], all=results)
            (OUT / "result.json").write_text(json.dumps(summary, indent=1))
            print(f"HARVESTED: {json.dumps(summary)}", flush=True)
            if len(results) == len(PATHS):
                return 0
        time.sleep(SLEEP_S if not results else 60)
    print("harvest ended", "with" if results else "WITHOUT", "results",
          flush=True)
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
