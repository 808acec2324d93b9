"""Patient harvester for the TPU acquisition number (matmul-DFT path).

Same philosophy as tpu_harvest.py: the tunnel alternates healthy and
degraded windows (compiles, device_put, and the profiler all flip
between working and UNIMPLEMENTED minutes apart), so never kill a
child; run one self-alarmed bench acq child at a time and retry until
one lands a result.  Host-only driver (no jax import).

Result: /tmp/acq_harvest/acq.json ({"acq_s": ..., "method": ...}).
Touch /tmp/acq_harvest/stop to end the loop.
"""
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = pathlib.Path("/tmp/acq_harvest")
OUT.mkdir(exist_ok=True)
STOP = OUT / "stop"
RESULT = OUT / "acq.json"
MAX_HOURS = float(os.environ.get("HARVEST_HOURS", "4"))
SLEEP_S = 240


def main():
    RESULT.unlink(missing_ok=True)   # a stale result must not read as fresh
    deadline = time.time() + MAX_HOURS * 3600
    it = 0
    while time.time() < deadline and not STOP.exists():
        it += 1
        for method in ("matmul", "fft"):
            env = dict(os.environ)
            env.update({"BENCH_CHILD": "acq",
                        "BENCH_RESULT_FILE": str(RESULT),
                        "BENCH_ACQ_METHOD": method,
                        "BENCH_HONEST_WALL": "0"})
            t0 = time.time()
            with open(OUT / "child.log", "ab") as f:
                f.write(f"\n=== {time.strftime('%H:%M:%S')} iter {it} "
                        f"{method}\n".encode())
                f.flush()
                rc = subprocess.run(
                    [sys.executable, str(ROOT / "bench.py")],
                    cwd=ROOT, env=env, stdout=f,
                    stderr=subprocess.STDOUT).returncode
            print(f"[{time.strftime('%H:%M:%S')}] iter {it} {method}: "
                  f"rc={rc} ({time.time()-t0:.0f}s)", flush=True)
            if RESULT.exists():
                print("result landed:", RESULT.read_text(), flush=True)
                return
        time.sleep(SLEEP_S)
    print("no result within budget", flush=True)


if __name__ == "__main__":
    main()
