"""Run the TPU measurement ladder in one command, crash-risk LAST.

Each stage writes its artifact under /tmp/tpu_ladder/ *before* the next
stage starts, so a wedged tunnel (the f-shell ERI crash wedges it for
20-60+ min) never loses earlier results.  Run with the normal environment
(axon TPU); stages that need the CPU reference spawn their own
subprocesses.

    python tools/tpu_ladder.py            # bench + warm-start + profile
    python tools/tpu_ladder.py --triage   # ...then the ERI device triage

Stages:
  1. probe     -- TCP probe of the relay; abort early if down
  2. bench     -- python bench.py (records per-iter/wall speedups)
  3. warm      -- warm CLI start wall time (second process, caches hot)
  4. profile   -- tools/profile_f64_body.py per-component f64 body costs
  5. triage    -- tools/eri_device_triage.py staged f/g-shell on-device ERI
                  (LAST; only with --triage)
"""
import os
import socket
import subprocess
import sys
import time

OUT = "/tmp/tpu_ladder"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.time()


def log(msg):
    print(f"[ladder +{time.time() - T0:7.1f}s] {msg}", flush=True)


def stage(name, cmd, timeout_s, env_extra=None):
    log(f"stage {name}: {' '.join(cmd)}")
    env = dict(os.environ, **(env_extra or {}))
    out_path = os.path.join(OUT, f"{name}.out")
    err_path = os.path.join(OUT, f"{name}.err")
    t0 = time.time()
    with open(out_path, "w") as fo, open(err_path, "w") as fe:
        try:
            rc = subprocess.run(cmd, stdout=fo, stderr=fe, env=env,
                                cwd=REPO, timeout=timeout_s).returncode
        except subprocess.TimeoutExpired:
            rc = -1
            log(f"stage {name}: TIMEOUT after {timeout_s}s")
    log(f"stage {name}: rc={rc} wall={time.time() - t0:.1f}s -> {out_path}")
    return rc


def probe():
    for port in (8083, 8082):
        try:
            s = socket.create_connection(("127.0.0.1", port), 5)
            s.close()
        except OSError as e:
            log(f"relay port {port} DOWN ({e}) -- tunnel not available")
            return False
    log("relay ports open")
    return True


def main():
    os.makedirs(OUT, exist_ok=True)
    if not probe():
        sys.exit(1)

    py = sys.executable

    # 2. bench (also refreshes the recorded TPU artifact if backend==tpu)
    stage("bench", [py, "bench.py"], 3600)

    # 3. warm-start: one full CLI run in a fresh process, caches already hot
    line = "SPE : N N 1.1 : CCSD 6-311G : TIGHTSCF"
    stage("warm1", [py, "-m", "tuna_tpu", line], 2400)
    stage("warm2", [py, "-m", "tuna_tpu", line], 2400)  # the measured one

    # 4. per-component f64 body profile (6-311G then cc-pVTZ)
    stage("profile_631g", [py, "tools/profile_f64_body.py", "6-311G"], 2400)
    stage("profile_tz", [py, "tools/profile_f64_body.py", "cc-pVTZ"], 2400)

    # 5. ERI device triage -- crash risk, explicitly opted in, LAST
    if "--triage" in sys.argv:
        stage("eri_triage", [py, "tools/eri_device_triage.py"], 3600)

    log("ladder complete; artifacts in " + OUT)


if __name__ == "__main__":
    main()
