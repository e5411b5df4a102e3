"""Crash-anywhere chaos: run a full replay in a subprocess, SIGKILL it at a
random offset, rerun to completion, demand exact oracle equality.

MODE accepts a storage-backend suffix, e.g. `spill:objstore` — the
resume then also proves the dead holder's lease is stolen and that the
versioned-CAS checkpoints survive a kill at any byte."""
import os, random, shutil, signal, subprocess, sys, time

random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
# kill window (s): ray.init ~5s; default spans mid-replay. Tune down if
# the drive completes before the kill fires (killed=False trials).
LO = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
HI = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
MODE = sys.argv[4] if len(sys.argv) > 4 else "spill"
# dedupidx/neardup modes swap in the incremental-index drive
# (multi-epoch ingest with mid-compaction kills; neardup = the SimHash
# seen-rule index); all other modes use the replay drive
DRIVE = ("/root/repo/tools/drive_dedupidx.py"
         if MODE.startswith(("dedupidx", "neardup"))
         else "/root/repo/tools/drive_verify.py")
fails = 0
for trial in range(5):
    wd = f"/tmp/chaos/{trial}"
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd, exist_ok=True)
    delay = random.uniform(LO, HI)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    # new session => SIGKILL the whole process GROUP, or the driver's
    # Ray head/worker children survive as orphans holding /dev/shm and
    # distort the conditions the next trials measure
    p = subprocess.Popen(["python", DRIVE, wd, "-1", MODE], env=env,
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL,
                         start_new_session=True)
    time.sleep(delay)
    if p.poll() is None:
        os.killpg(p.pid, signal.SIGKILL)
        p.wait()
        killed = True
    else:
        killed = False
    # resume in a fresh process; must complete exactly. A hang past the
    # timeout is exactly the torn-state bug this harness hunts: count it
    # as a failed trial, keep going.
    try:
        out = subprocess.run(["python", DRIVE, wd, "-1", MODE], env=env,
                             capture_output=True, text=True, timeout=600)
        ok = "exact_token_equality=True" in out.stdout
        # on failure show BOTH streams + exit code: an early crash
        # (e.g. a ray.init flake) leaves stdout empty and the
        # diagnosis lives entirely in stderr
        tail = (f"rc={out.returncode}\n---- stdout ----\n"
                f"{out.stdout[-1500:]}\n---- stderr ----\n"
                f"{out.stderr[-2500:]}")
    except subprocess.TimeoutExpired:
        ok, tail = False, "<resume timed out after 600s>"
    print(f"trial {trial}: killed_after={delay:.1f}s killed={killed} exact={ok}")
    if not ok:
        fails += 1
        print(tail)
    shutil.rmtree(wd, ignore_errors=True)
print(f"CHAOS done: {fails} failures")
sys.exit(1 if fails else 0)
