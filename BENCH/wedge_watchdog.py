"""Watchdog for the scaling protocol: detect a wedged spark-submit run
(the Arrow UDF socket flow-control deadlock seen at 02:10 — both directions'
Send-Q full and frozen, JVM idle) and kill it so run_scaling.py's
except/continue moves to the next run instead of waiting out the 3600s
subprocess timeout.

Signature required for 4 consecutive 60s samples before killing:
  - a spark-submit java proc (child chain of run_scaling pid) exists
  - its cumulative CPU jiffies advanced < 2s over the minute (idle)
  - some ESTAB loopback socket owned by a python worker has Send-Q > 1MB
    with the exact same byte count as the previous sample (frozen)
Logs to /tmp/wedge_watchdog.log. Exits when run_scaling (pid arg) is gone.
"""
import os, re, subprocess, sys, time

PROTO_PID = int(sys.argv[1])
LOG = "/tmp/wedge_watchdog.log"

def log(msg):
    with open(LOG, "a") as f:
        f.write(f"{time.strftime('%H:%M:%S')} {msg}\n")

def proto_alive():
    return os.path.exists(f"/proc/{PROTO_PID}")

def find_run_jvm():
    # the measurement JVM: java with "--master local[" and frontier_job in cmdline
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if "java" in cmd and "frontier_job.py" in cmd and "--master local[" in cmd:
            return int(pid)
    return None

def jvm_jiffies(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return int(parts[11]) + int(parts[12])  # utime+stime
    except OSError:
        return None

def frozen_sendq():
    """(local_addr, sendq) for loopback ESTAB sockets with Send-Q > 1MB."""
    out = subprocess.run(["ss", "-tn", "state", "established"],
                         capture_output=True, text=True).stdout
    jams = []
    for line in out.splitlines():
        m = re.match(r"\s*(\d+)\s+(\d+)\s+(\S+)\s+(\S+)", line)
        if not m:
            continue
        recvq, sendq, laddr = int(m.group(1)), int(m.group(2)), m.group(3)
        if sendq > 1_000_000 and "127.0.0.1" in laddr:
            jams.append((laddr, sendq))
    return sorted(jams)

log(f"watchdog start, protocol pid {PROTO_PID}")
strikes = 0
prev = (None, None, None)  # (jvm_pid, jiffies, jams)
while proto_alive():
    time.sleep(60)
    jvm = find_run_jvm()
    if jvm is None:
        strikes = 0
        prev = (None, None, None)
        continue
    jf = jvm_jiffies(jvm)
    jams = frozen_sendq()
    p_jvm, p_jf, p_jams = prev
    if (p_jvm == jvm and jf is not None and p_jf is not None
            and (jf - p_jf) < 200            # < 2s CPU over the minute
            and jams and jams == p_jams):    # same nonzero Send-Q bytes
        strikes += 1
        log(f"jvm {jvm} idle (d_jiffies={jf - p_jf}) jams={jams} strike {strikes}")
    else:
        strikes = 0
    prev = (jvm, jf, jams)
    if strikes >= 4:
        log(f"KILLING wedged jvm {jvm} (4 consecutive idle+frozen samples)")
        subprocess.run(["kill", "-9", str(jvm)])
        strikes = 0
        prev = (None, None, None)
        # a SIGKILLed JVM leaks its blockmgr under the SHARED
        # /dev/shm/spark_local (tmpfs = RAM, evicts page cache for every
        # later run): after the kill, sweep entries untouched for 90s —
        # the next run's dirs are touched constantly, orphans never again.
        time.sleep(10)
        base = "/dev/shm/spark_local"
        if os.path.isdir(base):
            now = time.time()
            for d in os.listdir(base):
                p = os.path.join(base, d)
                try:
                    if now - os.path.getmtime(p) > 90:
                        subprocess.run(["rm", "-rf", p])
                        log(f"swept orphan {p}")
                except OSError:
                    pass
log("protocol gone; watchdog exit")
