#!/usr/bin/env python
"""Stall watchdog for long single-chip runs behind a device relay.

The TPU pool this environment reaches sits behind a loopback relay
(`JAX_PLATFORMS=axon`); a dropped/stale channel can leave a client
blocked forever inside a device RPC with no timeout (observed twice in
round 5: zero CPU, zero output, indefinitely).  The framework's answer
is ``quality_run.py --resume`` (skip stages whose training already
completed) — this wrapper automates the kill-and-resume loop:

  python scripts/quality_watchdog.py --log /tmp/q.log -- \
      python scripts/quality_run.py --out-dir /tmp/q --device tpu

It watches the child's combined output stream; if NO new output arrives
for --stall-seconds the child is killed (SIGKILL: it is wedged in a
foreign RPC, SIGTERM won't run) and relaunched with ``--resume``
appended.  Progress-quiet-but-healthy phases (first compiles through a
remote-compile channel) get a separate, longer --startup-seconds budget
before the first output line.
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def run_once(cmd, log_path, stall_s, startup_s):
    """Run cmd once; kill it if its output stalls.  Returns (exitcode,
    stalled): exitcode is None when we killed it."""
    with open(log_path, "ab", buffering=0) as log:
        child = subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT,
            start_new_session=True)  # own group: kill never touches us
        last_size = os.path.getsize(log_path)
        last_change = time.time()
        seen_output = False
        while True:
            code = child.poll()
            if code is not None:
                return code, False
            size = os.path.getsize(log_path)
            if size != last_size:
                last_size = size
                last_change = time.time()
                seen_output = True
            budget = stall_s if seen_output else startup_s
            if time.time() - last_change > budget:
                os.killpg(child.pid, signal.SIGKILL)
                child.wait()
                return None, True
            time.sleep(10)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", required=True,
                        help="file the child's output is appended to "
                             "(its mtime/size drives stall detection)")
    parser.add_argument("--stall-seconds", type=int, default=420,
                        help="a wedged relay RPC never self-recovers "
                             "(observed >20 min quiet), so fail fast")
    parser.add_argument("--startup-seconds", type=int, default=1200,
                        help="quiet budget before the first output line "
                             "(device claim + first remote compile)")
    parser.add_argument("--restart-delay", type=int, default=300,
                        help="wait before reconnecting: relaunching too "
                             "soon after killing a wedged client wedges "
                             "again at the first device RPC (observed); "
                             "a multi-minute gap reconnects cleanly")
    parser.add_argument("--max-restarts", type=int, default=10)
    parser.add_argument("--resume-flag", default="--resume",
                        help="appended to the command on every restart")
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- then the command to supervise")
    args = parser.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        parser.error("no command given (pass it after --)")

    attempt = 0
    while True:
        this_cmd = list(cmd)
        if attempt > 0 and args.resume_flag not in this_cmd:
            this_cmd.append(args.resume_flag)
        print(f"[watchdog] attempt {attempt + 1}: {' '.join(this_cmd)}",
              flush=True)
        code, stalled = run_once(this_cmd, args.log, args.stall_seconds,
                                 args.startup_seconds)
        if not stalled:
            print(f"[watchdog] child exited with code {code}", flush=True)
            sys.exit(code)
        attempt += 1
        print(f"[watchdog] stalled (> {args.stall_seconds}s quiet); "
              f"killed child (restart {attempt}/{args.max_restarts})",
              flush=True)
        if attempt >= args.max_restarts:
            print("[watchdog] giving up", flush=True)
            sys.exit(3)
        # the wedged client's upstream device claim takes a while to
        # release after SIGKILL; give it room before reconnecting
        time.sleep(args.restart_delay)


if __name__ == "__main__":
    main()
