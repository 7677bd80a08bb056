"""Crash-resilient training supervision.

The reference has no training-side failure recovery — Lightning just dies and
the user re-runs with ``--checkpoint`` (mtgvision/encoder_train.py:760-763);
its only resilience is client-side websocket auto-reconnect
(www/src/util-websocket.ts:90-94). On shared TPU pods, preemptions and
worker restarts ("TPU worker process crashed or restarted") are routine, so
this module makes restart-on-crash + resume-from-checkpoint a first-class
loop:

    python -m mtgvision_tpu.train.supervisor --attempts 20 --backoff 90 -- \
        python -m mtgvision_tpu.train.od_train --ckpt-dir ckpts ...

Both in-repo trainers resume from the latest checkpoint in their ckpt dir
(DetectorConfig.resume / EncoderConfig.checkpoint), so each attempt continues
where the last crash left off. Exit code 0 stops the loop; anything else
retries after ``backoff`` seconds, up to ``attempts`` times.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def supervise(
    cmd: list[str],
    attempts: int = 20,
    backoff_sec: float = 90.0,
    run=subprocess.call,
    sleep=time.sleep,
    log=print,
) -> int:
    """Run ``cmd`` until it exits 0, restarting on failure.

    Returns the final exit code (0 on success, the last failure code if all
    attempts are exhausted). ``run``/``sleep``/``log`` are injectable for
    testing.
    """
    rc = 1
    for attempt in range(1, attempts + 1):
        log(f"[supervisor] attempt {attempt}/{attempts}: {' '.join(cmd)}")
        rc = run(cmd)
        if rc == 0:
            log("[supervisor] success")
            return 0
        log(f"[supervisor] exit code {rc}; restarting in {backoff_sec:.0f}s")
        if attempt < attempts:
            sleep(backoff_sec)
    log(f"[supervisor] giving up after {attempts} attempts (rc={rc})")
    return rc


def _cli(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--attempts", type=int, default=20)
    ap.add_argument("--backoff", type=float, default=90.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to supervise (prefix with --)")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")
    return supervise(cmd, attempts=args.attempts, backoff_sec=args.backoff)


if __name__ == "__main__":
    sys.exit(_cli())
