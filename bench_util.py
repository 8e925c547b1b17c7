"""Shared harness for the TPU benchmark scripts.

The tunnelled TPU relay occasionally aborts a program mid-run
(``JaxRuntimeError: ABORTED: TPU backend error``) — a transient failure that
killed the round-1 benchmark artifact. A JAX process cannot recover its
backend after such an abort, so the only robust retry unit is a whole
process: ``run_with_retries`` re-executes the measurement child up to
``attempts`` times and relays the child's one-line JSON metric.

Usage pattern (see bench.py): the script calls ``child_or_retry(main)`` at
the top of ``__main__``; with ``--child`` it runs ``main()`` directly,
otherwise it becomes the supervising parent.
"""

from __future__ import annotations

import subprocess
import sys
import time


def _looks_like_metric(line: str) -> bool:
    line = line.strip()
    return line.startswith("{") and '"metric"' in line


def _backend_alive(timeout_s: float = 180.0) -> bool:
    """Quick liveness probe: can a trivial device op complete?

    A dead relay tunnel makes every device call hang forever; probing first
    bounds the failure to minutes instead of attempts*timeout.
    """
    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.sum(jnp.arange(4.0))))")
    try:
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True,
                              timeout=timeout_s).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_with_retries(argv: list[str], attempts: int = 3,
                     timeout_s: float = 1500.0, probe: bool = True) -> int:
    """Run ``argv`` until it emits a JSON metric line; retry on failure.

    Prints the child's metric line(s) on stdout and everything else on
    stderr. Returns 0 on success, the last child's return code otherwise.
    ``probe=False`` skips the TPU liveness probe — for CPU-only runs, which
    must not touch the (possibly busy) single tunnelled chip at all.
    """
    for p in range(1, 4):
        if not probe or _backend_alive():
            break
        print(f"# backend liveness probe {p}/3 failed "
              "(relay tunnel unresponsive)", file=sys.stderr)
        if p == 3:
            print("# giving up: device backend unreachable", file=sys.stderr)
            return 2
        time.sleep(30.0 * p)
    last_rc = 1
    for attempt in range(1, attempts + 1):
        t0 = time.time()
        try:
            proc = subprocess.run(
                argv, capture_output=True, text=True, timeout=timeout_s)
            rc = proc.returncode
            out, err = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = 124
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
                else (e.stdout or "")
            err = f"child timed out after {timeout_s:.0f}s"
        metric_lines = [l for l in out.splitlines() if _looks_like_metric(l)]
        if rc == 0 and metric_lines:
            for line in metric_lines:
                print(line)
            sys.stderr.write(err)
            print(f"# attempt {attempt}/{attempts} ok "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
            return 0
        last_rc = rc or 1
        tail = "\n".join((out + "\n" + err).splitlines()[-12:])
        print(f"# attempt {attempt}/{attempts} failed rc={rc} "
              f"({time.time() - t0:.0f}s); tail:\n{tail}", file=sys.stderr)
        if attempt < attempts:
            time.sleep(10.0 * attempt)
    return last_rc


def child_or_retry(main_fn, attempts: int = 3, timeout_s: float = 1500.0,
                   probe: bool = True):
    """Entry helper: run ``main_fn`` when invoked with --child, else
    supervise retries of this same script."""
    if "--child" in sys.argv:
        main_fn()
        return
    argv = [sys.executable, sys.argv[0], "--child"] + sys.argv[1:]
    sys.exit(run_with_retries(argv, attempts=attempts, timeout_s=timeout_s,
                              probe=probe))
