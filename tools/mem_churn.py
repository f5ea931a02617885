#!/usr/bin/env python3
"""Memory-churning co-process for the bench's contended-window
experiment (VERDICT r17 #3): unlike a spin burner (CPU-only, leaves
the bench's cpu_s FLAT), sustained allocation+copy traffic contends
for memory bandwidth and page cache, inflating the bench JVM's
executor CPU *and* GC — the window the wall/cpu heuristic alone
misreads as a code regression and the new per-leg gc_s field is meant
to self-attribute.

Usage: mem_churn.py [n_procs] [mb_per_proc] — run alongside a bench,
kill by recorded PID when done (never pkill by pattern).
"""
import multiprocessing
import sys


def churn(mb: int) -> None:
    import numpy as np
    n = mb * 1024 * 1024 // 8
    a = np.random.rand(n)
    b = np.empty_like(a)
    while True:
        # copy + reduce: streams the arrays through the caches forever
        np.copyto(b, a)
        a += b.mean()


if __name__ == "__main__":
    import signal

    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    ps = [multiprocessing.Process(target=churn, args=(mb,), daemon=True)
          for _ in range(procs)]
    for p in ps:
        p.start()

    def stop(_sig, _frm):
        # a daemon child survives an abrupt parent SIGTERM (atexit never
        # runs), so terminate them explicitly — one kill of the parent
        # PID must end the whole churn
        for p in ps:
            p.terminate()
        sys.exit(0)

    signal.signal(signal.SIGTERM, stop)
    signal.signal(signal.SIGINT, stop)
    print("churning", procs, "x", mb, "MB; children:",
          [p.pid for p in ps], flush=True)
    for p in ps:
        p.join()
