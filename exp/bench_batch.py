#!/usr/bin/env python
"""Throughput vs batch size for the int8 serving path."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from exp.profile_bench import build

def measure(fn, args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best

def main():
    import jax, jax.numpy as jnp
    for batch, steps in ((192, 3), (256, 2)):
        fn, args = build(True, batch, steps)
        @jax.jit
        def empty(s):
            return s[0,0,0,0,0]*2.0
        ov = measure(empty, (args[1],))
        t = measure(fn, args) - ov
        print(f"batch {batch}: {t*1e3/steps:.2f} ms/step  {batch*steps/t:.0f} pairs/s", flush=True)

if __name__ == "__main__":
    main()
