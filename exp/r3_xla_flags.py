"""Round 3: XLA flag sweep over the serving bench (the one untried axis).

Every graph-level re-lowering of the int8 serving path has been measured
(NOTES.md round 3 table); compiler FLAGS have not. Each variant runs
bench.py in a subprocess with LIBTPU_INIT_ARGS/XLA_FLAGS set before jax
import (flags latch at first backend init). Sequential — never two TPU
processes at once (axon wedge, NOTES.md).

Run: PYTHONPATH=$PYTHONPATH:/root/repo python exp/r3_xla_flags.py
"""

import json
import os
import subprocess
import sys

VARIANTS = [
    ("baseline", {}),
    # Latency-hiding scheduler: reorders to overlap copies with compute;
    # the serving graph is one fused chain, toggling it can shift fusion
    # boundaries around the conv1_1 tail.
    ("no_lhs", {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=false"}),
    # More scoped VMEM for fusion buffers (default ~16MB-class budgets):
    # larger requant epilogue tiles / fewer HBM round trips.
    ("vmem_64m", {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=65536"}),
    ("vmem_32m", {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=32768"}),
    # Aggressive flash-style fusion of reduces into consumers.
    ("fuse_all", {"XLA_FLAGS": "--xla_tpu_rwb_fusion=false"}),
]


def run_variant(name, env_extra):
    env = dict(os.environ)
    for k, v in env_extra.items():
        env[k] = (env.get(k, "") + " " + v).strip()
    # bench.py pins the persistent cache to .jax_cache; its keys include the
    # compile options, so per-flag entries don't collide.
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True, text=True, timeout=1500, env=env,
            cwd="/root/repo",
        )
    except subprocess.TimeoutExpired:
        print(f"{name}: TIMEOUT", flush=True)
        return None
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        print(f"{name}: FAILED\n{out.stderr[-500:]}", flush=True)
        return None
    rec = json.loads(line[-1])
    print(f"{name}: {rec['value']} pairs/s (median {rec['value_median']})",
          flush=True)
    return rec["value"]


def main():
    results = {}
    for name, env_extra in VARIANTS:
        results[name] = run_variant(name, env_extra)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
