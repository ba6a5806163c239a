#!/usr/bin/env python
"""Per-op trace of the flagship train step (or eval forward).

Runs N steps under ``jax.profiler.trace`` and aggregates TPU-track op
durations per step, grouped into categories (pallas convs, XLA fusions,
pads, copies, ...). This is the round-2/3 "trace-driven accounting" table
generator (docs/PERFORMANCE.md).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_trace.py \
      --batch 4 [--mode train|infer] [--steps 3] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mt3d_resenc_unet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def run_and_trace(mode, batch, patch, steps, tracedir):
    from bench import build, flagship_plan
    if mode == "train":
        state, step, data = build(batch, patch)
        state, m = step(state, data)   # compile + warmup
        float(m["total_loss"])
        with jax.profiler.trace(tracedir):
            for _ in range(steps):
                state, m = step(state, data)
                float(m["total_loss"])
    else:
        import jax.numpy as jnp
        from mt3d_resenc_unet_tpu.models.network import ResEncUNet
        plan = flagship_plan(patch)
        plan = plan.replace(remat=False) if hasattr(plan, "replace") else plan
        model = ResEncUNet(plan=plan, dtype=jnp.bfloat16)
        x = jnp.zeros((batch,) + patch + (1,), jnp.float32)
        params = jax.jit(lambda: model.init(
            {"params": jax.random.key(0)}, x[:1], train=False))()
        fwd = jax.jit(lambda p, b: model.apply(p, b, train=False))
        out = fwd(params, x)
        float(jax.tree.leaves(out)[0].sum())
        with jax.profiler.trace(tracedir):
            for _ in range(steps):
                out = fwd(params, x)
                float(jax.tree.leaves(out)[0].sum())


CATEGORIES = [
    ("pallas conv", ("pallas_call", "custom-call")),
    ("fusion", ("fusion",)),
    ("pad", ("pad",)),
    ("copy", ("copy",)),
    ("transpose", ("transpose",)),
    ("reshape", ("reshape", "bitcast")),
    ("conv (xla)", ("conv",)),
    ("dot", ("dot",)),
    ("select", ("select",)),
    ("dus", ("dynamic-update-slice", "dynamic-slice")),
    ("reduce", ("reduce",)),
]


def classify(name):
    base = name.split(".")[0].lower()
    for cat, keys in CATEGORIES:
        for k in keys:
            if base.startswith(k):
                return cat
    return "other"


def analyze(tracedir, steps, top):
    files = sorted(glob.glob(os.path.join(
        tracedir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print("no trace produced", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # TPU op track: pick the pid/tid group with the largest total XLA-op time
    # (device tracks carry op names; host tracks carry python functions)
    tracks = {}
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        tracks.setdefault(key, []).append(e)
    def is_device(key):
        n = names.get(key, "")
        return "XLA Op" in n or "Steps" not in n
    best, best_t = None, 0.0
    for key, evs in tracks.items():
        if "XLA Op" not in names.get(key, ""):
            continue
        t = sum(e.get("dur", 0) for e in evs)
        if t > best_t:
            best, best_t = key, t
    if best is None:
        print("no XLA Op track found; tracks:", file=sys.stderr)
        for key, evs in sorted(tracks.items(),
                               key=lambda kv: -sum(e.get("dur", 0)
                                                   for e in kv[1]))[:10]:
            print(f"  {names.get(key)}: {len(evs)} events "
                  f"{sum(e.get('dur', 0) for e in evs) / 1e3:.1f} ms",
                  file=sys.stderr)
        return
    evs = tracks[best]
    per_op = {}
    for e in evs:
        per_op.setdefault(e["name"], [0.0, 0])
        per_op[e["name"]][0] += e.get("dur", 0)
        per_op[e["name"]][1] += 1
    total = sum(v[0] for v in per_op.values())
    print(f"track: {names.get(best)}  total {total / 1e3 / steps:.1f} "
          f"ms/step over {steps} steps")
    cats = {}
    for name, (dur, cnt) in per_op.items():
        cats.setdefault(classify(name), [0.0, 0])
        cats[classify(name)][0] += dur
        cats[classify(name)][1] += cnt
    print("\nby category (ms/step):")
    for cat, (dur, cnt) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        print(f"  {cat:<14} {dur / 1e3 / steps:8.1f}  ({cnt // steps} ops)")
    print(f"\ntop {top} ops (ms/step):")
    for name, (dur, cnt) in sorted(per_op.items(),
                                   key=lambda kv: -kv[1][0])[:top]:
        print(f"  {dur / 1e3 / steps:8.2f}  x{cnt // steps:<4} {name[:90]}")
    for cat in ("other", "copy", "fusion"):
        rows = [(n_, v) for n_, v in per_op.items() if classify(n_) == cat]
        rows.sort(key=lambda kv: -kv[1][0])
        print(f"\ntop 15 '{cat}' ops (ms/step):")
        for name, (dur, cnt) in rows[:15]:
            print(f"  {dur / 1e3 / steps:8.2f}  x{cnt // steps:<4} "
                  f"{name[:90]}")

    # source-line attribution: trace args carry the python source of each
    # HLO op (args.source + tf_op) — group device time by repo line so hot
    # spots map to code, not HLO names
    by_src = {}
    for e in evs:
        a = e.get("args") or {}
        src = a.get("source", "")
        key = src.replace("/root/repo/", "") if src else "<no source>"
        by_src.setdefault(key, [0.0, 0])
        by_src[key][0] += e.get("dur", 0)
        by_src[key][1] += 1
    print(f"\ntop 30 source lines (ms/step):")
    for src, (dur, cnt) in sorted(by_src.items(),
                                  key=lambda kv: -kv[1][0])[:30]:
        print(f"  {dur / 1e3 / steps:8.2f}  x{cnt // steps:<5} {src[:100]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--patch", type=int, nargs=3, default=[128, 128, 128])
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--mode", choices=["train", "infer"], default="train")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--tracedir", default=None)
    args = p.parse_args()
    tracedir = args.tracedir or tempfile.mkdtemp(prefix="mt3d_trace_")
    run_and_trace(args.mode, args.batch, tuple(args.patch), args.steps,
                  tracedir)
    analyze(tracedir, args.steps, args.top)


if __name__ == "__main__":
    main()
