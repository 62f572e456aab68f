"""Summarize a jax.profiler trace (trace.json.gz) into a step-time budget.

Usage: python scripts/analyze_trace.py <trace_dir_or_json.gz> [--steps N]

Finds the newest plugins/profile/*/ *.trace.json.gz under the given dir,
aggregates XLA-op duration on the device lane by name, and groups ops into
readable categories (layer-scan forwards/backwards, adapter, canny, optim,
fusions) so PERFORMANCE.md can cite where a training step actually goes.
The while.N ops are lax.scan loops: at XL-512 the two biggest are the
layer-scan forward and its rematerialized backward.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_events(path):
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(
            path, "**", "*.trace.json.gz"), recursive=True))
        if not cands:
            sys.exit(f"no *.trace.json.gz under {path}")
        path = cands[-1]
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path) as f:
        return json.load(f).get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by N steps (default: #Steps events)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    ev = load_events(args.trace)
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pid = next((p for p, n in pids.items() if "TPU" in n or "GPU" in n),
                   None)
    if dev_pid is None:
        sys.exit(f"no device pid in {pids}")

    op_lane = [t for (p, t), n in tids.items()
               if p == dev_pid and n == "XLA Ops"]
    step_lane = [t for (p, t), n in tids.items()
                 if p == dev_pid and n == "Steps"]
    mod_lane = [t for (p, t), n in tids.items()
                if p == dev_pid and n == "XLA Modules"]

    n_steps = args.steps
    if n_steps is None:
        n_steps = max(1, sum(1 for e in ev if e.get("ph") == "X"
                             and e.get("pid") == dev_pid
                             and e.get("tid") in step_lane))

    mod_total = 0.0
    ops = []
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") != dev_pid:
            continue
        if e.get("tid") in op_lane:
            ops.append((e["ts"], e["ts"] + e.get("dur", 0), e["name"]))
        elif e.get("tid") in mod_lane:
            mod_total += e.get("dur", 0)

    # EXCLUSIVE time: ops nest (a lax.scan while contains its body's ops as
    # separate events on the same lane) — subtract each op's direct
    # children so totals sum to the module time instead of double counting
    ops.sort(key=lambda x: (x[0], -x[1]))
    agg = collections.Counter()
    cnt = collections.Counter()
    stack = []  # [ts, te, name, child_time_accum]

    def pop_one():
        ts0, te0, nm, child = stack.pop()
        agg[nm] += (te0 - ts0) - child

    top_incl = collections.Counter()  # inclusive, depth-0 ops only
    for ts, te, name in ops:
        while stack and stack[-1][1] <= ts:
            pop_one()
        if stack:
            stack[-1][3] += te - ts  # child of the enclosing op
        else:
            top_incl[name] += te - ts
        stack.append([ts, te, name, 0.0])
        cnt[name] += 1
    while stack:
        pop_one()

    total = sum(agg.values())
    print(f"steps: {n_steps}; module total {mod_total/1e3/n_steps:.1f} "
          f"ms/step; sum of ops {total/1e3/n_steps:.1f} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  {'count':>6}  op")
    for name, d in agg.most_common(args.top):
        print(f"{d/1e3/n_steps:9.2f}  {100*d/total:5.1f}  "
              f"{cnt[name]//n_steps:6d}  {name[:100]}")

    # category rollup by name heuristics
    cats = collections.Counter()
    for name, d in agg.items():
        if name.startswith("while"):
            cats["scans (layer fwd/bwd, canny hysteresis)"] += d
        elif "convolution" in name:
            cats["convolutions (adapter patchify/canny)"] += d
        elif "dynamic-update-slice" in name or "dynamic-slice" in name:
            cats["slice/update (cache/gather)"] += d
        elif name.startswith(("fusion", "bitcast", "add", "multiply",
                              "reduce", "transpose", "copy")):
            cats["XLA fusions (elementwise/reduce/layout)"] += d
        elif "custom-call" in name or "tpu_custom_call" in name:
            cats["custom calls (Pallas kernels)"] += d
        else:
            cats["other"] += d
    print("\ncategory rollup:")
    for c, d in cats.most_common():
        print(f"{d/1e3/n_steps:9.2f}  {100*d/total:5.1f}  {c}")

    print("\ntop-level phases (inclusive, depth-0 ops >1% of step):")
    for name, d in top_incl.most_common():
        if d < 0.01 * total:
            break
        print(f"{d/1e3/n_steps:9.2f}  {100*d/total:5.1f}  {name[:100]}")


if __name__ == "__main__":
    main()
