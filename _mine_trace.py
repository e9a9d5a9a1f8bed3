"""One-off: distill a jax.profiler trace (XLA Ops track) by hlo_category.

Usage: python _mine_trace.py /tmp/trace_r3b [n_steps]
Prints ms/step per hlo_category plus the top single ops, with modeled
bytes_accessed / model_flops where the trace carries them.
"""
import glob
import gzip
import json
import sys
from collections import defaultdict

root = sys.argv[1]
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
paths = glob.glob(f"{root}/**/*.trace.json.gz", recursive=True)
assert paths, f"no trace under {root}"
with gzip.open(sorted(paths)[-1], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# find the XLA Ops thread(s): events carrying hlo_category args
cat_time = defaultdict(float)
cat_bytes = defaultdict(float)
cat_flops = defaultdict(float)
op_time = defaultdict(float)
op_meta = {}
total = 0.0
for e in events:
    args = e.get("args") or {}
    if e.get("ph") != "X" or "hlo_category" not in args:
        continue
    dur = e.get("dur", 0) / 1e3  # us -> ms
    cat = args["hlo_category"]
    cat_time[cat] += dur
    total += dur
    cat_bytes[cat] += float(args.get("bytes_accessed", 0) or 0)
    cat_flops[cat] += float(args.get("model_flops", 0) or 0)
    name = e.get("name", "?")
    op_time[name] += dur
    op_meta[name] = (cat, args.get("bytes_accessed", 0),
                     args.get("model_flops", 0))

print(f"total device op time: {total / nsteps:.2f} ms/step over {nsteps} steps")
tb = sum(cat_bytes.values())
tf_ = sum(cat_flops.values())
print(f"modeled: {tf_ / nsteps / 1e9:.1f} GFLOP/step, "
      f"{tb / nsteps / 1e9:.2f} GB/step "
      f"-> {tf_ / (total / 1e3) / 1e12:.1f} TFLOP/s, "
      f"{tb / (total / 1e3) / 1e9:.0f} GB/s")
print("\nby hlo_category (ms/step, %, GB/s):")
for cat, t in sorted(cat_time.items(), key=lambda kv: -kv[1]):
    ms = t / nsteps
    bw = cat_bytes[cat] / (t / 1e3) / 1e9 if t else 0
    print(f"  {cat:45s} {ms:7.2f}  {100 * t / total:5.1f}%  {bw:6.0f} GB/s")
print("\ntop 20 single ops (ms/step, modeled MB/firing, achieved GB/s, GFLOP/s):")
for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:20]:
    cat, b, fl = op_meta[name]
    b, fl = float(b or 0), float(fl or 0)
    ms = t / nsteps  # one firing per step for uniquely-named fusions
    bw = b / (ms / 1e3) / 1e9 if ms else 0
    fs = fl / (ms / 1e3) / 1e9 if ms else 0
    print(f"  {name[:52]:52s} {ms:6.2f} {b / 1e6:8.1f}MB "
          f"{bw:6.0f}GB/s {fs:8.0f}GF/s [{cat}]")
