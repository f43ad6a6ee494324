"""Summarize per-op device time from a jax.profiler xplane trace.

Reads the TensorBoard profile's gzipped Chrome-trace JSON (written next
to the .xplane.pb) and aggregates wall time by op name on the TPU device
track. Usage:

    python tools/xplane_ops.py [trace_dir] [--top 40] [--group]

--group collapses XLA fusion names (fusion.123 -> fusion) and reports
aggregate per-category time, which is what you want for "where does the
sampler spend its time".
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    path = paths[-1]
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/fastdiffsr_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--pid-filter", default="")
    args = ap.parse_args()

    events = load_events(args.trace_dir)

    # map pid -> process name to find the TPU device track(s)
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")

    device_pids = {pid for pid, name in pid_name.items()
                   if re.search(r"TPU|/device|XLA Op", name, re.I)
                   and "host" not in name.lower()}
    print("# process tracks:", file=sys.stderr)
    for pid, name in sorted(pid_name.items()):
        mark = " <-- device" if pid in device_pids else ""
        print(f"#   pid {pid}: {name}{mark}", file=sys.stderr)

    by_op = collections.Counter()
    by_op_calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        if args.pid_filter and str(e.get("pid")) != args.pid_filter:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))  # microseconds
        if args.group:
            name = re.sub(r"\.\d+$", "", name)
            name = re.sub(r"\d+$", "", name)
        by_op[name] += dur
        by_op_calls[name] += 1
        total += dur

    print(f"{'op':<64} {'ms':>10} {'%':>6} {'calls':>7}")
    for name, dur in by_op.most_common(args.top):
        print(f"{name[:64]:<64} {dur/1e3:>10.2f} {100*dur/total:>6.2f} "
              f"{by_op_calls[name]:>7}")
    print(f"{'TOTAL':<64} {total/1e3:>10.2f}")


if __name__ == "__main__":
    main()
