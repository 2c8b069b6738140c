"""Aggregate per-op device time from a jax.profiler trace (xplane.pb).

Usage:
  python tools/trace_ops.py /tmp/trace_dir [top_n]

Groups the 'XLA Ops' line of the TPU device plane by op name and prints total
duration per op (summed over trace repetitions), plus a category rollup
(fusion / convolution / dot / copy / etc.). This is the ground-truth answer
to "where does the time actually go" — per-op, from hardware counters, not
host-side guesswork.
"""

import collections
import glob
import re
import sys


def load_events(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    for p in xs.planes:
        if "TPU" in p.name and "device" in p.name:
            ev_names = p.event_metadata
            for line in p.lines:
                if line.name == "XLA Ops":
                    return [
                        (ev_names[e.metadata_id].name, e.duration_ps / 1e9)
                        for e in line.events
                    ]
    raise SystemExit("no TPU XLA Ops line found")


def categorize(name):
    # op kind = the HLO instruction name before the first '.' or ' ='
    n = name.lower().lstrip("%")
    head = re.split(r"[ =.]", n)[0]
    for cat in ("copy", "convolution", "dot", "transpose", "fusion",
                "reduce", "broadcast", "reshape", "select", "scatter",
                "iota", "dynamic", "custom", "convert"):
        if cat in head:
            return cat
    return head[:20]


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    events = load_events(trace_dir)
    total = sum(d for _, d in events)
    by_op = collections.Counter()
    count = collections.Counter()
    for name, dur in events:
        by_op[name] += dur
        count[name] += 1
    print(f"total device time {total:.2f} ms over {len(events)} events\n")
    print(f"{'op':60s} {'ms':>8s} {'n':>5s} {'%':>6s}")
    for name, dur in by_op.most_common(top_n):
        print(f"{name[:60]:60s} {dur:8.2f} {count[name]:5d} {dur / total * 100:6.1f}")
    by_cat = collections.Counter()
    for name, dur in by_op.items():
        by_cat[categorize(name)] += dur
    print("\ncategory rollup:")
    for cat, dur in by_cat.most_common():
        print(f"  {cat:12s} {dur:8.2f} ms {dur / total * 100:6.1f}%")


if __name__ == "__main__":
    main()
