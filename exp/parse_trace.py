"""Parse a captured xplane.pb and print top ops by device time.

Usage: python exp/parse_trace.py [trace_dir] [topk] [nsteps]
(nsteps = traced step count, used only to normalize to ms/step)
"""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/k3m_trace"
topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40
nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
assert paths, f"no xplane under {trace_dir}"

op_time = defaultdict(float)
total = 0.0
for p in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU:"):
            continue
        ev_meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            # exactly the synchronous compute line — "Async XLA Ops" spans
            # overlap compute and would double-count
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                op_time[name] += dur
                total += dur

rows = sorted(op_time.items(), key=lambda kv: -kv[1])[:topk]
print(f"total device op time: {total:.4f}s ({total/nsteps:.4f}s/step over "
      f"{nsteps} steps); {len(op_time)} distinct ops")
for name, t in rows:
    print(f"{t/nsteps*1000:9.2f} ms/step  {100*t/total:5.1f}%  {name[:150]}")
