"""Shared xplane-proto parsing for the trace-attribution tools.

jax.profiler.trace writes <dir>/plugins/profile/<ts>/<host>.xplane.pb;
device-op wall time lives in the TPU plane's XLA-op line.  The axon
tunnel makes host-side timing unreliable (dispatch-only returns), so
device traces are the ONE trustworthy attribution source (verify-skill
note, round 3).
"""
import glob
import os
from collections import defaultdict


def parse_device_ops(trace_dir: str):
    """-> {op_name: seconds} from the densest device (plane, line)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    by_op = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                by_op[(plane.name, line.name, name)] += ev.duration_ps / 1e12
    line_tot = defaultdict(float)
    for (pl, ln, name), s in by_op.items():
        line_tot[(pl, ln)] += s
    if not line_tot:
        return {}, None
    op_line = max(line_tot, key=line_tot.get)
    return ({name: s for (pl, ln, name), s in by_op.items()
             if (pl, ln) == op_line}, op_line)


def bucket_ops(ops: dict, rules):
    """rules: list of (bucket_name, substring_list); first match wins."""
    buckets = defaultdict(float)
    for name, s in ops.items():
        n = name.lower()
        for b, subs in rules:
            if any(sub in n for sub in subs):
                buckets[b] += s
                break
        else:
            buckets["other"] += s
    return dict(sorted(buckets.items(), key=lambda kv: -kv[1]))
