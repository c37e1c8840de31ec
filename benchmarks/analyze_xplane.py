"""Parse a jax.profiler trace (.xplane.pb) without the broken plugin
converter: aggregate device-plane op durations by op name.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python benchmarks/analyze_xplane.py /tmp/trace_dir [top_n]

The standard tensorboard_plugin_profile converter in this image fails
(pywrap mismatch), so this walks the XSpace proto directly:
planes -> lines -> events, mapping event.metadata_id through the plane's
event_metadata table. Durations are picoseconds.
"""

import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load_spaces(root):
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {root}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def simplify(name: str) -> str:
    """Strip fusion suffixes/ids so repeated instances of the same op merge."""
    name = re.sub(r"\.\d+$", "", name)
    return name


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    for path, xs in load_spaces(root):
        print(f"== {path}")
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            per_op = collections.defaultdict(float)
            per_op_count = collections.defaultdict(int)
            line_total = collections.defaultdict(float)
            for line in plane.lines:
                for ev in line.events:
                    name = simplify(meta.get(ev.metadata_id, "?"))
                    dur = ev.duration_ps / 1e9  # -> ms
                    per_op[name] += dur
                    per_op_count[name] += 1
                    line_total[line.name] += dur
            if not per_op:
                continue
            print(f"-- plane {plane.name}")
            for ln, tot in sorted(line_total.items(), key=lambda kv: -kv[1]):
                print(f"   line {ln}: {tot:.1f} ms")
            total = sum(per_op.values())
            print(f"   top ops (of {total:.1f} ms summed):")
            for name, tot in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"   {tot:9.2f} ms  x{per_op_count[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
