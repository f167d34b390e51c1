"""Parse a jax.profiler xplane trace into a TPU op-time breakdown.

The tensorboard_plugin_profile converters are incompatible with this
environment's TF build, so this reads the xplane proto directly.
This is the tool that found the SPP maxpool bottleneck in round 1
(+35% train throughput when fixed).

Usage:
    # capture (see Model.fit(profile_dir=...) or manual
    # jax.profiler.start_trace/stop_trace around jitted steps)
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/parse_tpu_profile.py /tmp/tpu_prof

Caveat: durations of async ops (copy-start/slice-start) measure
in-flight time that overlaps compute — they indicate traffic, not
necessarily stalls.
"""

import collections
import glob
import re
import sys


def main(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        by_kind = collections.Counter()
        by_name = collections.Counter()
        total = 0
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                m = re.match(r"%([a-zA-Z_\-]+)", name)
                kind = m.group(1) if m else name.split(".")[0][:40]
                by_kind[kind] += ev.duration_ps
                by_name[name[:100]] += ev.duration_ps
                total += ev.duration_ps

        def is_copy(s):
            # in-flight DMA spans that OVERLAP compute (VMEM prefetch)
            return ("copy-start" in s or "slice-start" in s
                    or "copy-done" in s or "slice-done" in s)

        def is_umbrella(s):
            # whole-execution region spans (jit_<fn>, bare step ids)
            return bool(s.startswith("jit_") or re.fullmatch(r"\d+", s))

        def is_async(s):
            # either double-books the timeline next to op spans
            return is_copy(s) or is_umbrella(s)

        sync_total = sum(d for k, d in by_kind.items()
                         if not is_async(k))
        copy_total = sum(d for k, d in by_kind.items() if is_copy(k))
        print(f"total attributed op-time {total / 1e12:.3f}s "
              f"(compute-attributed {sync_total / 1e12:.3f}s, "
              f"overlapped async copies {copy_total / 1e12:.3f}s, "
              f"umbrella regions "
              f"{(total - sync_total - copy_total) / 1e12:.3f}s)")
        if sync_total == 0:
            print("no compute-attributed op events in this trace "
                  "(only umbrella/copy spans captured)")
            return
        print("\nby op kind (% of compute-attributed time, async "
              "copies excluded):")
        for kind, dur in by_kind.most_common(40):
            if is_async(kind):
                continue
            print(f"   {dur / sync_total * 100:5.1f}%  {kind}")
        print("\ntop named ops (async copies excluded):")
        shown = 0
        for name, dur in by_name.most_common(400):
            if is_async(name):
                continue
            print(f"   {dur / sync_total * 100:5.2f}%  {name}")
            shown += 1
            if shown >= 15:
                break
        return
    raise SystemExit("no /device:TPU:0 plane in trace")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_prof")
