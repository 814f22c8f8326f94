"""Summarize a jax.profiler xplane trace: per-op device time, top-N table.

No tensorflow/tensorboard dependency: decodes the protobuf wire format
directly (XSpace/XPlane/XLine/XEvent field numbers from the public
tsl/profiler/protobuf/xplane.proto schema) and aggregates event durations
per event-metadata name on TPU device planes.

Usage:
  python tools/trace_summary.py /tmp/traintrace [--top 40] [--re pattern]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 1:
            val, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        elif wt == 5:
            val, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf):
    name = ""
    lines = []
    ev_meta = {}
    for fnum, _wt, val in fields(buf):
        if fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 3:
            lname = ""
            for lf, _lw, lv in fields(val):
                if lf == 2:
                    lname = lv.decode("utf-8", "replace")
            lines.append((lname, val))
        elif fnum == 4:  # map<int64, XEventMetadata>
            kid, meta_name = None, ""
            for mf, _mw, mv in fields(val):
                if mf == 1:
                    kid = mv
                elif mf == 2:  # XEventMetadata
                    for ef, _ew, evv in fields(mv):
                        if ef == 2:
                            meta_name = evv.decode("utf-8", "replace")
            if kid is not None:
                ev_meta[kid] = meta_name
    return name, lines, ev_meta


def parse_line_events(buf):
    """Yield (metadata_id, duration_ps) for each event in an XLine."""
    for fnum, _wt, val in fields(buf):
        if fnum == 4:  # XEvent
            mid, dur = 0, 0
            for ef, _ew, ev in fields(val):
                if ef == 1:
                    mid = ev
                elif ef == 3:
                    dur = ev
            yield mid, dur


CATEGORIES = (
    ("matmul", re.compile(r"%(dot|convolution)\b")),
    ("fusion", re.compile(r"%(fusion|add|multiply|subtract|divide|exp|log|"
                          r"tanh|select|compare|maximum|minimum|reduce|"
                          r"broadcast|iota|concatenate|transpose|reshape|"
                          r"bitcast|convert|negate|power|rsqrt|sqrt)")),
    ("copy", re.compile(r"%(copy|slice-start|slice-done|copy-start|copy-done|"
                        r"dynamic-slice|dynamic-update-slice|slice|gather|"
                        r"scatter|pad)")),
    ("custom-call", re.compile(r"%custom-call")),
    ("while/control", re.compile(r"%(while|conditional|call|tuple|"
                                 r"get-tuple-element|parameter|constant)")),
    ("rng", re.compile(r"%rng")),
    ("sort", re.compile(r"%sort")),
)


def categorize(op):
    # pallas/mosaic kernels keep their jaxpr-derived names (%jvp__...) but
    # always carry custom_call_target= in the HLO text
    if "custom_call_target=" in op:
        return "custom-call"
    for cat, rx in CATEGORIES:
        if rx.match(op):
            return cat
    return "other"


def summarize(trace_dir, top=40, pattern=None, include_host=False,
              line_filter="XLA Ops", steps=1):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    path = paths[-1]
    buf = open(path, "rb").read()
    print(f"# {path} ({len(buf)/1e6:.1f} MB)")

    per_op = collections.Counter()
    per_op_count = collections.Counter()
    per_cat = collections.Counter()
    line_totals = collections.Counter()
    total = 0
    for fnum, _wt, val in fields(buf):
        if fnum != 1:  # XPlane
            continue
        name, lines, ev_meta = parse_plane(val)
        is_device = ("/device:TPU" in name and "TPU:" in name) or \
            name.startswith("/device:tpu")
        if not is_device and not include_host:
            continue
        for lname, line in lines:
            ltot = 0
            for mid, dur in parse_line_events(line):
                ltot += dur
                if line_filter and lname != line_filter:
                    # exact match: 'XLA Ops' must NOT swallow 'Async XLA Ops'
                    # (async DMA windows overlap compute and would double
                    # count as serialized device time)
                    continue
                op = ev_meta.get(mid, f"#{mid}")
                per_op[op] += dur
                per_op_count[op] += 1
                per_cat[categorize(op)] += dur
                total += dur
            line_totals[f"{name} :: {lname}"] += ltot

    print("\n## line totals (all planes/lines, for orientation)")
    for ln, dur in line_totals.most_common(12):
        print(f"  {ln[:76]:<76} {dur/1e9:9.3f} ms")

    print(f"\n## category rollup (line filter: {line_filter!r}, "
          f"/{steps} steps)")
    for cat, dur in per_cat.most_common():
        print(f"  {cat:<16} {dur/1e9:9.3f} ms total  "
              f"{dur/1e9/steps:8.3f} ms/step  {100*dur/max(total,1):5.1f}%")
    print(f"  {'TOTAL':<16} {total/1e9:9.3f} ms total  "
          f"{total/1e9/steps:8.3f} ms/step")

    if pattern:
        rx = re.compile(pattern)
        per_op = collections.Counter(
            {k: v for k, v in per_op.items() if rx.search(k)})
    print(f"\n{'op':<72} {'ms':>9} {'%':>6} {'count':>7}")
    for op, dur in per_op.most_common(top):
        print(f"{op[:72]:<72} {dur/1e9:9.3f} {100*dur/max(total,1):6.2f} "
              f"{per_op_count[op]:7d}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--re", dest="pattern", default=None)
    ap.add_argument("--host", action="store_true", dest="include_host")
    ap.add_argument("--line", default="XLA Ops",
                    help="only aggregate XLines whose name contains this")
    ap.add_argument("--steps", type=int, default=1,
                    help="divide totals by this many train steps")
    args = ap.parse_args()
    summarize(args.trace_dir, args.top, args.pattern, args.include_host,
              args.line, args.steps)
