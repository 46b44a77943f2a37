#!/usr/bin/env python
"""Summarize a jax.profiler trace + compiled HLO for the perf workflow.

Two subcommands (both offline — no TPU needed):

  trace <dir>     aggregate device-lane op durations from the
                  ``plugins/profile/*/*.trace.json.gz`` written by
                  ``jax.profiler.trace`` (what docs/PERF.md tables are
                  built from: per-op totals, counts, device busy vs span).

  hlo <file>      scan an optimized HLO text dump (``compiled.as_text()``)
                  for fusions with large outputs — the tool that exposed
                  the 1.22 GB f32 residuals of round 3 (docs/PERF.md
                  "f32-residual hunt").  Flags every fusion whose output
                  tuple contains a tensor >= --min-mb, with its op_name
                  metadata so the source line is one grep away.

Usage:
    python scripts/trace_summary.py trace /tmp/jax-trace-epoch [--top 40]
    python scripts/trace_summary.py hlo /tmp/epoch_hlo.txt [--min-mb 32]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def _find_trace_json(root: str) -> str:
    if os.path.isfile(root):
        return root
    hits = sorted(glob.glob(
        os.path.join(root, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        sys.exit(f"no *.trace.json.gz under {root}")
    return hits[-1]  # latest capture


def cmd_trace(args) -> None:
    path = _find_trace_json(args.path)
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]

    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = [p for p, n in pids.items() if "TPU" in n or "GPU" in n]
    if not dev_pids:
        sys.exit(f"no device lane found; processes: {pids}")

    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    span_lo, span_hi = float("inf"), 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            span_lo = min(span_lo, e["ts"])
            span_hi = max(span_hi, e["ts"] + e.get("dur", 0))

    # the outermost jit module event double-counts its children: report it
    # separately, sum only leaf-ish entries for "busy".
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"trace: {path}")
    print(f"device lane span: {(span_hi - span_lo) / 1e3:.2f} ms")
    print(f"{'ms':>10}  {'count':>6}  name")
    for name, us in rows[: args.top]:
        print(f"{us / 1e3:10.2f}  {cnt[name]:6d}  {name[:100]}")


_TENSOR_RE = re.compile(r"(f32|bf16|f16|s32|u32)\[([0-9,]+)\]")
_FUSION_RE = re.compile(r"^\s+%([A-Za-z_0-9.\-]+) = (.*?) fusion\(")
_META_RE = re.compile(r'op_name="([^"]*)"')
_SRC_RE = re.compile(r'source_file="([^"]*)" source_line=([0-9]+)')
_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4}


def cmd_hlo(args) -> None:
    min_bytes = args.min_mb * 1e6
    n_flagged = 0
    for line in open(args.path):
        m = _FUSION_RE.match(line)
        if not m:
            continue
        name, ty = m.group(1), m.group(2)
        bigs = []
        for dt, dims in _TENSOR_RE.findall(ty):
            n = 1
            for d in dims.split(","):
                n *= int(d)
            b = n * _BYTES[dt]
            if b >= min_bytes:
                bigs.append(f"{dt}[{dims}]={b / 1e6:.0f}MB")
        if not bigs:
            continue
        n_flagged += 1
        meta = _META_RE.search(line)
        src = _SRC_RE.search(line)
        loc = f"  <- {src.group(1)}:{src.group(2)}" if src else ""
        op = f"  ({meta.group(1)})" if meta else ""
        print(f"{name}: {', '.join(bigs)}{op}{loc}")
    print(f"{n_flagged} fusions with outputs >= {args.min_mb} MB")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("trace")
    t.add_argument("path")
    t.add_argument("--top", type=int, default=40)
    t.set_defaults(fn=cmd_trace)
    h = sub.add_parser("hlo")
    h.add_argument("path")
    h.add_argument("--min-mb", type=float, default=32.0)
    h.set_defaults(fn=cmd_hlo)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
