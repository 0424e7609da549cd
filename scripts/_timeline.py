"""Shared device-timeline parsing for the profiling scripts.

The trace's TPU op track is HIERARCHICAL: named scopes (remat regions,
module scopes like ``self_attn``) and ``cond``/``branch_*`` spans enclose
the fusion/kernel events they contain. Summing raw durations double-books
every nested level, so aggregation here uses SELF TIME (an event's
duration minus its children's) per (pid, tid) lane, and the step total is
the union of top-level spans.
"""

import collections
import glob
import gzip
import json
import re


def load_tpu_events(tmpdir):
    """Complete X events from the TPU processes' "XLA Ops" lanes only —
    the "XLA Modules" lane (whole-program spans, step-numbered) and host
    lanes would double-book every op."""
    p = glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(p) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    return [
        e
        for e in ev
        if e.get("ph") == "X"
        and "dur" in e
        and "TPU" in pids.get(e["pid"], "")
        and tids.get((e["pid"], e.get("tid")), "") == "XLA Ops"
    ]


def self_time_aggregate(events, reps, keep_ids=False):
    """Returns (total_ms_per_rep, {key: (ms_per_rep, count_per_rep)}).

    Keys are op names with trailing ``.N``/digit suffixes stripped
    (``keep_ids=True`` keeps the full op identity, e.g. for HLO lookups).
    Self time: each event's duration minus the duration of events nested
    inside it on the same (pid, tid) lane; the total is top-level span
    time (what the device actually spent, no double counting).
    """
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    total = 0.0
    lanes = collections.defaultdict(list)
    for e in events:
        lanes[(e["pid"], e.get("tid", 0))].append(e)
    for lane in lanes.values():
        lane.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # [event, end_ts, child_time]
        for e in lane:
            ts, dur = e["ts"], e["dur"]
            while stack and ts >= stack[-1][1] - 1e-9:
                _attr(stack.pop(), durs, cnt, keep_ids)
            if stack:
                stack[-1][2] += dur
            else:
                total += dur
            stack.append([e, ts + dur, 0.0])
        while stack:
            _attr(stack.pop(), durs, cnt, keep_ids)
    agg = {k: (v / reps / 1e3, cnt[k] // reps) for k, v in durs.items()}
    return total / reps / 1e3, agg


def _attr(entry, durs, cnt, keep_ids=False):
    e, _, child_time = entry
    name = e["name"]
    if name.startswith("jit_"):
        return
    key = name if keep_ids else (re.sub(r"[.\d]+$", "", name) or name)
    durs[key] += max(e["dur"] - child_time, 0.0)
    cnt[key] += 1


def print_breakdown(total, agg, reps_label, top=45):
    print(f"=== device total: {total:.2f} ms/{reps_label} (self-time) ===")
    for k, (v, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{v:9.3f} ms  x{c:4d}  {k[:70]}")
