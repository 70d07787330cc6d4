"""Device-trace attribution of the 48.7%-MFU ceiling row (VERDICT r4
weak item 4): what is the remaining 51% of the 138.9k seq/s step
(GRU-256 / 200k catalog / B=8192 / adagrad / --r_emb 128)?

Captures an xplane trace of the fused K-step dispatch and prints the
top device ops by total time, grouped into coarse buckets (output-head
matmuls, tower scan, gather/scatter, optimizer, other), plus the same
for optional comparison configs. The bucket shares name the next bound.

Usage: python scripts/ceiling_trace_r5.py [--B 8192] [--emb 128]
       [--opt adagrad] [--dtype float32]
"""

from __future__ import annotations

import argparse
import collections
import glob as globmod
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TRACE_DIR = "/tmp/seqrec_ceiling_trace"


def device_op_events(model, handler, K, n_dispatch=2):
    import jax

    from bench import _pipeline

    from xprof.convert import raw_to_tool_data as rtd

    gen = _pipeline(model, handler, K)
    cost = model.train_function_stacked(next(gen))
    jax.block_until_ready(cost)

    shutil.rmtree(_TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(_TRACE_DIR)
    for _ in range(n_dispatch):
        cost = model.train_function_stacked(next(gen))
    jax.block_until_ready(cost)
    jax.profiler.stop_trace()
    files = globmod.glob(_TRACE_DIR + "/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(files, "trace_viewer", {})
    events = json.loads(data).get("traceEvents", [])
    shutil.rmtree(_TRACE_DIR, ignore_errors=True)
    return events


BUCKET_PATTERNS = [
    # (bucket, substrings matched against the lowercased op name)
    ("head-matmul/streaming", ("scan", "while")),  # chunked CCE scan body shows as while/scan
    ("gather", ("gather",)),
    ("scatter", ("scatter",)),
    ("dus/slice", ("dynamic-update-slice", "dynamic-slice", "slice")),
    ("conv/dot", ("dot", "convolution", "einsum")),
    ("fusion", ("fusion",)),
    ("copy", ("copy",)),
    ("infeed/outfeed", ("infeed", "outfeed")),
]


TRACK = "XLA Ops"


def summarize(events, label):
    # identify the TPU device process and its "XLA Ops" thread from the
    # trace metadata — host python/runtime threads otherwise dominate
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pnames.items() if "TPU" in n or "/device" in n}
    print("processes:", {p: n for p, n in pnames.items()})
    op_tids = {
        pt for pt, n in tnames.items()
        if pt[0] in dev_pids and n == TRACK
    }
    print("device op threads:", {pt: tnames[pt] for pt in op_tids})

    # spans on the XLA Ops track are NESTED (while loops contain their
    # body ops) — attribute SELF time via a flame stack per thread
    per_thread = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in op_tids and key[1] != 4:  # skip Async XLA Ops
            per_thread[key].append(e)

    self_time = collections.Counter()
    total_time = collections.Counter()
    for key, evs in per_thread.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, name, child_accum index)
        child = []
        for e in evs:
            ts, dur, name = e["ts"], e.get("dur", 0), e.get("name", "")
            while stack and stack[-1][0] <= ts + 1e-9:
                end, nm, ci = stack.pop()
                self_time[nm] += ci[0]
                if stack:
                    stack[-1][2][0] -= 0  # no-op; child already charged
            if stack:
                stack[-1][2][0] -= dur  # subtract child from parent self
            total_time[name] += dur
            stack.append((ts + dur, name, [dur]))
        while stack:
            end, nm, ci = stack.pop()
            self_time[nm] += ci[0]

    total = sum(self_time.values())
    print(f"\n=== {label}: total self-time {total/1e3:.1f} ms ===")
    print(f"{'self ms':>10} {'self %':>6} {'total ms':>10}  name")
    for name, dur in self_time.most_common(40):
        print(
            f"  {dur/1e3:9.2f} {100.0*dur/max(total,1):5.1f}% "
            f"{total_time[name]/1e3:9.2f}  {name[:100]}"
        )
    return self_time, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8192)
    ap.add_argument("--emb", type=int, default=128)
    ap.add_argument("--opt", default="adagrad")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--catalog", type=int, default=200_000)
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--family", default="cce")
    args = ap.parse_args()

    from bench import _USERS, _ensure_matrix_dataset, make_model
    from seqrec_tpu.data import DataHandler

    handler = DataHandler(
        _ensure_matrix_dataset(args.catalog, _USERS[args.catalog])
    )
    model = make_model(
        args.B, hidden=args.H, n_items=handler.n_items,
        compute_dtype=args.dtype, device_init=True, opt=args.opt,
        emb=args.emb, family=args.family,
    )
    events = device_op_events(model, handler, args.K)
    with open("/tmp/ceiling_trace_events.json", "w") as f:
        json.dump(events, f)
    label = (
        f"H={args.H} catalog={args.catalog} B={args.B} opt={args.opt} "
        f"emb={args.emb} {args.dtype} {args.family}"
    )
    global TRACK
    for track in ("XLA Ops", "Framework Ops"):
        TRACK = track
        summarize(events, f"{label} [{track}]")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
