"""Tracing / profiling (SURVEY §5.1).

The reference has coarse wall-time logging only (per-epoch/per-batch
timers into MLflow). Here:

  * `trace(logdir)` — context manager around `jax.profiler.trace`;
    produces TensorBoard-loadable traces of device ops.
  * `profile_fn(fn, *args)` — compile-then-time a jitted callable with
    a proper sync (scalar fetch — block_until_ready can return early
    through this environment's remote relay), returning wall stats.
  * `device_op_summary(logdir)` — parse the trace protobuf-JSON and
    return the top device ops by total duration (what we used to find
    the decoder concat copies; see BASELINE.md kernel findings).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str | Path = "/tmp/terra_gan_tpu_trace"):
    logdir = str(logdir)
    with jax.profiler.trace(logdir):
        yield logdir


def _sync(value: Any) -> None:
    leaves = jax.tree.leaves(value)
    if leaves:
        float(jnp.sum(leaves[0]))


def profile_fn(
    fn: Callable, *args, iters: int = 10, warmup: int = 1, **kwargs
) -> Dict[str, float]:
    """Wall-time a callable with warmup + data-dependent sync."""
    out = None
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _sync(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _sync(out)
    total = time.perf_counter() - t0
    return {
        "warmup_s": compile_s,
        "mean_ms": total / iters * 1000.0,
        "iters_per_s": iters / total,
    }


def device_op_table(logdir: str | Path) -> List[Dict[str, Any]]:
    """Full device-op rows from a trace dir, one per distinct HLO op.

    Unlike device_op_summary (which keeps every trace event, including
    host-side python frames), this filters to events on `/device:*`
    processes (fallback: events carrying HLO metadata when the trace
    has no process names) and keeps the per-op roofline inputs the TPU
    trace provides: accumulated duration, `model_flops`,
    `bytes_accessed`, the semantic `tf_op` path (which distinguishes
    jvp/transpose — forward vs backward), and the deepest repo frame of
    `source_stack`. This is what the train-side roofline table
    (scripts/profile_train.py, BASELINE.md r4) is built from.
    """
    rows: Dict[str, Dict[str, Any]] = {}
    for fp in glob.glob(
        str(Path(logdir) / "**" / "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(fp, "rt") as fh:
            data = json.load(fh)
        evs = data.get("traceEvents", [])
        device_pids = {
            ev["pid"]
            for ev in evs
            if ev.get("ph") == "M"
            and ev.get("name") == "process_name"
            and str((ev.get("args") or {}).get("name", "")).startswith(
                "/device:"
            )
        }
        for ev in evs:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            args = ev.get("args") or {}
            if device_pids and ev.get("pid") not in device_pids:
                continue
            # keep HLO ops only: step/region events (the jit_step span,
            # per-iteration markers) carry no HLO metadata and would
            # double-count every child op under them
            if not (args.get("hlo_category") or args.get("long_name")
                    or args.get("tf_op")):
                continue
            name = ev.get("name", "")
            row = rows.setdefault(
                name,
                {
                    "name": name,
                    "ms": 0.0,
                    "count": 0,
                    "flops": 0.0,
                    "bytes": 0.0,
                    "tf_op": args.get("tf_op", ""),
                    "source": args.get("source", ""),
                    "source_stack": args.get("source_stack", ""),
                    "category": args.get("hlo_category", ""),
                    "long_name": args.get("long_name", ""),
                },
            )
            row["ms"] += ev["dur"] / 1000.0
            row["count"] += 1
            row["flops"] += float(args.get("model_flops", 0) or 0)
            row["bytes"] += float(args.get("raw_bytes_accessed",
                                           args.get("bytes_accessed", 0))
                                  or 0)
    return sorted(rows.values(), key=lambda r: -r["ms"])


def device_op_summary(
    logdir: str | Path, top: int = 25
) -> List[Tuple[str, float]]:
    """Top device ops by accumulated duration (ms) from a trace dir.

    Keys are "<op name> | <source attribution>" when the trace carries
    HLO metadata (args.long_name / args.source) — that is what maps an
    XLA fusion back to the model stage that emitted it."""
    durations: Dict[str, float] = {}
    for fp in glob.glob(
        str(Path(logdir) / "**" / "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(fp, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "")
                args = ev.get("args") or {}
                meta = args.get("long_name") or args.get("source") or ""
                if meta:
                    name = f"{name} | {meta}"
                durations[name] = durations.get(name, 0.0) + ev["dur"] / 1000.0
    return sorted(durations.items(), key=lambda kv: -kv[1])[:top]
