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
