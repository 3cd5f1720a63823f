"""Batched catalog mode for find_mutation (`--batch`).

The full pipeline — frontier walk, path enumeration, quantification,
classification — runs through models.batch.run_catalog: on an
accelerator backend the count table is promoted to a DeviceCountTable
and every stage executes as batched device dispatches (single-dispatch
while_loop walk, lockstep Dijkstra sweeps, one batched NNLS solve);
on a CPU-only backend the host-orchestrated batch path runs instead.
Either way the rows are byte-identical to sequential mode (asserted in
tests/test_batch_pipeline.py). Replaces the reference's
one-process-per-target shell loop (reference:
example/run_leucegene.sh:29-35).

Device health probe: a remote/tunneled accelerator can hang
indefinitely at session claim or first dispatch (observed: a client
killed mid-session wedges subsequent claims for minutes) — and on this
tunnel even ``import jax`` / ``jax.default_backend()`` can block at
session claim via the sitecustomize backend registration. So backend
*detection* and the tiny probe dispatch both run inside one daemon
thread under a deadline (KM_TPU_BATCH_DEADLINE seconds, default 60; 0
skips the probe and detects on the main thread); no JAX call touches
the main thread before the probe verdict. On timeout or error the
pipeline falls back to the host batch path — sub-second on catalog
workloads — instead of blocking forever. The host path imports no JAX,
so a wedged tunnel cannot stall it.
"""

from __future__ import annotations

import os
import sys
import threading

from ..models.batch import run_catalog
from ..utils import profiling

DEFAULT_PROBE_DEADLINE_S = 60.0


def _device_backend() -> bool:
    """True when a non-CPU JAX backend will run the batched kernels.
    KM_TPU_BATCH_DEVICE=0/1 overrides the autodetection."""
    forced = os.environ.get("KM_TPU_BATCH_DEVICE")
    if forced is not None:
        return forced not in ("", "0", "false")
    import jax

    return jax.default_backend() != "cpu"


def _default_probe():
    """One tiny end-to-end device dispatch (claims the backend session,
    compiles a trivial program, executes, reads back)."""
    import jax
    import jax.numpy as jnp

    jax.devices()
    return float(jnp.ones(8).sum())


def probe_device(deadline_s: float, work=_default_probe) -> str:
    """Run backend detection + ``work`` in one daemon thread; returns
    ``'ok'`` (non-CPU backend answered the probe), ``'cpu'`` (backend is
    CPU — host pipeline is the right path, nothing wrong), ``'error'``
    (detection or probe raised) or ``'timeout'``. Detection runs inside
    the thread because on a wedged tunnel even ``import jax`` can block
    (see module note). A hung thread is abandoned — it blocks on the
    wedged backend and dies with the process."""
    result: list[str] = []

    def runner():
        try:
            if not _device_backend():
                result.append("cpu")
                return
            work()
            result.append("ok")
        except Exception:
            result.append("error")

    t = threading.Thread(target=runner, daemon=True,
                         name="km-tpu-device-probe")
    t.start()
    t.join(deadline_s)
    return result[0] if result else "timeout"


def prepare_table(table, probe=_default_probe):
    """Promote a host table to the device when a healthy accelerator
    backend is present (see module note); returns the table to run the
    batched pipeline with."""
    forced_env = os.environ.get("KM_TPU_BATCH_DEVICE")
    if forced_env is not None:
        # explicit override: no probe, no deadline
        use_device = forced_env not in ("", "0", "false")
    else:
        deadline = float(os.environ.get("KM_TPU_BATCH_DEADLINE",
                                        DEFAULT_PROBE_DEADLINE_S))
        if deadline <= 0:
            # probe explicitly disabled: detect on the main thread
            use_device = _device_backend()
        else:
            verdict = probe_device(deadline, probe)
            use_device = verdict == "ok"
            if verdict in ("timeout", "error"):
                sys.stderr.write(
                    "VERBOSE:km-tpu: device backend %s after %.0fs; "
                    "falling back to the host batch pipeline (set "
                    "KM_TPU_BATCH_DEVICE=1 to wait indefinitely)\n"
                    % ("unresponsive" if verdict == "timeout"
                       else "errored", deadline))

    if use_device:
        from ..ops.device_table import DeviceCountTable
        from ..utils import jaxcache

        jaxcache.enable()
        with profiling.phase("table_to_device"):
            table = DeviceCountTable.from_host(table)
    return table


def emit_batched(targets, table, args, probe=_default_probe) -> None:
    table = prepare_table(table, probe=probe)
    with profiling.phase("batch_pipeline"):
        # on_budget='skip': one runaway target loses only its own rows
        # (with km's error line on stderr), matching the blast radius
        # of the reference's one-process-per-target loop
        row_lists = run_catalog(
            targets, table, ratio=args.ratio, count=args.count,
            max_stack=args.steps, max_break=args.branchs,
            max_node=args.nodes, graphical=args.graphical,
            on_budget="skip")
    for rows in row_lists:
        for row in rows:
            sys.stdout.write(str(row) + "\n")
