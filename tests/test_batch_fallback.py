"""`--batch` must never block on a wedged device backend: the health
probe times out (or errors) and the host pipeline emits the exact rows
within the deadline (VERDICT r3 ask #3)."""

import io
import threading
import time
from argparse import Namespace
from contextlib import redirect_stdout

from km_tpu.io.fasta import read_target
from km_tpu.models.sequence import TargetSeq
from km_tpu.models.table import CountTable
from km_tpu.tools import batchmode

from helpers import REFDATA

TARGET = f"{REFDATA}/catalog/GRCh38/NPM1_4ins_exons_10-11utr.fa"
JF = f"{REFDATA}/jf/02H025_NPM1.jf"

ARGS = Namespace(ratio=0.05, count=5, steps=500, branchs=10, nodes=10000,
                 graphical=False)


def _load():
    table = CountTable.from_jf(JF)
    seqs, _ = read_target(TARGET)
    return [TargetSeq("".join(seqs), "NPM1", table.k)], table


def _expected_rows(targets, table):
    from km_tpu.models.batch import run_catalog

    return [str(r) for rows in run_catalog(targets, table, walk="host")
            for r in rows]


def _emit(targets, table, probe):
    out = io.StringIO()
    with redirect_stdout(out):
        batchmode.emit_batched(targets, table, ARGS, probe=probe)
    return [line for line in out.getvalue().splitlines() if line]


def test_hanging_probe_falls_back_to_host(monkeypatch):
    """A probe that never returns (wedged tunnel at session claim) must
    not stall --batch: rows arrive via the host path within the
    deadline."""
    monkeypatch.setattr(batchmode, "_device_backend", lambda: True)
    monkeypatch.setenv("KM_TPU_BATCH_DEADLINE", "0.2")
    monkeypatch.delenv("KM_TPU_BATCH_DEVICE", raising=False)

    def hang_forever():
        threading.Event().wait()  # daemon thread; dies with the process

    targets, table = _load()
    t0 = time.perf_counter()
    rows = _emit(targets, table, hang_forever)
    elapsed = time.perf_counter() - t0
    assert rows == _expected_rows(targets, table)
    assert elapsed < 30  # deadline 0.2s + host pipeline, not a hang


def test_failing_probe_falls_back_to_host(monkeypatch):
    monkeypatch.setattr(batchmode, "_device_backend", lambda: True)
    monkeypatch.setenv("KM_TPU_BATCH_DEADLINE", "5")
    monkeypatch.delenv("KM_TPU_BATCH_DEVICE", raising=False)

    def broken():
        raise RuntimeError("tunnel RPC error")

    targets, table = _load()
    rows = _emit(targets, table, broken)
    assert rows == _expected_rows(targets, table)


def test_healthy_probe_uses_device_path(monkeypatch):
    """With a healthy probe the device pipeline runs (CPU backend in
    tests) and still produces the exact rows."""
    monkeypatch.setattr(batchmode, "_device_backend", lambda: True)
    monkeypatch.setenv("KM_TPU_BATCH_DEADLINE", "30")
    monkeypatch.delenv("KM_TPU_BATCH_DEVICE", raising=False)

    calls = []

    def healthy():
        calls.append(1)

    targets, table = _load()
    rows = _emit(targets, table, healthy)
    assert calls  # the probe ran
    assert rows == _expected_rows(targets, table)


def test_probe_device_timeout_is_bounded(monkeypatch):
    monkeypatch.setattr(batchmode, "_device_backend", lambda: True)
    t0 = time.perf_counter()
    verdict = batchmode.probe_device(0.1,
                                     lambda: threading.Event().wait())
    assert verdict == "timeout"
    assert time.perf_counter() - t0 < 5


def test_hanging_backend_detection_falls_back(monkeypatch):
    """Backend *detection* itself (import jax / default_backend) hangs
    on a wedged tunnel — the probe must bound it too, not just the
    dispatch (ADVICE r4 #1)."""
    def detect_hangs():
        threading.Event().wait()

    monkeypatch.setattr(batchmode, "_device_backend", detect_hangs)
    monkeypatch.setenv("KM_TPU_BATCH_DEADLINE", "0.2")
    monkeypatch.delenv("KM_TPU_BATCH_DEVICE", raising=False)

    targets, table = _load()
    t0 = time.perf_counter()
    rows = _emit(targets, table, lambda: None)
    assert time.perf_counter() - t0 < 30
    assert rows == _expected_rows(targets, table)


def test_cpu_backend_skips_probe_message(monkeypatch, capsys):
    """A plain CPU backend is not a failure: host path, no 'falling
    back' warning on stderr."""
    monkeypatch.setattr(batchmode, "_device_backend", lambda: False)
    monkeypatch.setenv("KM_TPU_BATCH_DEADLINE", "30")
    monkeypatch.delenv("KM_TPU_BATCH_DEVICE", raising=False)

    targets, table = _load()
    rows = _emit(targets, table, lambda: None)
    assert rows == _expected_rows(targets, table)
    assert "falling back" not in capsys.readouterr().err
