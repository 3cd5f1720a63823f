"""Shared test utilities: run the tool mains with captured stdout/stderr."""

from __future__ import annotations

import contextlib
import io
import os
from argparse import Namespace

from km_tpu.refdata import DATA_DIR as REFDATA  # noqa: E402  (env-overridable)


def run_tool(main, args: Namespace) -> tuple[str, str]:
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        main(args, None)
    return out.getvalue(), err.getvalue()


def find_mutation_args(target: str, jf: str, **overrides) -> Namespace:
    # field order matters: the arg-echo block must produce the same number
    # of '#' lines as km's tests so absolute line indices line up
    ns = dict(count=5, graphical=False, jellyfish_fn=jf, ratio=0.05,
              steps=500, branchs=10, nodes=10000, target_fn=[target],
              verbose=False, debug=False)
    ns.update(overrides)
    return Namespace(**ns)


def find_report_args(target: str, infile, **overrides) -> Namespace:
    ns = dict(target=target, infile=infile, info="vs_ref", min_cov=1,
              exclu="", format=None)
    ns.update(overrides)
    return Namespace(**ns)
