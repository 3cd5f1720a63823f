"""Patiently compile-and-cache every device program class the standard
workloads use, with no deadlines (first run on a fresh machine/link;
minutes per program through a remote-compile tunnel). After this, CLI
runs and bench stages start warm: the 400-target device pipeline cold
in ~7 s, warm <1 s (docs/COLDSTART.md).

Usage: python scripts/warm_cache.py [--quick]
  --quick skips the 4000-target size classes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from km_tpu.utils.jaxcache import enable  # noqa: E402

enable()


def _log(msg):
    print("[warm %s] %s" % (time.strftime("%H:%M:%S"), msg), flush=True)


def main():
    quick = "--quick" in sys.argv
    import bench as B

    _log("counting kernel (2^24 chunk)")
    B.stage_counting(iters=4)
    _log("device pipeline, 400-target classes")
    B.stage_devwalk()
    _log("e2e compact counting kernel")
    B.stage_e2e()
    if not quick:
        _log("device pipeline, 4000-target classes")
        B.stage_scale()
    _log("done — cache at %s" % os.environ.get(
        "KM_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/km_tpu_xla")))


if __name__ == "__main__":
    main()
