"""Source-level guards against TPU runtime traps measured in rounds
4-5 (docs/NEXT.md): patterns that compile fine and run orders of
magnitude slower than they look.

- non-power-of-two integer modulo on device vectors: TPU has no
  hardware integer division; a 16M-element `% 9973` measured ~4x the
  whole counting kernel (scripts/scale_count.py history).
- jax.random inside device kernels' hot paths: threefry synthesis of a
  16M chunk measured ~10x the counting kernel; hot code derives
  variation from hashes/rolls instead.

These are grep-grade checks on the kernel modules, deliberately dumb:
they catch reintroductions, and a legitimate future exception can
carry a `# tpu-trap-ok` marker on the line.
"""

import os
import re

OPS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "km_tpu", "ops")
SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def _sources():
    for root in (OPS, SCRIPTS):
        for fn in sorted(os.listdir(root)):
            if fn.endswith(".py"):
                path = os.path.join(root, fn)
                yield path, open(path).read()


def test_no_nonpow2_integer_modulo_in_kernels():
    pat = re.compile(r"%\s*(?:jnp\.\w+\()?(\d+)")
    bad = []
    for path, src in _sources():
        for i, line in enumerate(src.splitlines(), 1):
            if "tpu-trap-ok" in line or line.lstrip().startswith("#"):
                continue
            # only flag modulo on device-ish expressions (jnp/lax names
            # on the line); host numpy math is fine
            if "jnp." not in line and "lax." not in line:
                continue
            for m in pat.finditer(line):
                n = int(m.group(1))
                if n > 1 and (n & (n - 1)) != 0:
                    bad.append(f"{path}:{i}: {line.strip()}")
    assert not bad, "non-pow2 integer modulo on device values:\n" + \
        "\n".join(bad)


def test_no_jax_random_in_device_kernels():
    bad = []
    for path, src in _sources():
        if os.path.basename(path) == "scale_count.py" or \
                path.startswith(OPS):
            for i, line in enumerate(src.splitlines(), 1):
                if "tpu-trap-ok" in line or \
                        line.lstrip().startswith("#"):
                    continue
                if "jax.random." in line:
                    bad.append(f"{path}:{i}: {line.strip()}")
    assert not bad, "jax.random in a kernel hot path:\n" + "\n".join(bad)
