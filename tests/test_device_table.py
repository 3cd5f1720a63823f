"""Device table lookups and child expansion must agree with the host
(numpy) table on every fixture, under both orientations."""

import numpy as np
import pytest

from km_tpu.models.table import CountTable
from km_tpu.ops import encode
from km_tpu.ops.device_table import DeviceCountTable

from helpers import REFDATA

FIXTURES = ["02H025_NPM1", "02H033_DNMT3A_sub", "03H112_IandI",
            "03H116_ITD", "05H094_FLT3-TKD_del"]


@pytest.mark.parametrize("name", FIXTURES)
def test_lookup_matches_host(name):
    host = CountTable.from_jf(f"{REFDATA}/jf/{name}.jf")
    dev = DeviceCountTable.from_host(host)

    rng = np.random.default_rng(1)
    # mix of present keys (both orientations) and random absent keys
    present = host.keys[rng.integers(0, len(host.keys), 200)]
    flipped = encode.revcomp(present, host.k)
    absent = rng.integers(0, 1 << 62, 200, dtype=np.uint64)
    queries = np.concatenate([present, flipped, absent])

    assert (dev.query_packed(queries) == host.query_packed(queries)).all()


def test_children_match_host():
    host = CountTable.from_jf(f"{REFDATA}/jf/02H025_NPM1.jf")
    dev = DeviceCountTable.from_host(host)
    rng = np.random.default_rng(2)
    parents = host.keys[rng.integers(0, len(host.keys), 100)]

    from km_tpu.ops.device_table import split_keys
    import jax.numpy as jnp

    hi, lo = split_keys(parents)
    chi, clo, cnt, mask = dev.children(jnp.asarray(hi), jnp.asarray(lo),
                                       ratio=0.05, n_cutoff=5)
    chi, clo = np.asarray(chi), np.asarray(clo)
    cnt, mask = np.asarray(cnt), np.asarray(mask)

    for i, p in enumerate(parents):
        expect = host.get_child_keys(int(p), cutoff=0.05, n_cutoff=5)
        child_keys = (chi[i].astype(np.uint64) << np.uint64(32)) \
            | clo[i].astype(np.uint64)
        got = [int(child_keys[j]) for j in range(4) if mask[i, j]]
        assert got == expect


def test_children_small_k():
    host = CountTable.from_sequences(["ACGTACGGTTCAACGTT" * 3], k=7,
                                     canonical=True)
    dev = DeviceCountTable.from_host(host)
    from km_tpu.ops.device_table import split_keys
    import jax.numpy as jnp

    parents = host.keys[:10]
    hi, lo = split_keys(parents)
    for fwd in (True, False):
        chi, clo, cnt, mask = dev.children(jnp.asarray(hi), jnp.asarray(lo),
                                           ratio=0.0, n_cutoff=1,
                                           forward=fwd)
        ck = (np.asarray(chi).astype(np.uint64) << np.uint64(32)) \
            | np.asarray(clo).astype(np.uint64)
        ek = (encode.child_keys_forward(parents, 7) if fwd
              else encode.child_keys_backward(parents, 7))
        assert (ck == ek).all()
        assert (np.asarray(cnt) == host.query_packed(ek)).all()
