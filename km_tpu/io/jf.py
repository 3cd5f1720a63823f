"""Native reader for Jellyfish ``.jf`` count-table files.

km reaches these files only through the external C++ ``dna_jellyfish``
bindings (reference: km/utils/Jellyfish.py:24-53). km_tpu decodes the
format directly so existing tables keep working with zero native deps.

On-disk format (verified against the five fixtures in
/root/reference/data/jf):

- bytes 0..8: 9 ASCII digits, the padded JSON header length ``H``
- bytes 9..9+H: a JSON object (possibly followed by padding so that
  ``9+H`` is 8-byte aligned) with at least ``key_len`` (bits; k = key_len/2),
  ``counter_len`` (bytes), ``canonical`` (bool), ``format`` ("binary/sorted")
- records from offset ``9+H``: ``(key_len+63)//64*8`` bytes of little-endian
  2-bit packed k-mer (leftmost base in the highest bit pair) followed by
  ``counter_len`` bytes of little-endian count.

Records are ordered by Jellyfish's internal matrix hash, NOT
lexicographically; callers should re-sort (CountTable does).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np


@dataclass
class JFData:
    """Decoded contents of a .jf file."""

    k: int
    canonical: bool
    keys: np.ndarray  # uint64, packed k-mers, file order
    counts: np.ndarray  # uint32
    header: dict = field(repr=False, default_factory=dict)


def read_header(path: str) -> dict:
    """Parse the JSON header of a .jf file leniently (the declared header
    length includes alignment padding after the JSON object)."""
    with open(path, "rb") as f:
        hlen = int(f.read(9).decode("ascii"))
        raw = f.read(hlen).decode("ascii", errors="ignore")
    obj, _ = json.JSONDecoder().raw_decode(raw)
    obj["_data_offset"] = 9 + hlen
    return obj


def write_jf(path: str, keys: np.ndarray, counts: np.ndarray, k: int,
             canonical: bool, cmdline=None) -> None:
    """Write a ``.jf`` count table (binary/sorted layout).

    Produces the same record layout Jellyfish emits (9-digit ASCII header
    length, JSON header, then 8-byte LE packed key + ``counter_len``-byte
    LE count per record; see module docstring). Records are written in
    ascending key order and the header carries an identity (full-rank,
    square) hashing matrix, i.e. hash(key) == key, so key order IS hash
    order — the format's sorted invariant, and exactly what
    ``read_jf``/``CountTable`` expect. Header fields follow the fixture
    conventions where observable (``size`` a power of two, ``val_len`` in
    bits), but files written here are verified readable only by km-tpu's
    own reader: Jellyfish's C++ query tools derive their binary-search
    geometry from ``size``/``matrix1`` in ways that cannot be validated in
    this environment (no bindings), so cross-tool consumption is not
    claimed. Replaces the persistence side of ``jellyfish count -o``
    (reference: example/run_leucegene.sh:22) for ``km-tpu count`` tables.
    """
    keys = np.asarray(keys, dtype=np.uint64)
    counts = np.asarray(counts, dtype=np.uint64)
    if len(keys) != len(counts):
        raise ValueError("keys and counts must have equal length")
    if k > 32:
        raise ValueError(f"k={k} > 32 not supported by the 64-bit key path")
    order = np.argsort(keys, kind="stable")
    keys, counts = keys[order], counts[order]

    counter_len = 4
    maxc = int(counts.max()) if len(counts) else 0
    while maxc >= 1 << (8 * counter_len):
        counter_len += 1
    val_len = max(1, maxc.bit_length())  # in bits, like jellyfish's -c
    key_len = 2 * k
    # hash-table size: a power of two, like jellyfish sizes its hash
    size = 1 << max(1, (2 * max(len(keys), 1) - 1).bit_length())
    # identity GF(2) matrix: column i selects bit i (little-endian column
    # vectors, one uint64 per column as jellyfish serializes r<=64 rows)
    ident = {"c": key_len, "r": key_len,
             "columns": [1 << (key_len - 1 - i) for i in range(key_len)]}
    header = {
        "alignment": 8,
        "canonical": bool(canonical),
        "cmdline": list(cmdline) if cmdline else ["km-tpu", "count"],
        "counter_len": counter_len,
        "format": "binary/sorted",
        "key_len": key_len,
        "matrix1": ident,
        "max_reprobe": 0,
        "reprobes": [0],
        "size": size,
        "val_len": val_len,
    }
    blob = json.dumps(header, sort_keys=True).encode("ascii")
    # pad the declared header length so data starts 8-byte aligned
    hlen = -(-(len(blob) + 9) // 8) * 8 - 9
    pad = hlen - len(blob)

    n = len(keys)
    rec = 8 + counter_len
    raw = np.zeros((n, rec), dtype=np.uint8)
    raw[:, :8] = keys.view(np.uint8).reshape(n, 8)
    for b in range(counter_len):
        raw[:, 8 + b] = ((counts >> np.uint64(8 * b))
                         & np.uint64(0xFF)).astype(np.uint8)

    with open(path, "wb") as f:
        f.write(b"%09d" % hlen)
        f.write(blob)
        f.write(b" " * pad)
        f.write(raw.tobytes())


def read_jf(path: str) -> JFData:
    """Decode all records of a .jf file into packed-key/count arrays."""
    header = read_header(path)
    if header.get("format") != "binary/sorted":
        raise ValueError(
            f"{path}: unsupported .jf format {header.get('format')!r} "
            "(only binary/sorted is supported)"
        )
    key_len = int(header["key_len"])  # bits
    counter_len = int(header["counter_len"])  # bytes
    k = key_len // 2
    if k > 32:
        raise ValueError(f"{path}: k={k} > 32 not supported by the 64-bit key path")
    key_bytes = (key_len + 63) // 64 * 8
    rec = key_bytes + counter_len
    offset = header.pop("_data_offset")

    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read()
    n = len(data) // rec
    if n * rec != len(data):
        raise ValueError(f"{path}: trailing {len(data) - n * rec} bytes after {n} records")

    raw = np.frombuffer(data[: n * rec], dtype=np.uint8).reshape(n, rec)
    # key: little-endian uint64 (key_bytes == 8 for all k <= 32)
    keys = raw[:, :8].copy().view("<u8").reshape(n)
    counts = np.zeros(n, dtype=np.uint64)
    for b in range(counter_len):
        counts |= raw[:, key_bytes + b].astype(np.uint64) << np.uint64(8 * b)
    if counter_len <= 4 or (len(counts) and counts.max() < 1 << 32):
        counts = counts.astype(np.uint32)

    return JFData(k=k, canonical=bool(header["canonical"]), keys=keys,
                  counts=counts, header=header)
