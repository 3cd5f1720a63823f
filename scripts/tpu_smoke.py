"""TPU smoke check: run the batched device pipeline over the whole
GRCh38 catalog on the real chip, diff the rows against sequential host
mode, and append a one-line result to SMOKE_TPU.txt (committed so
TPU-correctness evidence doesn't depend on the bench alone —
VERDICT r3 ask #6).

Usage: python scripts/tpu_smoke.py  (from the repo root; needs the
device tunnel. Exit code 0 iff every row matches.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from km_tpu.utils.jaxcache import enable  # noqa: E402

enable()


def main():
    import jax

    from km_tpu.io.fasta import read_target
    from km_tpu.models.batch import run_catalog
    from km_tpu.models.sequence import TargetSeq
    from km_tpu.models.table import CountTable
    from km_tpu.ops.device_table import DeviceCountTable

    backend = jax.default_backend()
    from km_tpu.refdata import catalog_dir, jf_path

    cat = catalog_dir("GRCh38")
    jfs = ["02H025_NPM1", "03H116_ITD", "03H112_IandI",
           "05H094_FLT3-TKD_del", "02H033_DNMT3A_sub"]

    t_all = time.time()
    n_rows = 0
    mismatches = []
    for jf in jfs:
        host = CountTable.from_jf(jf_path(jf))
        targets = []
        for fn in sorted(os.listdir(cat)):
            seqs, _ = read_target(os.path.join(cat, fn))
            targets.append(TargetSeq("".join(seqs),
                                     os.path.splitext(fn)[0], host.k))
        host_rows = run_catalog(targets, host, walk="host")
        dev = DeviceCountTable.from_host(host)
        dev_rows = run_catalog(targets, dev, walk="device")
        for t, hr, dr in zip(targets, host_rows, dev_rows):
            n_rows += len(hr)
            if [str(r) for r in hr] != [str(r) for r in dr]:
                mismatches.append((jf, t.name))
    dt = time.time() - t_all

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    if mismatches:
        line = (f"{stamp} FAIL backend={backend} "
                f"mismatches={mismatches}")
    else:
        line = (f"{stamp} OK backend={backend} samples={len(jfs)} "
                f"targets=9 rows={n_rows} device==host {dt:.1f}s")
    print(line)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SMOKE_TPU.txt")
    with open(out, "a") as f:
        f.write(line + "\n")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
