"""find_report: reshape find_mutation rows into genome-coordinate
reports (16-column TSV, VCF 4.1, or per-sample pivot table).

Byte-compatible with km (reference: km/tools/find_report.py:7-336):
coordinates map through the per-base genomic position list derived from
the target FASTA exon headers (strand-aware); insertions/deletions are
canonicalized by recursive extremity extension over repeats; small
insertions re-classify as ITD (exact upstream match >= 3 bp) or I&I
(> 50% upstream match).
"""

from __future__ import annotations

import re
import sys

from ..io.fasta import iter_fasta, parse_header_attrs
from .find_mutation import load_table

_REPORT_COLUMNS = [
    "Sample", "Region", "Location", "Type", "Removed", "Added", "Abnormal",
    "Normal", "rVAF", "Min_coverage", "Exclu_min_cov", "Variant", "Target",
    "Info", "Variant_sequence", "Reference_sequence",
]

_COMPLEMENT = str.maketrans("ATGCU", "TACGA")


def _emit(fields):
    sys.stdout.write("\t".join(fields) + "\n")


def _vcf_header():
    sys.stdout.write(
        "##fileformat=VCFv4.1\n"
        "##INFO=<ID=TYPE,Number=A,Type=String,Description="
        '"The type of variant, either Insertion, ITD, I&I, Deletion, '
        'Substitution or Indel.">\n'
        "##INFO=<ID=TARGET,Number=A,Type=String,Description="
        '"Name of the sequencing that contains the mutation.">\n'
        '##INFO=<ID=RATIO,Number=A,Type=String,Description="Ratio of '
        'mutation to reference.">\n'
        "##INFO=<ID=MINCOV,Number=A,Type=String,Description="
        '"Minimum k-mer coverage of alternative allele.">\n'
        '##INFO=<ID=REMOVED,Number=A,Type=String,Description="Number of '
        'removed bases.">\n'
        '##INFO=<ID=ADDED,Number=A,Type=String,Description="Number of '
        'added bases.">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    )


def _emit_vcf(chro, loc, ref_var, alt_var, type_var, target, ratio,
              min_cov, removed, added):
    _emit([chro, str(loc), ".", ref_var, alt_var, ".", ".",
           "TYPE=" + type_var + ";TARGET=" + target + ";RATIO=" + ratio +
           ";MINCOV=" + min_cov + ";REMOVED=" + str(removed) +
           ";ADDED=" + str(added)])


def load_target_coords(target_path):
    """Per-base 1-based genomic coordinates of the concatenated target,
    from the ``chr:start-stop`` locations in the FASTA headers; '-'-strand
    exons contribute their positions in reverse."""
    if not target_path:
        sys.exit("ERROR: Target file is empty\n")
    nts: list[int] = []
    chro = None
    strand = None
    for header, _seq in iter_fasta(target_path):
        loc_token = header.split(" ")[0]
        if ":" not in loc_token or "-" not in loc_token:
            sys.exit("ERROR: Fasta entries do not contain a correctly "
                     "formatted location: {}\n".format(loc_token))
        attr = parse_header_attrs(header)
        chro, pos = attr["location"].split(":")
        refstart, refstop = pos.split("-")
        if "strand" not in attr:
            attr["strand"] = "+"
            sys.stderr.write("WARNING: Strand is assumed to be '+' \n")
        strand = attr["strand"]
        nt = list(range(int(refstart), int(refstop) + 1))
        if strand == "-":
            nt.reverse()
        nts.extend(nt)
    return nts, chro, strand


def _extend_left(var: str, p: int, rs: str) -> int:
    """Slide a variant leftwards through repeated context; returns the
    0-based position just left of the leftmost placement (km's recursive
    get_extremities, km/tools/find_report.py:84-88, iteratively)."""
    while p - 1 > 0 and rs[p - 1] == var[-1]:
        var = rs[p - 1] + var[:-1]
        p -= 1
    return p - 1


class _Row:
    """Parsed columns of one find_mutation line."""

    def __init__(self, tok):
        self.samp = tok[0]
        self.query = tok[1]
        self.type_ = tok[2]
        self.pos_str = tok[3]
        self.ratio = tok[4]
        self.alt_exp = tok[5]
        self.min_cov = tok[6]
        self.start_off = tok[7]
        self.alt_seq = tok[8]
        self.ref_exp = tok[9]
        self.ref_seq_raw = tok[10]
        self.info = tok[11]


def create_report(args):
    if args.format == "vcf" and args.info == "cluster":
        sys.exit("ERROR: -f vcf and -i cluster options are incompatible")

    vcf = args.format == "vcf"
    table_mode = args.format == "table"
    variants: dict = {}
    samples: dict = {}
    data: dict = {}

    nts, chro, strand = load_target_coords(args.target)

    exclu_table = None
    if args.exclu != "":
        exclu_table = load_table(args.exclu)

    if vcf:
        _vcf_header()
    elif not table_mode:
        _emit(_REPORT_COLUMNS)

    for line in args.infile:
        if line[0] == "#":
            continue
        tok = line.strip("\n").split("\t")
        if not re.search(args.info, line) or tok[0] == "Database" or len(tok) <= 1:
            continue
        row = _Row(tok)
        ref_seq = row.ref_seq_raw.upper()

        min_exclu = ""
        if exclu_table is not None and row.alt_seq != "":
            min_exclu = str(int(exclu_table.cover(row.alt_seq).min()))

        if int(row.min_cov) < args.min_cov:
            continue

        region = ""
        location = ""
        mod = ""
        insert_type = row.type_
        removed = added = "0"
        loc_var = end_var = 0
        ref_var = alt_var = ""

        if row.type_ == "Reference":
            if strand == "-":
                region = "{}:{}-{}".format(chro, nts[-1], nts[0])
            else:
                region = "{}:{}-{}".format(chro, nts[0], nts[-1])
            if not vcf and not table_mode:
                _emit([row.samp, region, "-", row.type_, "0", "0", "0.0",
                       row.alt_exp, row.ratio, row.min_cov, min_exclu, "-",
                       row.query, tok[-1], "", ""])
                continue
            elif vcf:
                continue
        else:
            start, mod, stop = row.pos_str.split(":")
            delet, insert = mod.split("/")
            added = str(len(insert))
            removed = str(len(delet))

            # 0-based window on the (possibly clipped) target
            pos = int(start) - 1 - int(row.start_off)
            end = int(stop) - 2 - int(row.start_off)

            if strand == "+":
                start_pos, end_pos = nts[pos], nts[end]
            else:
                start_pos, end_pos = nts[end], nts[pos]
            region = "{}:{}-{}".format(chro, start_pos, end_pos + 1)

            ref_var = delet.upper()
            alt_var = insert.upper()
            loc_var = start_pos
            end_var = end_pos

            if len(delet) == 0 and len(insert) != 0:
                # pure insertion: region ends at the next base
                if strand == "+":
                    start_pos, end_pos = nts[pos], nts[end + 1]
                else:
                    start_pos, end_pos = nts[end + 1], nts[pos]
                region = "{}:{}-{}".format(chro, start_pos, end_pos + 1)

                var = insert.upper()
                ibef = _extend_left(var, pos, ref_seq)
                before = ref_seq[ibef:pos]
                iaft = _extend_left(var[::-1], len(ref_seq) - pos,
                                    ref_seq[::-1])
                after = ref_seq[::-1][iaft:len(ref_seq) - pos][::-1]
                iaft = len(ref_seq) - iaft - 1
                ref_var = before + after
                alt_var = before + var + after
                loc_var = nts[iaft] if strand == "-" else nts[ibef]
                end_var = (nts[iaft - len(ref_var) + 1] if strand == "-"
                           else nts[ibef + len(ref_var) - 1])

                if loc_var + len(ref_var) - 1 != end_var and vcf:
                    sys.stderr.write("NOTE: Mutation overlaps 2 exons or "
                                     "more, VCF output is disabled \n")
                    continue

                # ITD / I&I reinterpretation against the upstream context
                upstream = row.alt_seq[pos - len(insert):pos]
                match = 0
                if pos - len(insert) >= 0:
                    for i in range(len(insert)):
                        if insert[i] == upstream[i]:
                            match += 1
                    match = float(match) / len(insert)

                insert_type = "Insertion"
                if (pos - len(insert) >= 0 and len(insert) >= 3
                        and insert == upstream):
                    insert_type = "ITD"
                    added += " | " + str(end_pos - start_pos + 1)
                elif (pos - len(insert) >= 0 and len(insert) >= 3
                        and match > 0.5):
                    insert_type = "I&I"
                    added += " | " + str(end_pos - start_pos + 1)

                location = chro + ":" + str(end_pos)

            elif row.type_ == "Deletion":
                region = "{}:{}-{}".format(chro, start_pos, end_pos + 1)
                location = ""
                insert_type = row.type_

                var = delet.upper()
                ibef = _extend_left(var, pos, ref_seq)
                before = ref_seq[ibef:pos]
                iaft = _extend_left(var[::-1],
                                    len(ref_seq) - pos - 1 - len(var) + 1,
                                    ref_seq[::-1])
                after = ref_seq[::-1][iaft:len(ref_seq) - pos - 1 -
                                      len(var) + 1][::-1]
                iaft = len(ref_seq) - iaft - 1
                ref_var = before + var + after
                alt_var = before + after
                loc_var = nts[iaft] if strand == "-" else nts[ibef]
                end_var = (nts[iaft - len(ref_var) + 1] if strand == "-"
                           else nts[ibef + len(ref_var) - 1])

                if loc_var + len(ref_var) - 1 != end_var and vcf:
                    continue

            elif row.type_ == "Substitution":
                location = chro + ":" + str(start_pos)
                insert_type = row.type_
                if loc_var + len(ref_var) - 1 != end_var and vcf:
                    sys.stderr.write("NOTE: Mutation overlaps 2 exons or "
                                     "more, VCF output is disabled \n")
                    continue

            elif row.type_ == "Indel":
                location = chro + ":" + str(end_pos)
                insert_type = row.type_
                ref_var = ref_seq[pos - 1] + delet.upper() + ref_seq[end + 1]
                alt_var = ref_seq[pos - 1] + insert.upper() + ref_seq[end + 1]
                loc_var = start_pos - 1
                end_var = end_pos + 1
                if loc_var + len(ref_var) - 1 != end_var and vcf:
                    sys.stderr.write("NOTE: Mutation overlaps 2 exons or "
                                     "more, VCF output is disabled \n")
                    continue

            else:
                sys.stderr.write("WARNING: This variant isn't taken account\n")
                sys.stderr.write(" - variant: " + str(row.type_) + "\n")
                sys.stderr.write(" - line: " + line)
                sys.exit()

        if not vcf and not table_mode:
            _emit([row.samp, region, location, insert_type, removed, added,
                   row.alt_exp, row.ref_exp, row.ratio, row.min_cov,
                   min_exclu, mod, row.query, row.info, row.alt_seq,
                   row.ref_seq_raw])
        elif vcf:
            if strand == "-":
                ref_var = ref_var.translate(_COMPLEMENT)[::-1]
                alt_var = alt_var.translate(_COMPLEMENT)[::-1]
            _emit_vcf(chro, loc_var, ref_var, alt_var, insert_type,
                      row.query, row.ratio, row.min_cov, removed,
                      added.replace(" ", ""))
        elif table_mode:
            var_name = (row.type_ + "/" + row.query
                        if "/" not in row.type_ else row.type_)
            region_mod = region + ":" + mod if mod else region
            var = (var_name, region_mod)
            variants[var] = variants.get(var, 0) + 1
            samples.setdefault(row.samp, set()).add(var)
            data.setdefault(row.samp, {})[var] = float(row.ratio)

    if table_mode:
        sorted_variants = sorted(variants, key=variants.get, reverse=True)
        sys.stdout.write("Sample")
        for v in sorted_variants:
            if v[0].split("/")[0] == "Reference":
                sys.stdout.write("\t" + v[0])
            else:
                sys.stdout.write("\t" + v[1])
        sys.stdout.write("\n")
        for s, sv in samples.items():
            sys.stdout.write(s)
            for v in sorted_variants:
                if v in sv:
                    if "Reference" not in v[0] and (not data[s][v]):
                        sys.stdout.write("\t.")
                    else:
                        sys.stdout.write("\t" + str(data[s][v]))
                else:
                    sys.stdout.write("\t.")
            sys.stdout.write("\n")


def main_find_report(args, argparser):
    if args.infile.isatty() or args.target is None:
        argparser.print_help()
        sys.exit()
    create_report(args)
