"""km_tpu command-line interface.

Subcommands mirror km's (find_mutation, find_report, linear_kmin,
min_cov; reference: km/km.py:17-67) plus ``count`` — the on-device FASTQ
k-mer counter that replaces the external ``jellyfish count`` step — and
``cohort`` — samples x targets across the device mesh / pod slice,
replacing the reference's per-sample shell loop
(reference: example/run_leucegene.sh:29-35).
"""

from __future__ import annotations

import argparse
import sys

from .argparsing import schemas


def main(argv=None):
    parser = argparse.ArgumentParser(prog="km-tpu")
    subparsers = parser.add_subparsers(help="sub-command help")

    sub = subparsers.add_parser(
        "find_mutation",
        help="Identify and quantify mutations from a target sequence and "
             "a k-mer count table.")
    from .tools.find_mutation import main_find_mut
    sub.set_defaults(func=main_find_mut)
    schemas.add_find_mutation_args(sub)

    sub = subparsers.add_parser(
        "find_report",
        help="Parse find_mutation output and reformat it in a more "
             "user-friendly tabulated file.")
    from .tools.find_report import main_find_report
    sub.set_defaults(func=main_find_report)
    schemas.add_find_report_args(sub)

    sub = subparsers.add_parser(
        "linear_kmin",
        help="Find min k-length to decompose a target sequence in a "
             "linear graph.")
    from .tools.linear_kmin import main_linear_kmin
    sub.set_defaults(func=main_linear_kmin)
    schemas.add_linear_kmin_args(sub)

    sub = subparsers.add_parser(
        "min_cov", help="Compute coverage of target sequences.")
    from .tools.min_cov import main_min_cov
    sub.set_defaults(func=main_min_cov)
    schemas.add_min_cov_args(sub)

    sub = subparsers.add_parser(
        "count",
        help="Count k-mers of FASTQ/FASTA reads into a native table "
             "(replaces jellyfish count).")
    from .tools.count import main_count
    sub.set_defaults(func=main_count)
    schemas.add_count_args(sub)

    sub = subparsers.add_parser(
        "cohort",
        help="Run every target against every sample across the device "
             "mesh / pod slice (replaces the per-sample shell loop of "
             "the reference cohort recipe).")
    from .tools.cohort import main_cohort
    sub.set_defaults(func=main_cohort)
    schemas.add_cohort_args(sub)

    if argv is None:
        argv = sys.argv[1:]
    if not argv:
        parser.print_help(sys.stderr)
        sys.exit(1)

    from .utils import jaxcache

    jaxcache.enable()  # kernel compiles persist across CLI invocations
    args = parser.parse_args(argv)
    args.func(args, parser)


if __name__ == "__main__":
    main()
