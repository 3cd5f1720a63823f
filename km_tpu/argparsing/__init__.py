"""Argument schemas for the km_tpu CLI subcommands. Flags, defaults and
help mirror km's (reference: km/argparser/*.py) so scripts and pipelines
port unchanged; km_tpu-specific tools (count) add their own."""
