"""``python -m km_tpu`` entry point."""

from .cli import main

main()
