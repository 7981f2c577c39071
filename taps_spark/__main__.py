"""`python -m taps_spark` entry point (reference bin/taps)."""

from taps_spark.cli import main

raise SystemExit(main())
