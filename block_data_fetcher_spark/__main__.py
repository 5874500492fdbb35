"""`python -m block_data_fetcher_spark` — the reference binary's
invocation surface on Spark."""

import sys

from .cli import main

sys.exit(main())
