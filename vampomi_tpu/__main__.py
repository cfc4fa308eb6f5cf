"""`python -m vampomi_tpu` == `python -m vampomi_tpu.cli`."""

import sys

from .cli import main

sys.exit(main())
