"""`python -m crisperwhisper_tpu` == the CLI transcriber."""

import sys

from .cli import main

sys.exit(main())
