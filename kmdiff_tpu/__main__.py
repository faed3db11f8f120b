import sys

from kmdiff_tpu.cli import main

sys.exit(main())
