#!/usr/bin/env python
"""Stall watchdog for TPU runs: kill-on-silence + retry (the axon tunnel
sometimes hangs hard — see clip_dplm_tpu/utils/watchdog.py for semantics).

    python scripts/tpu_watchdog.py -t 300 -r 2 -- python bench.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_dplm_tpu.utils.watchdog import main

if __name__ == "__main__":
    sys.exit(main())
