#!/usr/bin/env python3
"""CLI shim for the stall watchdog (``unet_bssfp_tpu.utils.watchdog``).

Supervise a training command and restart it from its last checkpoint when
the filesystem heartbeat (the run's ``logs/`` dir — ``metrics.csv`` is
rewritten every epoch) goes quiet, e.g. after a tunnel/device wedge.

    python scripts/train_watchdog.py --stall-seconds 900 \
        --heartbeat /tmp/run/logs -- \
        python scripts/quality_record.py --resume auto --workdir /tmp/run
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_bssfp_tpu.utils.watchdog import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
