"""Standalone resource monitor binary: scintirete-tpu-monitor.

Capability parity with the reference's cpu-monitor binary
(reference: cmd/cpu-monitor/main.go:13-45): samples process CPU/memory (and
here, TPU HBM) at an interval and prints one line per sample.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from scintirete_tpu.observability.logger import StructuredLogger
from scintirete_tpu.observability.monitor import SystemMonitor


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="scintirete-tpu-monitor")
    parser.add_argument("-i", "--interval", type=float, default=5.0)
    parser.add_argument("-n", "--samples", type=int, default=0, help="0 = forever")
    parser.add_argument("--device", action="store_true", help="sample TPU HBM too")
    args = parser.parse_args(argv)

    logger = StructuredLogger(level="warn", fmt="text")
    monitor = SystemMonitor(
        logger, interval_seconds=args.interval, sample_device=args.device
    )
    count = 0
    try:
        while args.samples == 0 or count < args.samples:
            sample = monitor.sample_once()
            print(json.dumps(sample, default=str), flush=True)
            count += 1
            if args.samples == 0 or count < args.samples:
                time.sleep(args.interval)
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
