#!/usr/bin/env python
"""Performance regression gate (reference tools/check_performance.py:9-40).

Re-runs the benchmark suite against the best-known history in
``benchmarks/results.json`` without updating it; exits nonzero when any
case is slower than ``--threshold`` (default 1.5x) its recorded best.

    python tools/check_performance.py [--threshold 1.5] [names...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from suite import main as suite_main  # noqa: E402


if __name__ == "__main__":
    raise SystemExit(suite_main(["--check", "--no-update", *sys.argv[1:]]))
