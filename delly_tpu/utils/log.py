"""Timestamped stage logging (reference: boost::posix_time banners,
e.g. shortpe.h:310-311, coral.h:103-104)."""

from __future__ import annotations

import datetime
import sys

# Optional observer called with each banner message before printing —
# benchmarks use it to turn banner-to-banner gaps into a per-stage
# wall-time breakdown without parsing stderr.
hook = None


def stage(msg: str) -> None:
    if hook is not None:
        hook(msg)
    now = datetime.datetime.now().strftime("%Y-%b-%d %H:%M:%S")
    print(f"[{now}] {msg}", file=sys.stderr)
