"""Timestamped stage logging (reference: boost::posix_time banners,
e.g. shortpe.h:310-311, coral.h:103-104)."""

from __future__ import annotations

import datetime
import sys


def stage(msg: str) -> None:
    now = datetime.datetime.now().strftime("%Y-%b-%d %H:%M:%S")
    print(f"[{now}] {msg}", file=sys.stderr)
