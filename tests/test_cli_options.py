"""CLI option-surface parity against the reference's program_options.

Extracts every option declaration ("long,short", ..., default_value(X))
from the reference subcommand headers and asserts the delly_tpu argparse
parsers expose the same long names, short flags, and defaults
(delly.h:205-253, tegua.h:215-278, coral.h:445-512, asmode.h,
merge.h:1879-1936, filter.h:1019-1077)."""

import argparse
import os
import re

import pytest

from delly_tpu import cli

REF_SRC = "/root/reference/src"
REFS = {"sr": "delly.h", "lr": "tegua.h", "cnv": "coral.h",
        "asm": "asmode.h", "merge": "merge.h", "filter": "filter.h"}
# help has no argparse equivalent short (-? is not valid), and the
# positional/license/warranty entries are top-level dispatch concerns
SKIP = {"help", "input-file", "license", "warranty"}
OPT_RE = re.compile(r'^\s*\("([a-z0-9?-]+?)(?:,([a-zA-Z?]))?"\s*,(.*)')
DEFAULT_RE = re.compile(r'default_value\(([^),]*)\)')


def _subparsers():
    parser = argparse.ArgumentParser(prog="delly-tpu")
    sub = parser.add_subparsers(dest="command")
    cli._add_sr(sub)
    cli._add_lr(sub)
    cli._add_cnv(sub)
    cli._add_asm(sub)
    cli._add_merge(sub)
    cli._add_filter(sub)
    return next(a.choices for a in parser._actions
                if isinstance(a, argparse._SubParsersAction))


@pytest.mark.skipif(not os.path.isdir(REF_SRC),
                    reason="reference sources unavailable")
@pytest.mark.parametrize("subcmd", sorted(REFS))
def test_option_surface_matches_reference(subcmd):
    sp = _subparsers()[subcmd]
    opts = {}
    for action in sp._actions:
        for s in action.option_strings:
            opts[s] = action
    seen = set()
    problems = []
    with open(os.path.join(REF_SRC, REFS[subcmd])) as fh:
        for line in fh:
            m = OPT_RE.match(line)
            if not m:
                continue
            name, short, rest = m.groups()
            if name in SKIP or name in seen:
                continue
            seen.add(name)
            if f"--{name}" not in opts:
                problems.append(f"--{name} missing")
                continue
            action = opts[f"--{name}"]
            if short and short != "?" \
                    and f"-{short}" not in action.option_strings:
                problems.append(f"--{name}: short -{short} missing")
            dm = DEFAULT_RE.search(rest)
            if dm and action.default is not None:
                refd = dm.group(1).strip().strip('"')
                try:
                    if abs(float(refd) - float(action.default)) > 1e-9:
                        problems.append(
                            f"--{name}: default {action.default} != {refd}")
                except (ValueError, TypeError):
                    if refd not in ("", "-") and str(action.default) != refd:
                        problems.append(
                            f"--{name}: default {action.default!r} != {refd!r}")
    assert seen, "no options extracted from the reference header"
    assert not problems, "; ".join(problems)
