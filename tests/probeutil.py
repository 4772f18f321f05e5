"""Shared compile cache for the differential-oracle probes.

Every oracle fixture compiles a reference-consuming probe with g++
(~5-15s each); across ~10 probes that is most of the suite's fixed
cost. The binaries only change when the probe source, the generated
slices, the shims or the reference tree change, so cache them keyed by
content hash under ~/.cache/delly_tpu/probes.
"""

import hashlib
import os
import shutil
import subprocess

_SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")
_SALT = b"probe-cache-v1"


def _tree_digest(h, root):
    for base, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            p = os.path.join(base, f)
            h.update(p.replace(root, "").encode())
            with open(p, "rb") as fh:
                h.update(fh.read())


def cached_probe(compile_args, key_files=(), shim_dir=_SHIM_DIR):
    """Return the path of the compiled probe for `compile_args` (a g++
    argv WITHOUT -o), reusing a cached binary when the probe source,
    slice files and the shim tree are unchanged. The reference tree is
    read-only in this environment and enters the key via its lazily
    included headers' paths only."""
    h = hashlib.sha256(_SALT)
    for a in compile_args:
        if os.path.isfile(a):
            with open(a, "rb") as fh:
                h.update(fh.read())
        elif os.path.isdir(a):
            # generated-slice include dirs (tmp paths vary per run but
            # their contents are what the binary depends on); the
            # read-only reference tree hashes fast enough to include
            _tree_digest(h, a)
        else:
            h.update(a.encode())
    for p in key_files:
        with open(p, "rb") as fh:
            h.update(fh.read())
    # the probes quote-include the shared replay layers from tests/
    # (probe_common/probe_replay/vcf_text_replay); an edit there must
    # invalidate every cached binary
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    for f in sorted(os.listdir(tests_dir)):
        if f.endswith(".hpp"):
            with open(os.path.join(tests_dir, f), "rb") as fh:
                h.update(fh.read())
    if shim_dir not in compile_args:
        _tree_digest(h, shim_dir)
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "delly_tpu", "probes")
    os.makedirs(cache, exist_ok=True)
    exe = os.path.join(cache, h.hexdigest()[:20])
    if os.path.exists(exe):
        return exe
    tmp = exe + f".tmp{os.getpid()}"
    subprocess.run(list(compile_args) + ["-o", tmp], check=True,
                   capture_output=True)
    os.replace(tmp, exe)
    return exe
