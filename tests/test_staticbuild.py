"""Static-build packaging contract (Dockerfile.staticbuild): the
prebuilt native library must serve a toolchain-less runtime — no g++
anywhere on PATH — without falling back to the pure-Python codecs, and
the CLI engines must run end-to-end in that environment."""

import os
import shutil
import subprocess
import sys

import pytest

EXAMPLE = "/root/reference/example"


def _no_gxx_env(tmp_path):
    """A PATH with python but no compiler (the staticbuild runtime)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for tool in ("python3", "python"):
        p = shutil.which(tool)
        if p:
            os.symlink(p, bindir / tool)
    env = dict(os.environ)
    env["PATH"] = str(bindir)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def prebuilt():
    """Prebuild both CPU variants exactly as the build stage does."""
    if shutil.which("g++") is None:
        pytest.skip("needs g++ to prebuild")
    for arch in ("baseline", "v3"):
        env = dict(os.environ)
        env["DELLY_TPU_NATIVE_ARCH"] = arch
        r = subprocess.run(
            [sys.executable, "-c",
             "from delly_tpu import native; assert native.get_lib()"],
            env=env, capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-800:]


def test_prebuilt_native_loads_without_toolchain(prebuilt, tmp_path):
    env = _no_gxx_env(tmp_path)
    r = subprocess.run(
        [sys.executable, "-c",
         "import shutil; assert shutil.which('g++') is None; "
         "from delly_tpu import native; "
         "assert native.get_lib() is not None"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]


def test_sr_engine_runs_without_toolchain(prebuilt, tmp_path):
    if not os.path.isdir(EXAMPLE):
        pytest.skip("example data unavailable")
    env = _no_gxx_env(tmp_path)
    out = str(tmp_path / "sr.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "sr",
         "-g", f"{EXAMPLE}/ref.fa", "-o", out, f"{EXAMPLE}/sr.bam"],
        env=env, capture_output=True, text=True, timeout=590)
    assert r.returncode == 0, r.stderr[-1500:]
    body = [ln for ln in open(out) if not ln.startswith("#")]
    assert len(body) == 1 and "SVTYPE=DEL" in body[0]
    # the run must have used the prebuilt native plane, not the
    # pure-Python fallback (the fallback prints a one-line warning)
    assert "native hostio build failed" not in r.stderr
