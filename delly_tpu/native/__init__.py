"""ctypes bindings for the native host-I/O plane (hostio.cpp).

The shared library is built on demand with g++ (cached next to the
source). All entry points degrade gracefully: callers fall back to the
pure-Python codecs when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostio.cpp")

_lib = None
_load_failed = False


def _arch_flags() -> list:
    """Portable arch selection: AVX2 (x86-64-v3) only when the running
    CPU has it, else a plain -O3 baseline. The choice is part of the
    cache key, so a .so built elsewhere is never loaded on a CPU that
    cannot execute it.

    DELLY_TPU_NATIVE_ARCH overrides the probe: `baseline` / `v3` let a
    container build (Dockerfile.staticbuild) prebuild BOTH variants so
    a compiler-less runtime image loads whichever matches its CPU."""
    forced = os.environ.get("DELLY_TPU_NATIVE_ARCH", "").strip().lower()
    if forced == "baseline":
        return []
    if forced == "v3":
        return ["-march=x86-64-v3"]
    if platform.machine() not in ("x86_64", "AMD64"):
        return []
    try:
        with open("/proc/cpuinfo") as fh:
            cpuinfo = fh.read()
        if " avx2" in cpuinfo or "\tavx2" in cpuinfo or "avx2 " in cpuinfo:
            return ["-march=x86-64-v3"]
    except OSError:
        pass
    return []


def _lib_path() -> str:
    """Cache path keyed by source hash + compile flags: a changed source
    or different CPU generation gets a fresh build, and a read-only
    package install falls back to ~/.cache."""
    with open(_SRC, "rb") as fh:
        key = hashlib.sha256(
            fh.read()
            + (" ".join(_arch_flags()) + " -ffp-contract=off").encode())
    name = f"libhostio-{key.hexdigest()[:12]}.so"
    if os.access(_DIR, os.W_OK):
        return os.path.join(_DIR, name)
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "delly_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, name)


def _prune_stale(lib_path: str) -> None:
    """Drop superseded hash-keyed builds from the cache directory.

    A source edit or flag change produces a new hash, so a long-lived
    install accumulates one .so per historical build; after a
    successful build only the current hash (and, when arch selection is
    forced per-variant, the sibling arch variants of the SAME source)
    are worth keeping. Multi-arch container prebuilds set
    DELLY_TPU_NATIVE_ARCH per pass, so pruning keys on source hash via
    best effort: any libhostio-*.so whose name differs from every
    live-variant path is removed."""
    keep = set()
    env = os.environ.get("DELLY_TPU_NATIVE_ARCH")
    try:
        for forced in (None, "baseline", "v3"):
            if forced is None:
                os.environ.pop("DELLY_TPU_NATIVE_ARCH", None)
            else:
                os.environ["DELLY_TPU_NATIVE_ARCH"] = forced
            keep.add(os.path.basename(_lib_path()))
    finally:
        if env is None:
            os.environ.pop("DELLY_TPU_NATIVE_ARCH", None)
        else:
            os.environ["DELLY_TPU_NATIVE_ARCH"] = env
    d = os.path.dirname(lib_path)
    try:
        for name in os.listdir(d):
            if (name.startswith("libhostio-") and name.endswith(".so")
                    and name not in keep):
                try:
                    os.unlink(os.path.join(d, name))
                except OSError:
                    pass
    except OSError:
        pass


def _build(lib_path: str) -> bool:
    try:
        tmp = lib_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", *_arch_flags(), "-ffp-contract=off",
             "-std=c++17", "-shared",
             "-fPIC", "-pthread", "-o", tmp, _SRC, "-lz"],
            check=True, capture_output=True)
        os.replace(tmp, lib_path)
        _prune_stale(lib_path)
        return True
    except (OSError, subprocess.CalledProcessError) as exc:
        print(f"warning: native hostio build failed ({exc}); "
              f"using pure-Python codecs", file=sys.stderr)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    # any native-IO user benefits from the retained-arena malloc policy
    # (slow fresh-page hosts; see utils/malloc_tuning.py)
    from delly_tpu.utils import malloc_tuning
    malloc_tuning.apply()
    try:
        lib_path = _lib_path()
    except OSError:
        _load_failed = True
        return None
    if not os.path.exists(lib_path):
        if not _build(lib_path):
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        _load_failed = True
        return None
    lib.bgzf_inflate.restype = ctypes.c_longlong
    lib.bgzf_inflate.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    try:
        lib.bgzf_total_out.restype = ctypes.c_longlong
        lib.bgzf_total_out.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.bgzf_inflate_range_into.restype = ctypes.c_longlong
        lib.bgzf_inflate_range_into.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t]
        lib.bgzf_range_out.restype = ctypes.c_longlong
        lib.bgzf_range_out.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t]
        lib.bgzf_inflate_into.restype = ctypes.c_longlong
        lib.bgzf_inflate_into.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_size_t]
    except AttributeError:
        pass  # older cached .so without the into-variant
    lib.bgzf_deflate.restype = ctypes.c_longlong
    lib.bgzf_deflate.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.bam_count.restype = ctypes.c_longlong
    lib.bam_count.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.c_size_t]
    lib.bam_scan.restype = ctypes.c_longlong
    lib.bam_scan.argtypes = ([ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.c_size_t]
                             + [ctypes.c_void_p] * 9 + [ctypes.c_size_t])
    lib.delly_free.restype = None
    lib.delly_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.bam_cigar_stats.restype = None
    lib.bam_cigar_stats.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32] + [ctypes.c_void_p] * 9
    lib.cram_decode_slice.restype = ctypes.c_int64
    lib.cram_decode_slice.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,   # streams
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p,                    # sub matrix
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,   # tag dict
        ctypes.c_int32, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,
        ctypes.c_char_p, ctypes.c_int64,                    # ref
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_char_p,   # rg
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.itf8_decode_stream.restype = ctypes.c_int64
    lib.itf8_decode_stream.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
    lib.rans_decode_c.restype = ctypes.c_int
    lib.rans_decode_c.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_int64]
    try:
        lib.rans_nx16_decode.restype = ctypes.c_int64
        lib.rans_nx16_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.fqz_decode.restype = ctypes.c_int
        lib.fqz_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int64]
        lib.arith_decode_bytes.restype = ctypes.c_int
        lib.arith_decode_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int]
    except AttributeError:
        pass  # older cached .so
    lib.bam_base_coverage.restype = None
    lib.bam_base_coverage.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.bam_match_coverage.restype = None
    lib.bam_match_coverage.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
    lib.long_needle_core.restype = None
    lib.long_needle_core.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.nw_matrix.restype = None
    lib.nw_matrix.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p]
    lib.nw_matrix_mt.restype = None
    lib.nw_matrix_mt.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p]
    lib.edist_matrix.restype = None
    lib.edist_matrix.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_void_p]
    lib.edist_matrix_mt.restype = None
    lib.edist_matrix_mt.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p]
    lib.edist_many.restype = None
    lib.edist_many.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
    lib.lcs_many.restype = None
    lib.lcs_many.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
    lib.isize_svt_many.restype = None
    lib.isize_svt_many.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        ctypes.c_void_p]
    lib.gotoh_core.restype = None
    lib.gotoh_core.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.edist_scan.restype = None
    lib.edist_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_void_p]
    lib.edist_scan_last.restype = None
    lib.edist_scan_last.argtypes = lib.edist_scan.argtypes
    lib.edist_scan_row.restype = None
    lib.edist_scan_row.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_void_p]
    lib.seq_range_sums.restype = None
    lib.seq_range_sums.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p]
    lib.popgen_site_stats.restype = None
    lib.popgen_site_stats.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.c_void_p]
    lib.dosage_r2_seq.restype = ctypes.c_double
    lib.dosage_r2_seq.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32]
    lib.rd_windows.restype = ctypes.c_int64
    lib.rd_windows.argtypes = [ctypes.c_void_p] * 4 + [
        ctypes.c_int64, ctypes.c_double, ctypes.c_int64] + [
        ctypes.c_void_p] * 5
    lib.rd_flank_z.restype = ctypes.c_int32
    lib.rd_flank_z.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_void_p]
    lib.cnv_gt_core.restype = None
    lib.cnv_gt_core.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p]
    lib.cnv_segment_core.restype = ctypes.c_int64
    lib.cnv_segment_core.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.c_void_p]
    lib.cov_rows.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.cov_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.hash_pair_h_many.restype = None
    lib.hash_pair_h_many.argtypes = [ctypes.c_void_p] * 5 + [
        ctypes.c_int64, ctypes.c_void_p]
    lib.pair_first_obs.restype = None
    lib.pair_first_obs.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p]
    lib.pair_match.restype = ctypes.c_int64
    lib.pair_match.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.edist_path_banded.restype = None
    lib.edist_path_banded.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    # Cheap self-test: a wrong/corrupt binary fails here instead of
    # mid-pipeline, and the caller falls back to pure Python.
    try:
        chk = np.empty(2, dtype=np.int32)
        n = lib.itf8_decode_stream(b"\x05\x2a", 2,
                                   chk.ctypes.data_as(ctypes.c_void_p))
        if n != 2 or chk[0] != 5 or chk[1] != 42:
            raise OSError("native self-test mismatch")
    except Exception:
        _load_failed = True
        return None
    # a successfully-loaded current build supersedes any stale
    # hash-keyed siblings left by earlier sources
    _prune_stale(lib_path)
    _lib = lib
    return _lib


def _default_threads() -> int:
    return min(os.cpu_count() or 1, 8)


_PyBytes_FromStringAndSize = ctypes.pythonapi.PyBytes_FromStringAndSize
_PyBytes_FromStringAndSize.restype = ctypes.py_object
_PyBytes_FromStringAndSize.argtypes = [ctypes.c_char_p, ctypes.c_ssize_t]
_PyBytes_AsString = ctypes.pythonapi.PyBytes_AsString
_PyBytes_AsString.restype = ctypes.c_void_p
_PyBytes_AsString.argtypes = [ctypes.py_object]


def bgzf_inflate(data: bytes, threads: int | None = None):
    """Parallel BGZF decompression. Returns bytes or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    if hasattr(lib, "bgzf_inflate_into"):
        # Size via a header-only scan, then inflate straight into a
        # fresh bytes object (filled while its refcount is 1) — saves
        # a full output-sized copy vs. string_at.
        total = lib.bgzf_total_out(data, len(data))
        if total < 0:
            return None
        buf = _PyBytes_FromStringAndSize(None, total)
        rc = lib.bgzf_inflate_into(data, len(data),
                                   threads or _default_threads(),
                                   _PyBytes_AsString(buf), total)
        return buf if rc == total else None
    out = ctypes.POINTER(ctypes.c_uint8)()
    rc = lib.bgzf_inflate(data, len(data),
                          threads or _default_threads(),
                          ctypes.byref(out))
    if rc < 0:
        return None
    try:
        return ctypes.string_at(out, rc)
    finally:
        lib.delly_free(out)


def bgzf_inflate_range(data: bytes, ubeg: int, tail_drop: int,
                       threads: int | None = None):
    """BGZF decompression of a span minus its first `ubeg` and last
    `tail_drop` uncompressed bytes, trimmed inside the inflate pass.
    Returns bytes or None on failure."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "bgzf_inflate_range_into"):
        return None
    want = lib.bgzf_range_out(data, len(data), ubeg, tail_drop)
    if want < 0:
        return None
    buf = _PyBytes_FromStringAndSize(None, want)
    rc = lib.bgzf_inflate_range_into(data, len(data),
                                     threads or _default_threads(),
                                     ubeg, tail_drop,
                                     _PyBytes_AsString(buf), want)
    return buf if rc == want else None


def bgzf_deflate(data: bytes, level: int = 6, threads: int | None = None,
                 eof: bool = True):
    """Parallel BGZF compression. Returns bytes or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_uint8)()
    rc = lib.bgzf_deflate(data, len(data), level,
                          threads or _default_threads(), int(eof),
                          ctypes.byref(out))
    if rc < 0:
        return None
    try:
        return ctypes.string_at(out, rc)
    finally:
        lib.delly_free(out)


# Rotating scratch pools: a fresh multi-MB numpy allocation per DP call
# costs more in page faults than the fill itself. Returned matrices are
# views that stay valid only until the pool cycles back around (2 calls
# for nw_matrix — its one caller holds fwd+rev simultaneously — and 1
# call for edist_matrix, whose callers traceback-and-discard).
# THREAD-LOCAL: callers fan DP work out over thread pools (probe
# generation, MSA rounds), and a shared scratch would let concurrent
# fills corrupt each other's matrices.
import threading as _threading

_TLS = _threading.local()


def _tls_pool(name: str, n: int) -> list:
    pool = getattr(_TLS, name, None)
    if pool is None:
        pool = [np.empty(0, dtype=np.int32) for _ in range(n)]
        setattr(_TLS, name, pool)
    return pool


def _scratch(pool: list, idx: int, cells: int) -> np.ndarray:
    if pool[idx].size < cells:
        # np.zeros (calloc -> fresh zeroed mmap), NOT np.empty: numpy's
        # cached allocator hands back MADV_FREE'd pages whose refault
        # path is ~100x slower under this kernel's free-page reporting
        # (measured: 190MB first-write 14.3s via np.empty vs 0.11s via
        # np.zeros)
        pool[idx] = np.zeros(cells, dtype=np.int32)
    return pool[idx]


def nw_matrix(s1: bytes, s2: bytes, match: int, mismatch: int, ge: int,
              horizontal_free: bool):
    """Linear-gap NW score matrix (int32, (m+1, n+1)) or None.

    The returned view is valid until the call after next (rotating
    2-buffer scratch)."""
    lib = get_lib()
    if lib is None:
        return None
    m, n = len(s1), len(s2)
    cells = (m + 1) * (n + 1)
    pool = _tls_pool("nw", 2)
    nxt = getattr(_TLS, "nw_next", 0)
    mat = _scratch(pool, nxt, cells)[:cells]
    _TLS.nw_next = nxt ^ 1
    mat = mat.reshape(m + 1, n + 1)
    lib.nw_matrix_mt(s1, m, s2, n, match, mismatch, ge,
                     int(horizontal_free), _default_threads(),
                     mat.ctypes.data_as(ctypes.c_void_p))
    return mat


# Grow-only scratch for long_needle_scores: page-faulting a fresh
# several-hundred-MB numpy allocation per call costs multiples of the DP
# fill itself, so the two matrices live in reused buffers. The returned
# views are only valid until the next call (the single caller,
# ops/needle.long_needle, tracebacks and discards them immediately).


def long_needle_scores(s1: bytes, s2: bytes, r1: bytes, r2: bytes,
                       match: int, mismatch: int, ge: int,
                       horizontal_free: bool, threads: int | None = None):
    """Fused longNeedle score search (needle.h:45-222): both NW matrices
    plus the best split point in one native call.

    Returns (fwd, rev, flat, best) — the two (m+1, n+1) int32 matrices
    (valid until the next call; kept for traceback), the flat argmax over
    the join grid and the best joined score — or None when the native
    library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    m, n = len(s1), len(s2)
    cells = (m + 1) * (n + 1)
    pool = _tls_pool("ln", 2)
    for i in range(2):
        if pool[i].size < cells:
            # np.zeros, not np.empty — see _scratch
            pool[i] = np.zeros(cells, dtype=np.int32)
    fwd = pool[0][:cells].reshape(m + 1, n + 1)
    rev = pool[1][:cells].reshape(m + 1, n + 1)
    flat = ctypes.c_int64()
    best = ctypes.c_int64()
    if threads is None:
        # wavefront row-level synchronization dominates tiny DPs;
        # sequential fill runs >200M cells/s
        threads = _default_threads()
        if cells < 1_000_000:
            threads = 1
    lib.long_needle_core(s1, m, s2, n, r1, r2, match, mismatch, ge,
                         int(horizontal_free), threads,
                         fwd.ctypes.data_as(ctypes.c_void_p),
                         rev.ctypes.data_as(ctypes.c_void_p),
                         ctypes.byref(flat), ctypes.byref(best))
    return fwd, rev, int(flat.value), int(best.value)


def edist_matrix(q: bytes, t: bytes, mode: int, eq: bytes | None = None):
    """Unit-cost edit DP matrix (int32, (m+1, n+1)) or None.
    eq: optional flattened 256x256 equality table.

    The returned view is valid only until the next call (shared
    scratch buffer)."""
    lib = get_lib()
    if lib is None:
        return None
    m, n = len(q), len(t)
    cells = (m + 1) * (n + 1)
    mat = _scratch(_tls_pool("ed", 1), 0, cells)[:cells].reshape(m + 1, n + 1)
    lib.edist_matrix_mt(q, m, t, n, mode, eq, _default_threads(),
                        mat.ctypes.data_as(ctypes.c_void_p))
    return mat


def edist_many(q: np.ndarray, qlens: np.ndarray, t: np.ndarray,
               tlens: np.ndarray, mode: int,
               threads: int | None = None):
    """Batched distance-only edit distance on host threads, or None."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, dtype=np.uint8)
    t = np.ascontiguousarray(t, dtype=np.uint8)
    nb, mcap = q.shape
    ncap = t.shape[1]
    qlens = np.ascontiguousarray(np.minimum(qlens, mcap), dtype=np.int32)
    tlens = np.ascontiguousarray(np.minimum(tlens, ncap), dtype=np.int32)
    out = np.empty(nb, dtype=np.int32)
    lib.edist_many(q.ctypes.data_as(ctypes.c_char_p),
                   qlens.ctypes.data_as(ctypes.c_void_p), mcap,
                   t.ctypes.data_as(ctypes.c_char_p),
                   tlens.ctypes.data_as(ctypes.c_void_p), ncap, nb, mode,
                   threads or _default_threads(),
                   out.ctypes.data_as(ctypes.c_void_p))
    return out


def isize_svt_many(flag, tid, pos, mtid, mpos, tlen, cutoff: int,
                   svt_trans: int):
    """Fused isize_mapping_pos over SoA columns, or None without the
    native lib."""
    lib = get_lib()
    if lib is None:
        return None
    # ascontiguousarray promotes 0-d scalars to shape (1,), so length,
    # not ndim, decides who needs broadcasting. Batch length = flag's
    # (always a real array); scalar/length-1 columns (callers pass tid
    # as the current ref_index) broadcast to it like the numpy
    # formulation they replace.
    cols = [np.ascontiguousarray(x, dtype=np.int32)
            for x in (flag, tid, pos, mtid, mpos, tlen)]
    n = cols[0].shape[0]
    if any(c.shape[0] not in (1, n) for c in cols[1:]):
        return None  # not numpy-broadcastable; let the caller fall back
    cols = [c if c.shape[0] == n else
            np.ascontiguousarray(np.broadcast_to(c, (n,)),
                                 dtype=np.int32) for c in cols]
    out = np.zeros(n, dtype=np.int64)
    lib.isize_svt_many(*(c.ctypes.data_as(ctypes.c_void_p)
                         for c in cols), n, float(cutoff),
                       int(svt_trans),
                       out.ctypes.data_as(ctypes.c_void_p))
    return out


def gotoh_core(score: np.ndarray, vg_open: np.ndarray,
               vg_ext: np.ndarray, hfree: bool, vfree: bool,
               go: int, ge: int):
    """Affine-gap Gotoh S/H/V fill over a precomputed profile score
    matrix, or None without the native lib. Returns (S, H, V) int64
    matrices of shape (m+1, n+1)."""
    lib = get_lib()
    if lib is None:
        return None
    score = np.ascontiguousarray(score, dtype=np.int32)
    m, n = score.shape
    vg_open = np.ascontiguousarray(vg_open, dtype=np.int64)
    vg_ext = np.ascontiguousarray(vg_ext, dtype=np.int64)
    S = np.zeros((m + 1, n + 1), dtype=np.int64)
    H = np.zeros((m + 1, n + 1), dtype=np.int64)
    V = np.zeros((m + 1, n + 1), dtype=np.int64)
    lib.gotoh_core(score.ctypes.data_as(ctypes.c_void_p), m, n,
                   vg_open.ctypes.data_as(ctypes.c_void_p),
                   vg_ext.ctypes.data_as(ctypes.c_void_p),
                   int(hfree), int(vfree), go, ge,
                   S.ctypes.data_as(ctypes.c_void_p),
                   H.ctypes.data_as(ctypes.c_void_p),
                   V.ctypes.data_as(ctypes.c_void_p))
    return S, H, V


def lcs_many(a: np.ndarray, alens: np.ndarray, b: np.ndarray,
             blens: np.ndarray, threads: int | None = None):
    """Batched LCS lengths (bit-parallel CIPR) on host threads, or
    None without the native lib. Same padded-batch layout as
    edist_many."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    nb, mcap = a.shape
    ncap = b.shape[1]
    alens = np.ascontiguousarray(np.minimum(alens, mcap),
                                 dtype=np.int32)
    blens = np.ascontiguousarray(np.minimum(blens, ncap),
                                 dtype=np.int32)
    out = np.zeros(nb, dtype=np.int32)
    lib.lcs_many(a.ctypes.data_as(ctypes.c_char_p),
                 alens.ctypes.data_as(ctypes.c_void_p), mcap,
                 b.ctypes.data_as(ctypes.c_char_p),
                 blens.ctypes.data_as(ctypes.c_void_p), ncap, nb,
                 threads or _default_threads(),
                 out.ctypes.data_as(ctypes.c_void_p))
    return out


def edist_scan(q: bytes, t: bytes, mode: int, eq: bytes | None = None):
    """Myers bit-parallel distance + leftmost optimal end column (DP
    column coords) for one pair, or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(2, dtype=np.int32)
    lib.edist_scan(q, len(q), t, len(t), mode, eq,
                   out.ctypes.data_as(ctypes.c_void_p))
    return int(out[0]), int(out[1])


def edist_scan_last(q: bytes, t: bytes, mode: int,
                    eq: bytes | None = None):
    """Distance + RIGHTMOST optimal end column (edlib start-location
    rule on reversed inputs), or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(2, dtype=np.int32)
    lib.edist_scan_last(q, len(q), t, len(t), mode, eq,
                        out.ctypes.data_as(ctypes.c_void_p))
    return int(out[0]), int(out[1])


def popgen_site_stats(gl, epsilon: float, maxiter: int):
    """All five popgen.h site statistics in one sequential pass
    (popgen.h:12-201 accumulation order): returns np.array
    [af0, af1, gtf0, gtf1, gtf2, fic, rsq, hwe_pvalue], or None
    without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    gl = np.ascontiguousarray(gl, dtype=np.float64).reshape(-1, 3)
    out = np.zeros(8, dtype=np.float64)
    lib.popgen_site_stats(gl.ctypes.data_as(ctypes.c_void_p),
                          gl.shape[0], float(epsilon), int(maxiter),
                          out.ctypes.data_as(ctypes.c_void_p))
    return out


def dosage_r2_seq(a, b, min_shared: int):
    """Sequential-order dosage R² (popgen.h:149-177), or None without
    the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    return float(lib.dosage_r2_seq(
        a.ctypes.data_as(ctypes.c_void_p), len(a),
        b.ctypes.data_as(ctypes.c_void_p), len(b), int(min_shared)))


def rd_windows(vpos, vcov, ve1, vecor, target_exp: float,
               win_bases: int):
    """Sequential read-depth window builder (cnv.h:307-350 rounding);
    returns (ws, we, wcov, wexp, z) arrays or None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    vpos = np.ascontiguousarray(vpos, dtype=np.int64)
    vcov = np.ascontiguousarray(vcov, dtype=np.float64)
    ve1 = np.ascontiguousarray(ve1, dtype=np.float64)
    vecor = np.ascontiguousarray(vecor, dtype=np.float64)
    n = len(vpos)
    ws = np.empty(n + 1, dtype=np.int64)
    we = np.empty(n + 1, dtype=np.int64)
    wcov = np.empty(n + 1, dtype=np.float64)
    wexp = np.empty(n + 1, dtype=np.float64)
    z = np.empty(n + 1, dtype=np.float64)
    k = lib.rd_windows(
        vpos.ctypes.data_as(ctypes.c_void_p),
        vcov.ctypes.data_as(ctypes.c_void_p),
        ve1.ctypes.data_as(ctypes.c_void_p),
        vecor.ctypes.data_as(ctypes.c_void_p), n, float(target_exp),
        int(win_bases), ws.ctypes.data_as(ctypes.c_void_p),
        we.ctypes.data_as(ctypes.c_void_p),
        wcov.ctypes.data_as(ctypes.c_void_p),
        wexp.ctypes.data_as(ctypes.c_void_p),
        z.ctypes.data_as(ctypes.c_void_p))
    return ws[:k], we[:k], wcov[:k], wexp[:k], z[:k]


def cnv_gt_core(cov, expv, ploidy: float):
    """genotypeCNVs CN + chunked-SD core with the reference's exact
    sequential accumulation and boost lazy variance (cnv.h:140-199);
    returns (cn, sd) — cn == -1 marks the wsz <= 1 invalid case — or
    None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    cov = np.ascontiguousarray(cov, dtype=np.float64)
    expv = np.ascontiguousarray(expv, dtype=np.float64)
    cn = ctypes.c_double()
    sd = ctypes.c_double()
    lib.cnv_gt_core(cov.ctypes.data_as(ctypes.c_void_p),
                    expv.ctypes.data_as(ctypes.c_void_p), len(cov),
                    float(ploidy), ctypes.byref(cn), ctypes.byref(sd))
    return cn.value, sd.value


def rd_flank_z(vcov, vexp, sub_exp: float):
    """Sequential flank z-profile (cnv.h:88-110 rounding); returns a
    list of <= 8 z values or None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    vcov = np.ascontiguousarray(vcov, dtype=np.float64)
    vexp = np.ascontiguousarray(vexp, dtype=np.float64)
    z = np.empty(8, dtype=np.float64)
    nz = lib.rd_flank_z(vcov.ctypes.data_as(ctypes.c_void_p),
                        vexp.ctypes.data_as(ctypes.c_void_p),
                        len(vcov), float(sub_exp),
                        z.ctypes.data_as(ctypes.c_void_p))
    return [float(x) for x in z[:nz]]


def seq_range_sums(x, starts, ends):
    """Per-range left-to-right sequential float64 sums (the reference's
    per-window running-sum rounding), or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    out = np.empty(len(starts), dtype=np.float64)
    lib.seq_range_sums(x.ctypes.data_as(ctypes.c_void_p),
                       starts.ctypes.data_as(ctypes.c_void_p),
                       ends.ctypes.data_as(ctypes.c_void_p),
                       len(starts), out.ctypes.data_as(ctypes.c_void_p))
    return out


def edist_scan_row(q: bytes, t: bytes, eq: bytes | None = None):
    """Full last DP row out[j] = d(q, t[:j]) via the Myers scan
    (NW/SHW boundary), or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(len(t) + 1, dtype=np.int32)
    lib.edist_scan_row(q, len(q), t, len(t), eq,
                       out.ctypes.data_as(ctypes.c_void_p))
    return out


def edist_path_banded(q: bytes, t: bytes, mode: int,
                      eq: bytes | None, lo: int, hi: int,
                      end_col: int = -1):
    """Banded edit-distance alignment with in-C traceback. Returns
    (dist, end_loc, ops uint8 array) or None; dist >= 1<<29 means the
    readout cell fell outside the corridor (caller widens)."""
    lib = get_lib()
    if lib is None:
        return None
    m, n = len(q), len(t)
    ops = np.empty(m + n + 1, dtype=np.uint8)
    out = np.empty(3, dtype=np.int32)
    lib.edist_path_banded(q, m, t, n, mode, eq, lo, hi, end_col,
                          ops.ctypes.data_as(ctypes.c_void_p),
                          out.ctypes.data_as(ctypes.c_void_p))
    return int(out[0]), int(out[1]) - 1, ops[:int(out[2])].copy()


def cnv_segment_core(y: np.ndarray, beta: float, kmin: int):
    """Native PELT-like optimal partition (cnv.h:237-291), or None."""
    lib = get_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty(max(len(y), 1), dtype=np.int64)
    nb = lib.cnv_segment_core(y.ctypes.data_as(ctypes.c_void_p),
                              len(y), float(beta), int(kmin),
                              out.ctypes.data_as(ctypes.c_void_p))
    return out[:nb].tolist()


def hash_pair_h_many(qh, a, b, c, d):
    """Batched pair-key hash, or None."""
    lib = get_lib()
    if lib is None:
        return None
    qh = np.ascontiguousarray(qh, dtype=np.uint64)
    n = len(qh)
    arrs = []
    for v in (a, b, c, d):
        v = np.asarray(v, dtype=np.int64)
        if v.ndim == 0 or len(v) != n:
            v = np.broadcast_to(v, (n,))
        arrs.append(np.ascontiguousarray(v))
    out = np.empty(n, dtype=np.uint64)
    lib.hash_pair_h_many(qh.ctypes.data_as(ctypes.c_void_p),
                         *[x.ctypes.data_as(ctypes.c_void_p)
                           for x in arrs], n,
                         out.ctypes.data_as(ctypes.c_void_p))
    return out


def pair_first_obs(pos, uncond, eqm, chk, add):
    """Single-pass first-mate mask (models/pairing semantics), or
    None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(pos)
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    uncond = np.ascontiguousarray(uncond, dtype=np.uint8)
    eqm = np.ascontiguousarray(eqm, dtype=np.uint8)
    chk = np.ascontiguousarray(chk, dtype=np.uint64)
    add = np.ascontiguousarray(add, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint8)
    lib.pair_first_obs(pos.ctypes.data_as(ctypes.c_void_p),
                       uncond.ctypes.data_as(ctypes.c_void_p),
                       eqm.ctypes.data_as(ctypes.c_void_p),
                       chk.ctypes.data_as(ctypes.c_void_p),
                       add.ctypes.data_as(ctypes.c_void_p), n,
                       out.ctypes.data_as(ctypes.c_void_p))
    return out.astype(bool)


def pair_match(keys, first_mask):
    """Single-pass dict store/pop matcher, or None. Returns
    (S_rows, F_rows) int64 in file order."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(keys)
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    first = np.ascontiguousarray(first_mask, dtype=np.uint8)
    s_out = np.empty(n, dtype=np.int64)
    f_out = np.empty(n, dtype=np.int64)
    cnt = lib.pair_match(keys.ctypes.data_as(ctypes.c_void_p),
                         first.ctypes.data_as(ctypes.c_void_p), n,
                         s_out.ctypes.data_as(ctypes.c_void_p),
                         f_out.ctypes.data_as(ctypes.c_void_p))
    return s_out[:cnt].copy(), f_out[:cnt].copy()


def bam_cigar_stats(data: bytes, offsets: np.ndarray,
                    threads: int | None = None):
    """Per-record CIGAR aggregates + reference name hash (tags.h:260-267)
    for the records at `offsets`. Returns a dict of numpy arrays
    (name_hash uint32, fnv_hash uint64, ref_span/leading_sc/clip_flags/
    max_clip/max_indel int32) or None."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    nrec = len(offsets)
    name_hash = np.empty(nrec, dtype=np.uint32)
    fnv_hash = np.empty(nrec, dtype=np.uint64)
    ref_span = np.empty(nrec, dtype=np.int32)
    leading_sc = np.empty(nrec, dtype=np.int32)
    clip_flags = np.empty(nrec, dtype=np.int32)
    max_clip = np.empty(nrec, dtype=np.int32)
    max_indel = np.empty(nrec, dtype=np.int32)
    lead_clip = np.empty(nrec, dtype=np.int32)
    trail_clip = np.empty(nrec, dtype=np.int32)
    lib.bam_cigar_stats(data, len(data),
                        offsets.ctypes.data_as(ctypes.c_void_p), nrec,
                        threads or _default_threads(),
                        name_hash.ctypes.data_as(ctypes.c_void_p),
                        fnv_hash.ctypes.data_as(ctypes.c_void_p),
                        ref_span.ctypes.data_as(ctypes.c_void_p),
                        leading_sc.ctypes.data_as(ctypes.c_void_p),
                        clip_flags.ctypes.data_as(ctypes.c_void_p),
                        max_clip.ctypes.data_as(ctypes.c_void_p),
                        max_indel.ctypes.data_as(ctypes.c_void_p),
                        lead_clip.ctypes.data_as(ctypes.c_void_p),
                        trail_clip.ctypes.data_as(ctypes.c_void_p))
    return {"name_hash": name_hash, "fnv_hash": fnv_hash,
            "ref_span": ref_span, "leading_sc": leading_sc,
            "clip_flags": clip_flags, "max_clip": max_clip,
            "max_indel": max_indel, "lead_clip": lead_clip,
            "trail_clip": trail_clip}


def bam_match_coverage(data: bytes, offsets: np.ndarray, target_len: int):
    """CMATCH base-coverage counts (int32, length target_len) for the
    records at `offsets`, un-clamped (caller applies the saturation cap),
    or None."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    diff = np.zeros(target_len + 1, dtype=np.int32)
    lib.bam_match_coverage(data, len(data),
                           offsets.ctypes.data_as(ctypes.c_void_p),
                           len(offsets), target_len,
                           diff.ctypes.data_as(ctypes.c_void_p))
    return np.cumsum(diff[:target_len], dtype=np.int32)


def itf8_decode_stream(data: bytes):
    """Decode a whole ITF-8 integer stream to an int32 array, or None."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(max(len(data), 1), dtype=np.int32)
    cnt = lib.itf8_decode_stream(data, len(data),
                                 out.ctypes.data_as(ctypes.c_void_p))
    return out[:cnt]


def rans_nx16_entropy(data: bytes, out_sz: int, order1: bool,
                      nway: int):
    """rANS Nx16 entropy stage (CRAM 3.1 method 5, io/rans_nx16.py
    contract): decode `out_sz` bytes starting at the frequency tables.
    Returns (bytes, consumed) or None (caller falls back to Python)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "rans_nx16_decode"):
        return None
    out = np.empty(max(out_sz, 1), dtype=np.uint8)
    rc = lib.rans_nx16_decode(data, len(data),
                              out.ctypes.data_as(ctypes.c_void_p),
                              out_sz, int(order1), int(nway))
    if rc < 0:
        return None
    return out[:out_sz].tobytes(), int(rc)


def arith_decode_bytes(data: bytes, out_sz: int, order1: bool):
    """Adaptive-arithmetic entropy stage (io/arith_nx.py contract), or
    None (caller falls back)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "arith_decode_bytes"):
        return None
    out = np.empty(max(out_sz, 1), dtype=np.uint8)
    rc = lib.arith_decode_bytes(data, len(data),
                                out.ctypes.data_as(ctypes.c_void_p),
                                out_sz, int(order1))
    if rc != 0:
        return None
    return out[:out_sz].tobytes()


def fqz_decode_block(data: bytes, out_sz: int):
    """fqzcomp DO_LEN stream -> concatenated quality bytes
    (io/fqzcomp.py contract), or None (caller falls back)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "fqz_decode"):
        return None
    out = np.empty(max(out_sz, 1), dtype=np.uint8)
    rc = lib.fqz_decode(data, len(data),
                        out.ctypes.data_as(ctypes.c_void_p), out_sz)
    if rc != 0:
        return None
    return out[:out_sz].tobytes()


def rans_decode(data: bytes, out_sz: int):
    """rANS 4x8 block decode (CRAM method 4), or None when the native
    library is absent or the payload is malformed."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(out_sz, dtype=np.uint8)
    rc = lib.rans_decode_c(data, len(data),
                           out.ctypes.data_as(ctypes.c_void_p), out_sz)
    if rc != 0:
        return None
    return out.tobytes()


def bam_base_coverage(data: bytes, offsets: np.ndarray, mapq_uniq: int,
                      reflen: int):
    """Dual M/=/X base-coverage totals (util.h:454-474) for the records
    at `offsets`: (total int32[reflen], uniq int32[reflen]) un-clamped,
    or None."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    diff_all = np.zeros(reflen + 1, dtype=np.int32)
    diff_uniq = np.zeros(reflen + 1, dtype=np.int32)
    lib.bam_base_coverage(data, len(data),
                          offsets.ctypes.data_as(ctypes.c_void_p),
                          len(offsets), mapq_uniq, reflen,
                          diff_all.ctypes.data_as(ctypes.c_void_p),
                          diff_uniq.ctypes.data_as(ctypes.c_void_p))
    # int32 prefix sums are exact (depth <= read count << 2^31); the
    # explicit dtype keeps numpy from promoting the accumulator to
    # int64 (2x the memory traffic on these genome-length arrays)
    return (np.cumsum(diff_all[:reflen], dtype=np.int32),
            np.cumsum(diff_uniq[:reflen], dtype=np.int32))


def bam_scan(data: bytes, start: int):
    """SoA scan of BAM alignment records. Returns a dict of numpy arrays
    (offsets + core fields) or None when the native library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    # exact count via a native skip walk: the len/36 worst-case bound
    # over-allocates ~1000x on long-read data, and the arena calloc
    # memsets the whole bound (observed ~3s/run at scale)
    cap = max(16, int(lib.bam_count(data, len(data), start)))
    # np.zeros, not np.empty — see _scratch (large native first-touch)
    offsets = np.zeros(cap, dtype=np.int64)
    cols = {name: np.zeros(cap, dtype=np.int32)
            for name in ("tid", "pos", "flag", "mapq", "mtid", "mpos",
                         "tlen", "lqseq")}

    def ptr(arr):
        return arr.ctypes.data_as(ctypes.c_void_p)

    n = lib.bam_scan(data, len(data), start, ptr(offsets), ptr(cols["tid"]),
                     ptr(cols["pos"]), ptr(cols["flag"]),
                     ptr(cols["mapq"]), ptr(cols["mtid"]),
                     ptr(cols["mpos"]), ptr(cols["tlen"]),
                     ptr(cols["lqseq"]), cap)
    if n < 0:
        return None
    if n == cap:
        # exact fit: hand the columns over without the prefix copy
        out = {"offsets": offsets}
        out.update(cols)
        return out
    out = {"offsets": offsets[:n].copy()}
    for name, arr in cols.items():
        out[name] = arr[:n].copy()
    return out


def cov_rows(chrn: str, start, end, uniq, logr, cn, na) -> str | None:
    """Render CNV covfile rows natively (coral.h:296-414 output plane):
    "chr\\tstart\\tend\\t%g\\t%g\\t%g\\n" with NA for uncallable
    windows — byte-identical to the Python f-string loop (C %g and
    Python format(x,'g') agree for doubles incl. inf/nan). Returns the
    text block or None when the native library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    start = np.ascontiguousarray(start, dtype=np.int64)
    end = np.ascontiguousarray(end, dtype=np.int64)
    uniq = np.ascontiguousarray(uniq, dtype=np.float64)
    logr = np.ascontiguousarray(logr, dtype=np.float64)
    cn = np.ascontiguousarray(cn, dtype=np.float64)
    na = np.ascontiguousarray(na, dtype=np.uint8)
    nw = len(start)
    out_len = ctypes.c_int64()

    def ptr(arr):
        return arr.ctypes.data_as(ctypes.c_void_p)

    buf = lib.cov_rows(chrn.encode(), ptr(start), ptr(end), ptr(uniq),
                       ptr(logr), ptr(cn), ptr(na), nw,
                       ctypes.byref(out_len))
    if not buf or out_len.value < 0:
        return None
    try:
        return ctypes.string_at(buf, out_len.value).decode()
    finally:
        lib.delly_free(buf)
