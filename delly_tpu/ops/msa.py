"""Multiple sequence alignment for split-read consensus (sr engine).

Reference: src/msa.h — LCS similarity matrix, UPGMA guide tree, progressive
profile alignment with end-free Gotoh, coverage-gated column consensus.
"""

from __future__ import annotations

import numpy as np

from delly_tpu.ops.gotoh import GAP, DnaScore, gotoh


def lcs(s1: str, s2: str) -> int:
    """Longest common subsequence length (msa.h:10-30), vectorized DP.

    Row recurrence: on a match the diagonal+1 candidate always dominates
    (LCS grows by at most one per char), so the in-row dependency reduces
    to a prefix max.
    """
    a = np.frombuffer(s1.encode(), dtype=np.uint8)
    b = np.frombuffer(s2.encode(), dtype=np.uint8)
    m, n = len(a), len(b)
    prev = np.zeros(n + 1, dtype=np.int32)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int32)
        cur[0] = 0
        match = prev[:-1] + (a[i - 1] == b)
        np.maximum(match, prev[1:], out=match)
        cur[1:] = np.maximum.accumulate(match)
        prev = cur
    return int(prev[-1])


_lcs_cache = {}
_lcs_use_device = None


def _lcs_device_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def kern(a, alens, b, blens):
        B, M = a.shape
        N = b.shape[1]
        colmask = (jnp.arange(1, N + 1, dtype=jnp.int32)[None, :]
                   <= blens[:, None])
        row0 = jnp.zeros((B, N + 1), dtype=jnp.int32)

        def step(prev, qi_i):
            qi, i = qi_i
            active = i <= alens
            eq = ((qi[:, None] == b) & colmask).astype(jnp.int32)
            cand = jnp.maximum(prev[:, :-1] + eq, prev[:, 1:])
            body = jax.lax.associative_scan(jnp.maximum, cand, axis=1)
            cur = jnp.concatenate(
                [jnp.zeros((B, 1), dtype=jnp.int32), body], axis=1)
            cur = jnp.where(active[:, None], cur, prev)
            return cur, None

        rows = jnp.arange(1, M + 1, dtype=jnp.int32)
        final, _ = jax.lax.scan(step, row0, (a.T, rows))
        return final[jnp.arange(B), blens]

    return kern


def _lcs_host_batch(pairs: list) -> np.ndarray:
    """Host path: one native bit-parallel batch (hostio lcs_many),
    falling back to the per-pair numpy DP without the native lib."""
    from delly_tpu import native
    mcap = max(len(a) for a, _ in pairs)
    ncap = max(len(b) for _, b in pairs)
    if mcap and ncap and native.get_lib() is not None:
        nb = len(pairs)
        a = np.zeros((nb, mcap), dtype=np.uint8)
        b = np.zeros((nb, ncap), dtype=np.uint8)
        al = np.zeros(nb, dtype=np.int32)
        bl = np.zeros(nb, dtype=np.int32)
        for i, (x, y) in enumerate(pairs):
            xb = x.encode()
            yb = y.encode()
            a[i, :len(xb)] = np.frombuffer(xb, dtype=np.uint8)
            b[i, :len(yb)] = np.frombuffer(yb, dtype=np.uint8)
            al[i] = len(xb)
            bl[i] = len(yb)
        out = native.lcs_many(a, al, b, bl)
        if out is not None:
            return out.astype(np.int64)
    return np.asarray([lcs(a, b) for a, b in pairs], dtype=np.int64)


def lcs_pairs(pairs: list) -> np.ndarray:
    """Batched LCS lengths for (a, b) string pairs — one padded device
    batch (the row recurrence reduces to an in-row prefix max, the same
    shape as the edit-distance kernels). Used for the MSA similarity
    matrix (reference HOT LOOP 3 feeder, msa.h:10-44)."""
    global _lcs_use_device
    if not pairs:
        return np.zeros(0, dtype=np.int64)
    # size check FIRST: querying the backend initializes the device
    # client, which small runs should never pay for (ops/edist.py has
    # the same ordering)
    from delly_tpu.ops.edist import _device_min_pairs
    if len(pairs) < max(8, _device_min_pairs()):
        return _lcs_host_batch(pairs)
    if _lcs_use_device is None:
        try:
            import jax
            _lcs_use_device = jax.default_backend() == "tpu"
        except Exception:
            _lcs_use_device = False
    if not _lcs_use_device:
        return _lcs_host_batch(pairs)

    def bucket(x):
        v = 128
        while v < x:
            v *= 2
        return v

    import jax.numpy as jnp
    m = bucket(max(len(a) for a, _ in pairs))
    n = bucket(max(len(b) for _, b in pairs))
    nb = len(pairs)
    a = np.zeros((nb, m), dtype=np.uint8)
    b = np.zeros((nb, n), dtype=np.uint8)
    al = np.zeros(nb, dtype=np.int32)
    bl = np.zeros(nb, dtype=np.int32)
    for i, (x, y) in enumerate(pairs):
        xb = x.encode()
        yb = y.encode()
        a[i, :len(xb)] = np.frombuffer(xb, dtype=np.uint8)
        b[i, :len(yb)] = np.frombuffer(yb, dtype=np.uint8)
        al[i] = len(xb)
        bl[i] = len(yb)
    fn = _lcs_cache.get("kern")
    if fn is None:
        fn = _lcs_cache["kern"] = _lcs_device_fn()
    out = fn(jnp.asarray(a), jnp.asarray(al), jnp.asarray(b),
             jnp.asarray(bl))
    return np.asarray(out).astype(np.int64)


def distance_matrix(seqs: list) -> np.ndarray:
    """Similarity percent matrix (msa.h:32-44); the all-pairs LCS runs
    as one batched device call on TPU backends."""
    num = len(seqs)
    d = np.full((2 * num + 1, 2 * num + 1), -1, dtype=np.int64)
    idx = [(i, j) for i in range(num) for j in range(i + 1, num)]
    if not idx:
        return d
    ls = lcs_pairs([(seqs[i], seqs[j]) for i, j in idx])
    for k, (i, j) in enumerate(idx):
        d[i][j] = (int(ls[k]) * 100) // min(len(seqs[i]), len(seqs[j]))
    return d


def upgma(d: np.ndarray, num: int):
    """Guide tree (msa.h:46-89). Returns (root, phylogeny array)."""
    p = np.full((2 * num + 1, 3), -1, dtype=np.int64)
    nn = num
    while nn < 2 * num + 1:
        # closestPair: first maximum in row-major order, strict >
        sub = d[:nn, :nn]
        dmax = sub.max() if nn > 0 else -1
        if dmax == -1:
            break
        flat = int(np.argmax(sub))
        di, dj = divmod(flat, nn)
        p[di][0] = nn
        p[dj][0] = nn
        p[nn][1] = di
        p[nn][2] = dj
        # updateDistanceMatrix (msa.h:62-72)
        for i in range(nn):
            if p[i][0] == -1:
                a = int(d[di][i] if di < i else d[i][di])
                b = int(d[dj][i] if dj < i else d[i][dj])
                q = a + b
                # C++ integer division truncates toward zero.
                d[i][nn] = q // 2 if q >= 0 else -((-q) // 2)
        d[:di, di] = -1
        d[di, di + 1 : nn + 1] = -1
        d[:dj, dj] = -1
        d[dj, dj + 1 : nn + 1] = -1
        nn += 1
    return (nn - 1 if nn > 0 else 0), p


_DEVICE_MIN_CELLS = 65536
_use_device = None


_BANDED_MIN_DIM = 8192


def _gotoh_dispatch(a1, a2, ac, sc):
    """Large profile merges run on the device Gotoh kernel when a TPU
    backend is present (bit-identical results, see ops/gotoh_device);
    small merges stay on the host row-vectorized DP where dispatch
    latency would dominate. Sequence-vs-sequence merges beyond
    _BANDED_MIN_DIM use the corridor DP (ops/gotoh_banded) on host
    and device alike — O(m*band) instead of O(m*n); the reference's
    consensus windows never reach this size, so the corridor only
    engages on long-context inputs the full DP could not serve."""
    global _use_device
    if (a1.shape[0] == 1 and a2.shape[0] == 1
            and max(a1.shape[1], a2.shape[1]) > _BANDED_MIN_DIM
            and min(a1.shape[1], a2.shape[1]) >= 1):
        return _banded_or_full(a1, a2, ac, sc)
    if a1.shape[1] * a2.shape[1] >= _DEVICE_MIN_CELLS:
        if _device_backend():
            from delly_tpu.ops.gotoh_device import gotoh_device
            return gotoh_device(a1, a2, ac=ac, sc=sc)
    return gotoh(a1, a2, ac=ac, sc=sc)


def _banded_or_full(a1, a2, ac, sc):
    """Long-context sequence merge: corridor Gotoh with a band sized
    from the Myers edit distance, validated by checking the traceback
    never rides an interior corridor edge; any doubt falls back to the
    exact full DP."""
    m, n = a1.shape[1], a2.shape[1]
    d = None
    try:
        from delly_tpu import native
        if native.get_lib() is not None:
            sc_d = native.edist_scan(a1[0].tobytes(), a2[0].tobytes(),
                                     0, None)
            if sc_d is not None:
                d = sc_d[0]
    except Exception:
        d = None
    if d is None:
        return gotoh(a1, a2, ac=ac, sc=sc)
    band = 512
    while band < 2 * (d + 8) + 256:
        band *= 2
    if band > 4096:
        return gotoh(a1, a2, ac=ac, sc=sc)
    from delly_tpu.ops.gotoh_banded import (
        gotoh_banded_batch, gotoh_banded_host,
    )
    if _device_backend():
        best, merged = gotoh_banded_batch([(a1, a2)], ac=ac, sc=sc,
                                          band=band)[0]
    elif n > m:
        best, merged = gotoh_banded_host(a2, a1, ac=(ac[1], ac[0]),
                                         sc=sc, band=band)
        merged = np.concatenate([merged[1:], merged[:1]], axis=0)
    else:
        best, merged = gotoh_banded_host(a1, a2, ac=ac, sc=sc,
                                         band=band)
    if _trace_touches_edge(merged, m, n, band):
        return gotoh(a1, a2, ac=ac, sc=sc)
    return best, merged


def _trace_touches_edge(merged, m, n, band):
    """True when the alignment path comes within 2 slots of an
    interior corridor edge (matrix boundaries do not count)."""
    from delly_tpu.ops.gotoh import GAP
    from delly_tpu.ops.gotoh_banded import corridor_offsets
    swap = n > m
    mm, nn = (n, m) if swap else (m, n)
    off = corridor_offsets(mm, nn, band)
    r1 = merged[0] != GAP      # consumes a1
    r2 = merged[1] != GAP      # consumes a2
    ia = np.cumsum(r1)
    ja = np.cumsum(r2)
    i_band = ja if swap else ia
    j_band = ia if swap else ja
    slot = j_band - off[i_band]
    left_interior = off[i_band] > 0
    right_interior = off[i_band] + band - 1 < nn
    touch = ((slot <= 1) & left_interior) \
        | ((slot >= band - 2) & right_interior)
    return bool(touch.any())


def _device_backend() -> bool:
    global _use_device
    if _use_device is None:
        import os
        pref = os.environ.get("DELLY_TPU_GOTOH_DEVICE", "auto")
        if pref == "never":
            _use_device = False
        elif pref == "always":
            _use_device = True
        else:
            try:
                import jax
                _use_device = jax.default_backend() == "tpu"
            except Exception:
                _use_device = False
    return _use_device


def palign(seqs: list, p: np.ndarray, root: int, sc: DnaScore) -> np.ndarray:
    """Progressive alignment (msa.h:91-109)."""
    if p[root][1] == -1 and p[root][2] == -1:
        s = seqs[root]
        return np.frombuffer(s.encode(), dtype=np.uint8)[None, :].copy()
    a1 = palign(seqs, p, int(p[root][1]), sc)
    a2 = palign(seqs, p, int(p[root][2]), sc)
    _, merged = _gotoh_dispatch(a1, a2, (True, True), sc)
    return merged


def consensus(align: np.ndarray, min_clique_size: int) -> str:
    """Coverage-gated column consensus (msa.h:111-173)."""
    nrows, ncols = align.shape
    nongap = align != GAP
    first = np.where(nongap.any(axis=1), nongap.argmax(axis=1), ncols)
    rev_last = nongap[:, ::-1].argmax(axis=1)
    last = np.where(nongap.any(axis=1), ncols - 1 - rev_last, -1)
    col = np.arange(ncols)
    fl = (first[:, None] <= col[None, :]) & (col[None, :] <= last[:, None])
    cov = fl.sum(axis=0)
    cov_threshold = max(2, min(min_clique_size, nrows))
    out = []
    # counts per column: A C G T other
    upper = np.char.upper(
        np.frombuffer(align.tobytes(), dtype="S1").reshape(align.shape))
    counts = np.zeros((5, ncols), dtype=np.int32)
    for k, ch in enumerate(b"ACGT"):
        counts[k] = ((upper == bytes([ch])) & fl).sum(axis=0)
    counts[4] = fl.sum(axis=0) - counts[:4].sum(axis=0)
    for j in range(ncols):
        if cov[j] >= cov_threshold:
            max_idx = int(np.argmax(counts[:, j]))  # first max (ties)
            if max_idx < 4:
                out.append("ACGT"[max_idx])
    return "".join(out)


def msa(seqs: list, min_clique_size: int, sc: DnaScore | None = None,
        d: np.ndarray | None = None):
    """msa.h:185-239. Returns (support, consensus string). `d` lets a
    caller supply the similarity matrix from a cross-SV batched LCS
    pass (distance_matrix_from_lcs)."""
    sc = sc or DnaScore()
    num = len(seqs)
    if d is None:
        d = distance_matrix(seqs)
    root, p = upgma(d, num)
    align = palign(seqs, p, int(root), sc)
    cs = consensus(align, min_clique_size)
    return align.shape[0], cs


def distance_matrix_from_lcs(seqs: list, ls) -> np.ndarray:
    """Similarity matrix from precomputed LCS lengths for the i<j pair
    list in row-major order (msa.h:32-44)."""
    num = len(seqs)
    d = np.full((2 * num + 1, 2 * num + 1), -1, dtype=np.int64)
    k = 0
    for i in range(num):
        for j in range(i + 1, num):
            d[i][j] = (int(ls[k]) * 100) // min(len(seqs[i]),
                                                len(seqs[j]))
            k += 1
    return d


_BATCH_MIN_CELLS = None
_pallas_pref = None


def _batch_min_cells() -> int:
    """DP-cell threshold for routing a lockstep MSA merge round to the
    device kernel. The kernel itself is ~3 orders faster than one host
    DP stream, but a dispatch pays fixed costs that depend on the
    deployment: on a co-located chip they are microseconds; through a
    remote tunnel they are ~50 ms per call plus ~10 s-class Pallas
    compiles per fresh bucket shape. The default (4M cells ~ 0.3 s of
    host DP) only dispatches rounds big enough to win even on a
    tunnel; co-located deployments can lower DELLY_TPU_GOTOH_MIN_CELLS
    to dispatch almost everything."""
    global _BATCH_MIN_CELLS
    if _BATCH_MIN_CELLS is None:
        import os
        _BATCH_MIN_CELLS = int(os.environ.get(
            "DELLY_TPU_GOTOH_MIN_CELLS", str(1 << 22)))
    return _BATCH_MIN_CELLS


def _pallas_batch_mode():
    """'tpu' = compiled kernel, 'interpret' = interpreter (tests),
    None = host. Env DELLY_TPU_GOTOH_PALLAS: auto|always|never.
    Queries the backend — callers must size-gate first (ops/edist.py)."""
    global _pallas_pref
    if _pallas_pref is None:
        import os
        pref = os.environ.get("DELLY_TPU_GOTOH_PALLAS", "auto")
        if pref == "never":
            _pallas_pref = (None, False)
        else:
            try:
                import jax
                on_tpu = jax.default_backend() == "tpu"
            except Exception:
                on_tpu = False
            if on_tpu:
                _pallas_pref = ("tpu", pref == "always")
            elif pref == "always":
                _pallas_pref = ("interpret", True)
            else:
                _pallas_pref = (None, False)
    return _pallas_pref[0]


def _pallas_forced() -> bool:
    """True when DELLY_TPU_GOTOH_PALLAS=always (tests): size gates are
    bypassed so the kernel paths get exercised. Cached with the mode —
    but read WITHOUT initializing a backend."""
    if _pallas_pref is not None:
        return _pallas_pref[1]
    import os
    return os.environ.get("DELLY_TPU_GOTOH_PALLAS", "auto") == "always"


def _gotoh_dispatch_batch(pairs: list, ac, sc):
    """Batched merge dispatch: one lockstep Pallas call when the round
    is big enough to amortize a device dispatch, else the per-pair
    host/XLA path. Results are bit-identical either way."""
    # size check before _pallas_batch_mode(): the backend query
    # initializes the device client (see ops/edist.py)
    cells = sum(a1.shape[1] * a2.shape[1] for a1, a2 in pairs)
    big = (len(pairs) > 1
           and (cells >= _batch_min_cells() or _pallas_forced()))
    if big:
        mode = _pallas_batch_mode()
        if mode is not None:
            from delly_tpu.ops.gotoh_pallas import gotoh_batch
            return gotoh_batch(pairs, ac=ac, sc=sc,
                               interpret=(mode == "interpret"))
    return [_gotoh_dispatch(a1, a2, ac, sc) for a1, a2 in pairs]


def msa_batch(items: list, min_clique_size: int,
              sc: DnaScore | None = None) -> list:
    """Lockstep MSA across SVs: same per-item results as msa(), but
    guide-tree merges at the same depth across ALL items run as one
    batched device Gotoh call (the reference runs one msa() per
    ThreadPool task instead, shortpe.h:174-201).

    items: list of (seqs, d) with d the similarity matrix (or None to
    compute it here). Returns [(support, consensus), ...].
    """
    sc = sc or DnaScore()
    out = [None] * len(items)
    trees = []
    levels = {}           # (item, node) -> depth
    rounds = {}           # depth -> [(item, node)]
    for ii, (seqs, d) in enumerate(items):
        num = len(seqs)
        if d is None:
            d = distance_matrix(seqs)
        root, p = upgma(d.copy(), num)  # upgma consumes its matrix
        trees.append((int(root), p))

        def walk(nd, _ii=ii, _p=p):
            c1, c2 = int(_p[nd][1]), int(_p[nd][2])
            if c1 == -1 and c2 == -1:
                levels[(_ii, nd)] = 0
                return 0
            lv = 1 + max(walk(c1), walk(c2))
            levels[(_ii, nd)] = lv
            rounds.setdefault(lv, []).append((_ii, nd))
            return lv

        walk(int(root))

    stores = [dict() for _ in items]

    def fetch(ii, nd):
        if nd < len(items[ii][0]):
            s = items[ii][0][nd]
            return np.frombuffer(s.encode(), dtype=np.uint8)[None, :].copy()
        return stores[ii].pop(nd)

    for lv in sorted(rounds):
        jobs = rounds[lv]
        pairs = []
        for ii, nd in jobs:
            p = trees[ii][1]
            pairs.append((fetch(ii, int(p[nd][1])),
                          fetch(ii, int(p[nd][2]))))
        merged = _gotoh_dispatch_batch(pairs, (True, True), sc)
        for (ii, nd), (_score, mg) in zip(jobs, merged):
            stores[ii][nd] = mg

    for ii, (root, _p) in enumerate(trees):
        align = fetch(ii, root)
        out[ii] = (align.shape[0], consensus(align, min_clique_size))
    return out
