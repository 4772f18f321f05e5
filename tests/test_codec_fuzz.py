"""Corruption fuzzing for the CRAM 3.1 codec plane: decoding
truncated / bit-flipped / garbage streams must raise (or return wrong
bytes) within bounded time and memory — never hang, never allocate
unbounded output, never crash the interpreter."""

import random

import pytest

from delly_tpu.io import arith_nx, fqzcomp, rans_nx16, tok3

_OK_ERRORS = (ValueError, IndexError, KeyError, OverflowError,
              ZeroDivisionError, MemoryError, struct_erroradj := Exception)


def _fuzz_stream(decode, enc, rng, trials=60):
    for t in range(trials):
        blob = bytearray(enc)
        mode = t % 3
        if mode == 0 and len(blob) > 1:      # truncate
            blob = blob[:rng.randrange(1, len(blob))]
        elif mode == 1:                      # bit flips
            for _ in range(rng.randrange(1, 6)):
                i = rng.randrange(len(blob))
                blob[i] ^= 1 << rng.randrange(8)
        else:                                # garbage head/tail
            blob = bytearray(rng.randbytes(rng.randrange(1, 64)))
        try:
            decode(bytes(blob))
        except Exception:
            pass  # any exception is acceptable; hangs/crashes are not


def test_rans_nx16_corruption():
    rng = random.Random(7)
    data = bytes(rng.choice(b"ACGT") for _ in range(2000))
    for flags in (0, rans_nx16.F_ORDER1, rans_nx16.F_RLE,
                  rans_nx16.F_PACK | rans_nx16.F_RLE,
                  rans_nx16.F_STRIPE):
        enc = rans_nx16.encode(data, flags)
        _fuzz_stream(lambda b: rans_nx16.decode(b), enc, rng)


def test_arith_corruption():
    rng = random.Random(11)
    data = bytes(rng.choice(b"##FF,,::") for _ in range(1500))
    for flags in (0, rans_nx16.F_ORDER1, rans_nx16.F_RLE):
        enc = arith_nx.encode(data, flags)
        _fuzz_stream(lambda b: arith_nx.decode(b), enc, rng)


def test_tok3_corruption():
    rng = random.Random(13)
    names = [f"A0:1:HX:{i}:{1000 + i}:{2000 + i}".encode()
             for i in range(100)]
    enc = tok3.encode(names)
    _fuzz_stream(lambda b: tok3.decode(b), enc, rng)


def test_fqzcomp_corruption():
    rng = random.Random(17)
    quals = [bytes(rng.choice(b"#,:F") for _ in range(150))
             for _ in range(50)]
    enc = fqzcomp.encode(quals, store_lens=True)
    total = sum(len(q) for q in quals)
    _fuzz_stream(lambda b: fqzcomp.decode_block(b, total), enc, rng)


def test_alloc_bomb_rejected():
    """A corrupt uint7 size field must raise, not allocate gigabytes."""
    bomb = bytes([0]) + rans_nx16.write_uint7(1 << 34) + b"\x00" * 16
    with pytest.raises(ValueError):
        rans_nx16.decode(bomb)
    with pytest.raises(ValueError):
        arith_nx.decode(bomb)
