"""Golden OpenFST byte images, assembled WITHOUT FstBuilder/fst_io.

Round-2 VERDICT item 4: the native reader (native/src/fst.cc) had only ever
read files produced by its sibling writer (decode/fst_io.FstBuilder) — a
closed loop where a shared byte-layout mistake passes every test. Here
every fixture is hand-assembled with struct.pack directly from the OpenFST
on-disk layout (studied from the public openfst sources: fst.h FstHeader::
Read, vector-fst.h VectorFstImpl, const-fst.h ConstFstImpl, symbol-table.cc
SymbolTable::Read), covering the variants real artifacts ship with:

  * vector fst, version 2, no symbols        (fstcompile default output)
  * vector fst with embedded input+output symbol tables (flags 0x3 —
    files written with --keep_isymbols/--keep_osymbols or by pynini)
  * const fst, u32 arcs, version 2 unaligned
  * const fst, u32 arcs, version 1 ALIGNED (16-byte padding — what
    ConstFst::Write emits to seekable files)
  * const64 fst (u64 state offsets)

plus malformed-input fuzz cases: a corrupt artifact must load as failure,
never crash the server (the reference dies with LOG(ERROR); exit at
itn-processor.cpp:31-37 — we must degrade gracefully).
"""
import struct

import numpy as np
import pytest

from asr2pass_tpu.native import bindings

pytestmark = pytest.mark.skipif(not bindings.available(),
                                reason="native lib not built")

FST_MAGIC = 2125659606
SYMTAB_MAGIC = 2125658996
INF = float("inf")


def _s(text: str) -> bytes:
    b = text.encode()
    return struct.pack("<i", len(b)) + b


def _header(fsttype: str, version: int, flags: int, start: int,
            nstates: int, narcs: int, props: int = 0x3) -> bytes:
    return (struct.pack("<i", FST_MAGIC) + _s(fsttype) + _s("standard")
            + struct.pack("<iiQqqq", version, flags, props, start,
                          nstates, narcs))


def _symtab(name: str, symbols) -> bytes:
    out = struct.pack("<i", SYMTAB_MAGIC) + _s(name)
    out += struct.pack("<q", len(symbols))        # available_key
    out += struct.pack("<q", len(symbols))        # size
    for key, sym in enumerate(symbols):
        out += _s(sym) + struct.pack("<q", key)
    return out


# The golden machine used by every accept case: 3 states,
#   0 --1:10/0.5--> 1 --2:20/0.25--> 2(final 1.0)
#   0 --3:30/2.0--> 2
# shortest accepting path for input [1,2] = 10,20 at cost 1.75.
GOLD_ARCS = [
    (0, [(1, 10, 0.5, 1), (3, 30, 2.0, 2)]),
    (1, [(2, 20, 0.25, 2)]),
    (2, []),
]
GOLD_FINALS = {2: 1.0}


def _vector_body() -> bytes:
    out = b""
    for s, arcs in GOLD_ARCS:
        w = GOLD_FINALS.get(s, INF)
        out += struct.pack("<f", w) + struct.pack("<q", len(arcs))
        for il, ol, wt, nxt in arcs:
            out += struct.pack("<iifi", il, ol, wt, nxt)
    return out


def _const_body(aligned: bool, wide: bool, hdr_len: int) -> bytes:
    """ConstFst body: state records then arc records, each optionally
    16-byte aligned relative to the file start (const-fst.h)."""
    out = b""
    pos = 0
    states = b""
    for s, arcs in GOLD_ARCS:
        w = GOLD_FINALS.get(s, INF)
        nieps = sum(1 for a in arcs if a[0] == 0)
        noeps = sum(1 for a in arcs if a[1] == 0)
        if wide:
            states += struct.pack("<fIQQQQ", w, 0, pos, len(arcs),
                                  nieps, noeps)
        else:
            states += struct.pack("<fIIII", w, pos, len(arcs), nieps,
                                  noeps)
        pos += len(arcs)
    arcsb = b""
    for s, arcs in GOLD_ARCS:
        for il, ol, wt, nxt in arcs:
            arcsb += struct.pack("<iifi", il, ol, wt, nxt)
    if aligned:
        off = hdr_len
        pad1 = (-off) % 16
        off += pad1 + len(states)
        pad2 = (-off) % 16
        return b"\0" * pad1 + states + b"\0" * pad2 + arcsb
    return states + arcsb


def _check_gold(path):
    nf = bindings.NativeFst(str(path))
    assert (nf.start, nf.num_states, nf.num_arcs) == (0, 3, 3)
    assert nf.transduce([1, 2]) == [10, 20]
    assert nf.transduce([3]) == [30]
    assert nf.transduce([2]) is None


def test_vector_v2_plain(tmp_path):
    p = tmp_path / "v2.fst"
    p.write_bytes(_header("vector", 2, 0, 0, 3, 3) + _vector_body())
    _check_gold(p)


def test_vector_with_symbol_tables(tmp_path):
    """flags 0x3: input+output SymbolTables between header and states."""
    p = tmp_path / "sym.fst"
    body = (_header("vector", 2, 0x3, 0, 3, 3)
            + _symtab("isyms", ["<eps>", "one", "two", "three"])
            + _symtab("osyms", ["<eps>", "TEN", "TWENTY", "THIRTY"])
            + _vector_body())
    p.write_bytes(body)
    _check_gold(p)


def test_vector_with_symbols_python_reader(tmp_path):
    from asr2pass_tpu.decode.fst_io import read_fst

    p = tmp_path / "sym2.fst"
    p.write_bytes(_header("vector", 2, 0x3, 0, 3, 3)
                  + _symtab("i", ["<eps>", "a"]) + _symtab("o", ["<eps>"])
                  + _vector_body())
    start, arcs, finals = read_fst(str(p))
    assert start == 0 and len(arcs) == 3
    assert arcs[0][0] == (1, 10, 0.5, 1)
    assert finals == {2: 1.0}


def test_const_v2_unaligned(tmp_path):
    hdr = _header("const", 2, 0, 0, 3, 3)
    p = tmp_path / "c2.fst"
    p.write_bytes(hdr + _const_body(aligned=False, wide=False,
                                    hdr_len=len(hdr)))
    _check_gold(p)


def test_const_v1_aligned(tmp_path):
    """Version 1 = the ALIGNED layout ConstFst::Write emits to seekable
    files: states and arcs each padded to 16-byte file offsets."""
    hdr = _header("const", 1, 0x4, 0, 3, 3)
    p = tmp_path / "c1.fst"
    p.write_bytes(hdr + _const_body(aligned=True, wide=False,
                                    hdr_len=len(hdr)))
    _check_gold(p)


def test_const_aligned_with_symbols(tmp_path):
    hdr = (_header("const", 1, 0x4 | 0x3, 0, 3, 3)
           + _symtab("i", ["<eps>", "x", "y", "z"])
           + _symtab("o", ["<eps>"]))
    p = tmp_path / "c1s.fst"
    p.write_bytes(hdr + _const_body(aligned=True, wide=False,
                                    hdr_len=len(hdr)))
    _check_gold(p)


def test_const64(tmp_path):
    hdr = _header("const64", 1, 0x4, 0, 3, 3)
    p = tmp_path / "c64.fst"
    p.write_bytes(hdr + _const_body(aligned=True, wide=True,
                                    hdr_len=len(hdr)))
    _check_gold(p)


# ---------------------------------------------------------------------------
# hostile inputs: load must FAIL (None), never crash
# ---------------------------------------------------------------------------


def _load(path) -> bool:
    try:
        bindings.NativeFst(str(path))
        return True
    except (ValueError, OSError):
        return False


def test_reject_wrong_magic(tmp_path):
    p = tmp_path / "bad.fst"
    p.write_bytes(b"\x00\x01\x02\x03" + b"junk" * 10)
    assert not _load(p)


def test_reject_truncated_header(tmp_path):
    full = _header("vector", 2, 0, 0, 3, 3)
    for cut in (4, 9, 17, 30):
        p = tmp_path / f"trunc{cut}.fst"
        p.write_bytes(full[:cut])
        assert not _load(p)


def test_reject_truncated_body(tmp_path):
    full = _header("vector", 2, 0, 0, 3, 3) + _vector_body()
    for cut in (len(full) - 3, len(full) - 17, len(full) // 2):
        p = tmp_path / f"cut{cut}.fst"
        p.write_bytes(full[:cut])
        assert not _load(p)


def test_reject_absurd_counts(tmp_path):
    # narcs/nstates far beyond the file size must not reach reserve()
    p = tmp_path / "huge.fst"
    p.write_bytes(_header("vector", 2, 0, 0, 1 << 40, 1 << 50))
    assert not _load(p)
    p2 = tmp_path / "neg.fst"
    p2.write_bytes(_header("vector", 2, 0, 0, -5, -1))
    assert not _load(p2)


def test_reject_out_of_range_start_and_arcs(tmp_path):
    # start beyond nstates
    p = tmp_path / "start.fst"
    p.write_bytes(_header("vector", 2, 0, 99, 3, 3) + _vector_body())
    assert not _load(p)
    # arc targeting a nonexistent state
    body = b""
    body += struct.pack("<f", INF) + struct.pack("<q", 1)
    body += struct.pack("<iifi", 1, 1, 0.0, 77)   # next=77, nstates=1
    p2 = tmp_path / "arc.fst"
    p2.write_bytes(_header("vector", 2, 0, 0, 1, 1) + body)
    assert not _load(p2)


def test_reject_random_fuzz(tmp_path):
    rng = np.random.default_rng(0)
    hdr = _header("vector", 2, 0, 0, 3, 3)
    for i in range(50):
        blob = bytearray(hdr + _vector_body())
        # flip a handful of random bytes (keep the magic so parsing starts)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(4, len(blob)))
            blob[pos] = int(rng.integers(0, 256))
        p = tmp_path / f"fuzz{i}.fst"
        p.write_bytes(bytes(blob))
        try:
            nf = bindings.NativeFst(str(p))
            # survivable mutations may still load; exercise the search too
            nf.transduce([1, 2])
        except (ValueError, OSError):
            pass  # rejection is fine; crashing is not


def test_reject_corrupt_symbol_table(tmp_path):
    bad_st = struct.pack("<i", 1234) + _s("x")   # wrong symtab magic
    p = tmp_path / "badsym.fst"
    p.write_bytes(_header("vector", 2, 0x1, 0, 3, 3) + bad_st
                  + _vector_body())
    assert not _load(p)
