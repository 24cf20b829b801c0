"""BPE-encode semantics (round 10): the chained single-symbol replace
must equal a reference greedy BPE merge loop on adversarial inputs."""

from __future__ import annotations

import duckdb

from us_stock_data_pipeline_spark.queries.round10_ops2 import _BPE_MERGES, _bpe_chain


def _ref_bpe(text: str) -> str:
    """Reference greedy BPE: for each merge in order, scan left to right
    replacing non-overlapping pairs."""
    toks = list(text.lower())
    for pair, sym in _BPE_MERGES:
        a, b = pair[0], pair[1] if len(pair) == 2 else pair[1:]
        # pairs here are always 2 symbols; earlier merges may have
        # produced single-codepoint symbols, so compare tokenwise
        out = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == pair[0] and toks[i + 1] == pair[1]:
                out.append(sym)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return "".join(toks)


def test_bpe_chain_matches_reference_greedy_merger():
    cases = [
        "the theater is in another era",
        "thththth",           # overlapping 'th' runs
        "ttthhh",             # partial pairs
        "thethethe",          # chained second-order merge 'θe'
        "and another and",    # third-order 'αd'
        "",                   # empty
        "x",                  # single char
        "ininin an anan",     # overlapping 'in'/'an'
        "THE AND",            # case folding
        "reorder rere on ono",
    ]
    con = duckdb.connect()
    for s in cases:
        got = con.sql(
            f"SELECT {_bpe_chain('v')} AS g FROM (SELECT ? AS v)", params=[s]
        ).fetchone()[0]
        assert got == _ref_bpe(s), (s, got, _ref_bpe(s))


def test_bpe_merge_symbols_are_fresh_single_codepoints():
    alphabet = set("abcdefghijklmnopqrstuvwxyz0123456789 .,!?'\"-\n")
    seen = set()
    for pair, sym in _BPE_MERGES:
        assert len(sym) == 1, sym
        assert sym not in alphabet, sym
        assert sym not in seen, sym  # each merge mints a distinct symbol
        seen.add(sym)
        # pair symbols must already exist at that point (base or minted)
        for ch in pair:
            assert ch in alphabet or ch in seen or ch in {s for _, s in _BPE_MERGES}
