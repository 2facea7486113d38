"""Deterministic mining-domain fixture (FIXTURES.md §1 schemas).

A hand-built 8-burn-block world with every edge case the reference's
sequential logic exercises (SURVEY §7.3 "hard parts"):

* a pox-invalid snapshot interleaved on the canonical hash chain
  (height 104 has a valid AND an invalid row — F1/F2 interplay);
* a duplicate-height snapshot NOT on the canonical chain (height 103
  fork row — F2 must collapse per height via hash linkage, not dedup);
* a Stacks fork: canonical chain s0..s5 (tip height 5) plus an orphan
  branch s3b (height 3) — J9 must pick the deeper tip and exclude s3b;
* a no-winner burn block (ZERO64 winning txid at height 106 — F8/X13);
* a winner whose stacks height is below the bonus threshold (A3 bonus
  accounting, rpc.js:303-304 — fixture uses threshold 3, see core.py).

Expected outputs are hand-computed in tests/test_core_golden.py.
Everything is pure data — no randomness, no clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas as S


def _h(prefix: str, n: int) -> str:
    """64-char deterministic fake hash."""
    body = f"{prefix}{n:x}"
    return (body * 64)[:64]


# burnchain hashes per height; 103 and 104 have fork/invalid twins
BH = {h: _h("ab", h) for h in range(100, 108)}
BH_FORK103 = _h("f3", 103)     # duplicate height, off-chain
BH_INVALID104 = _h("e4", 104)  # pox-invalid twin of height 104
CH = {h: _h("cc", h) for h in range(100, 108)}          # consensus hashes
SH = {i: _h("5b", i) for i in range(0, 6)}              # stacks block hashes
SH_ORPHAN = _h("0f", 3)                                  # orphan stacks block
TX = {k: _h("7d", k) for k in range(1, 20)}              # commit txids

MINER_A = "ST2QKZ4FKHAH1NQKYKYAYZPY440FEPK7GZ1R5HBP2"
MINER_B = "ST26FVX16539KKXZKJN098Q08HRX3XBAP541MFS0P"
MINER_C = "ST3AM1A56AK2C1XAFJ4115ZSV26EB49BVQ10MGCS0"


def snapshots_rows() -> list[dict]:
    # canonical chain 100->107 via parent hash links; cumulative total_burn
    rows = [
        dict(block_height=100, burn_header_hash=BH[100],
             parent_burn_header_hash=S.ZERO64, consensus_hash=CH[100],
             pox_valid=1, total_burn="1000", winning_block_txid=TX[1],
             stacks_block_height=1),
        dict(block_height=101, burn_header_hash=BH[101],
             parent_burn_header_hash=BH[100], consensus_hash=CH[101],
             pox_valid=1, total_burn="3000", winning_block_txid=TX[3],
             stacks_block_height=2),
        dict(block_height=102, burn_header_hash=BH[102],
             parent_burn_header_hash=BH[101], consensus_hash=CH[102],
             pox_valid=1, total_burn="6000", winning_block_txid=TX[5],
             stacks_block_height=3),
        dict(block_height=103, burn_header_hash=BH[103],
             parent_burn_header_hash=BH[102], consensus_hash=CH[103],
             pox_valid=1, total_burn="10000", winning_block_txid=TX[7],
             stacks_block_height=4),
        # duplicate height 103 on a dead burnchain fork (not linked through)
        dict(block_height=103, burn_header_hash=BH_FORK103,
             parent_burn_header_hash=BH[102], consensus_hash=_h("dd", 1),
             pox_valid=1, total_burn="9999", winning_block_txid=TX[9],
             stacks_block_height=4),
        dict(block_height=104, burn_header_hash=BH[104],
             parent_burn_header_hash=BH[103], consensus_hash=CH[104],
             pox_valid=1, total_burn="15000", winning_block_txid=TX[11],
             stacks_block_height=5),
        # pox-invalid twin at height 104: dropped by F1 before chaining
        dict(block_height=104, burn_header_hash=BH_INVALID104,
             parent_burn_header_hash=BH[103], consensus_hash=_h("dd", 2),
             pox_valid=0, total_burn="15001", winning_block_txid=TX[13],
             stacks_block_height=5),
        # height 105: no sortition winner (sentinel txid)
        dict(block_height=105, burn_header_hash=BH[105],
             parent_burn_header_hash=BH[104], consensus_hash=CH[105],
             pox_valid=1, total_burn="15000", winning_block_txid=S.ZERO64,
             stacks_block_height=5),
        dict(block_height=106, burn_header_hash=BH[106],
             parent_burn_header_hash=BH[105], consensus_hash=CH[106],
             pox_valid=1, total_burn="21000", winning_block_txid=TX[15],
             stacks_block_height=6),
    ]
    return rows


def leader_keys_rows() -> list[dict]:
    # registered at burn height 100/101; commits point back via
    # (key_block_ptr, key_vtxindex)
    return [
        dict(burn_header_hash=BH[100], block_height=100, vtxindex=1,
             address=MINER_A),
        dict(burn_header_hash=BH[100], block_height=100, vtxindex=2,
             address=MINER_B),
        dict(burn_header_hash=BH[101], block_height=101, vtxindex=1,
             address=MINER_C),
    ]


def block_commits_rows() -> list[dict]:
    mk = lambda h, tx, fee, ptr, vtx: dict(
        burn_header_hash=h, txid=tx, burn_fee=fee,
        key_block_ptr=ptr, key_vtxindex=vtx, apparent_sender="sender")
    return [
        # height 100: A wins (TX1)
        mk(BH[100], TX[1], "600", 100, 1),
        mk(BH[100], TX[2], "400", 100, 2),
        # height 101: A wins (TX3)
        mk(BH[101], TX[3], "1100", 100, 1),
        mk(BH[101], TX[4], "900", 100, 2),
        # height 102: B wins (TX5)
        mk(BH[102], TX[5], "1700", 100, 2),
        mk(BH[102], TX[6], "1300", 100, 1),
        # height 103 canonical: C wins (TX7)
        mk(BH[103], TX[7], "2100", 101, 1),
        mk(BH[103], TX[8], "1900", 100, 1),
        # height 103 fork block: commits there never count (off chain)
        mk(BH_FORK103, TX[9], "5000", 100, 1),
        # height 104: B wins (TX11); unknown leader key on TX12 (left join)
        mk(BH[104], TX[11], "2600", 100, 2),
        mk(BH[104], TX[12], "2400", 99, 9),
        # height 105: no winner; commits still burn
        mk(BH[105], TX[14], "1500", 100, 1),
        # height 106: A wins (TX15); its stacks block s5 is the chain tip
        mk(BH[106], TX[15], "3300", 100, 1),
        mk(BH[106], TX[16], "2700", 101, 1),
    ]


def block_headers_rows() -> list[dict]:
    # canonical stacks chain s0..s5 anchored at burn blocks 100..104,106;
    # orphan s3b (height 3) forks off s2 and anchors at the fork burn row
    return [
        dict(burn_header_hash=BH[100], block_hash=SH[0],
             parent_block=S.ZERO64, consensus_hash=CH[100], block_height=0),
        dict(burn_header_hash=BH[101], block_hash=SH[1], parent_block=SH[0],
             consensus_hash=CH[101], block_height=1),
        dict(burn_header_hash=BH[102], block_hash=SH[2], parent_block=SH[1],
             consensus_hash=CH[102], block_height=2),
        dict(burn_header_hash=BH[103], block_hash=SH[3], parent_block=SH[2],
             consensus_hash=CH[103], block_height=3),
        dict(burn_header_hash=BH_FORK103, block_hash=SH_ORPHAN,
             parent_block=SH[2], consensus_hash=_h("dd", 1), block_height=3),
        dict(burn_header_hash=BH[104], block_hash=SH[4], parent_block=SH[3],
             consensus_hash=CH[104], block_height=4),
        dict(burn_header_hash=BH[106], block_hash=SH[5], parent_block=SH[4],
             consensus_hash=CH[106], block_height=5),
    ]


def payments_rows() -> list[dict]:
    return [
        dict(consensus_hash=CH[h], stacks_block_height=sh, address=addr)
        for h, sh, addr in [
            (100, 1, MINER_A), (101, 2, MINER_A), (102, 3, MINER_B),
            (103, 4, MINER_C), (104, 5, MINER_B), (106, 6, MINER_A),
        ]
    ]


def staging_blocks_rows() -> list[dict]:
    return [
        dict(consensus_hash=CH[100], processed=1, orphaned=0, height=1),
        dict(consensus_hash=CH[101], processed=1, orphaned=0, height=2),
        dict(consensus_hash=CH[102], processed=1, orphaned=0, height=3),
        dict(consensus_hash=CH[103], processed=1, orphaned=0, height=4),
        dict(consensus_hash=CH[104], processed=1, orphaned=0, height=5),
        dict(consensus_hash=CH[105], processed=0, orphaned=0, height=5),
        dict(consensus_hash=CH[106], processed=1, orphaned=1, height=6),
    ]


# secp256k1 generator point, compressed — a well-known public constant,
# used as a deterministic "miner pubkey" for the ops fixture
PUBKEY_G = "0279be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"


def burnchain_ops_rows() -> list[dict]:
    import json

    commit_op = json.dumps({
        "LeaderBlockCommit": {
            "burn_header_hash": [1, 2, 3],
            "apparent_sender": {
                "public_keys": [{"key": PUBKEY_G, "compressed": True}],
            },
        }
    })
    register_op = json.dumps({
        "LeaderKeyRegister": {
            "address": {"version": 26, "bytes": "3b" * 20},
            "block_height": 100,
            "vtxindex": 1,
        }
    })
    return [
        dict(block_hash=BH[100], op=commit_op),
        dict(block_hash=BH[100], op=register_op),
        dict(block_hash=BH[101], op=commit_op),
    ]


def transactions_rows() -> list[dict]:
    """3 txs (incl. coinbase) on s1, 2 on s2 — A7 counts group size − 1."""
    from .addresses import sha512_256

    def block_id(sh: str, ch: str) -> str:
        return sha512_256(bytes.fromhex(sh) + bytes.fromhex(ch)).hex()

    id1 = block_id(SH[1], CH[101])
    id2 = block_id(SH[2], CH[102])
    return [
        dict(index_block_hash=id1, txid=TX[17]),
        dict(index_block_hash=id1, txid=TX[18]),
        dict(index_block_hash=id1, txid=TX[19]),
        dict(index_block_hash=id2, txid=TX[13]),
        dict(index_block_hash=id2, txid=TX[14]),
    ]


def prices_rows() -> list[dict]:
    return [
        dict(symbol="BTCUSDT", price=50000.0),
        dict(symbol="STXUSDT", price=0.5),
    ]


_BUILDERS = {
    "snapshots": snapshots_rows,
    "leader_keys": leader_keys_rows,
    "block_commits": block_commits_rows,
    "block_headers": block_headers_rows,
    "payments": payments_rows,
    "staging_blocks": staging_blocks_rows,
    "burnchain_ops": burnchain_ops_rows,
    "transactions": transactions_rows,
    "prices": prices_rows,
}


def mining_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """All fixture tables as DataFrames with their declared schemas and
    ingest casts applied."""
    out = {}
    for name, build in _BUILDERS.items():
        df = spark.createDataFrame(build(), schema=S.MINING_SCHEMAS[name])
        out[name] = S.cast_amounts(name, df)
    return out
