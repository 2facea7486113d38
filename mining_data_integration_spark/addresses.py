"""Address / crypto scalar functions (SURVEY §2.8 X1-X5, O-R3).

The reference imports these from npm crypto libs (rpc.js:320-322,
354-362); here they are pure-Python implementations of the public
algorithms (c32check = Crockford base32 + double-sha256 checksum;
base58check; SHA-512/256; secp256k1 point (de)compression), wrapped as
Arrow-vectorized pandas_udfs.

Scale placement: these UDFs break whole-stage codegen, so the engine
applies them only in final output projections (miner_info/mining_info
btc_address columns), never mid-pipeline — the joins and aggregates
upstream run entirely JVM-side. Each batch crosses the Arrow boundary
once; per-row work is a few hash calls.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

C32_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

# c32check address version -> base58check version byte
# (public c32check mapping: mainnet p2pkh/p2sh, testnet p2pkh/p2sh)
C32_TO_B58_VERSION = {22: 0, 20: 5, 26: 111, 21: 196}
B58_TO_C32_VERSION = {v: k for k, v in C32_TO_B58_VERSION.items()}

# secp256k1 field prime
_P = 2 ** 256 - 2 ** 32 - 977


def _sha256d(b: bytes) -> bytes:
    return hashlib.sha256(hashlib.sha256(b).digest()).digest()


def hash160(b: bytes) -> bytes:
    return hashlib.new("ripemd160", hashlib.sha256(b).digest()).digest()


def sha512_256(b: bytes) -> bytes:
    """X1 (rpc.js:320-322): Stacks block id = SHA-512/256."""
    return hashlib.new("sha512_256", b).digest()


# --- base58check -----------------------------------------------------------

def b58check_encode(version: int, payload: bytes) -> str:
    raw = bytes([version]) + payload
    raw += _sha256d(raw)[:4]
    n = int.from_bytes(raw, "big")
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = B58_ALPHABET[r] + out
    pad = len(raw) - len(raw.lstrip(b"\x00"))
    return "1" * pad + out


def b58check_decode(addr: str) -> tuple[int, bytes]:
    n = 0
    for ch in addr:
        n = n * 58 + B58_ALPHABET.index(ch)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    raw = b"\x00" * (len(addr) - len(addr.lstrip("1"))) + raw
    if _sha256d(raw[:-4])[:4] != raw[-4:]:
        raise ValueError("bad base58check checksum")
    return raw[0], raw[1:-4]


# --- c32check (Crockford base32 + double-sha256 checksum) ------------------

def _c32_encode(data: bytes) -> str:
    n = int.from_bytes(data, "big")
    out = ""
    while n:
        n, r = divmod(n, 32)
        out = C32_ALPHABET[r] + out
    pad = len(data) - len(data.lstrip(b"\x00"))
    return "0" * pad + (out or "")


def _c32_decode(s: str) -> bytes:
    n = 0
    for ch in s:
        n = n * 32 + C32_ALPHABET.index(ch)
    body = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = len(s) - len(s.lstrip("0"))
    return b"\x00" * pad + body


def c32address(version: int, h160: bytes) -> str:
    """X5 (rpc.js:362): c32check address 'S' + version char + payload."""
    checksum = _sha256d(bytes([version]) + h160)[:4]
    return "S" + C32_ALPHABET[version] + _c32_encode(h160 + checksum)


def c32address_decode(addr: str) -> tuple[int, bytes]:
    if not addr or addr[0] != "S":
        raise ValueError("c32 address must start with S")
    version = C32_ALPHABET.index(addr[1])
    data = _c32_decode(addr[2:])
    h160, checksum = data[:-4], data[-4:]
    # c32 encoding is not length-preserving: re-pad hash160 to 20 bytes
    h160 = h160.rjust(20, b"\x00")
    if _sha256d(bytes([version]) + h160)[:4] != checksum:
        raise ValueError("bad c32check checksum")
    return version, h160


def c32_to_b58(addr: str) -> str:
    """X4 (rpc.js:359, 437, 453, 476): Stacks c32 -> Bitcoin b58."""
    version, h160 = c32address_decode(addr)
    return b58check_encode(C32_TO_B58_VERSION[version], h160)


def b58_to_c32(addr: str) -> str:
    version, h160 = b58check_decode(addr)
    return c32address(B58_TO_C32_VERSION[version], h160)


# --- secp256k1 pubkey normalization (X2) -----------------------------------

def decompress_pubkey(pub: bytes) -> bytes:
    """33-byte compressed -> 65-byte uncompressed secp256k1 point:
    y^2 = x^3 + 7 over F_p; sqrt via pow(., (p+1)/4) (p ≡ 3 mod 4)."""
    if len(pub) == 65 and pub[0] == 4:
        return pub
    if len(pub) != 33 or pub[0] not in (2, 3):
        raise ValueError("not a secp256k1 public key")
    x = int.from_bytes(pub[1:], "big")
    y = pow((pow(x, 3, _P) + 7) % _P, (_P + 1) // 4, _P)
    if y % 2 != pub[0] % 2:
        y = _P - y
    return b"\x04" + x.to_bytes(32, "big") + y.to_bytes(32, "big")


def compress_pubkey(pub: bytes) -> bytes:
    if len(pub) == 33 and pub[0] in (2, 3):
        return pub
    if len(pub) != 65 or pub[0] != 4:
        raise ValueError("not a secp256k1 public key")
    x, y = pub[1:33], int.from_bytes(pub[33:], "big")
    return bytes([2 + (y % 2)]) + x


def pubkey_to_stacks_address(pubkey_hex: str, version: int = 26) -> str:
    """X3 (rpc.js:358): compressed-pubkey hash160 -> c32 address
    (version 26 = testnet p2pkh, as the reference uses Testnet)."""
    pub = compress_pubkey(bytes.fromhex(pubkey_hex))
    return c32address(version, hash160(pub))


# --- vectorized column functions -------------------------------------------

def _safe(fn):
    def wrapped(v):
        try:
            return fn(v)
        except Exception:
            return None
    return wrapped


@pandas_udf(StringType())
def c32_to_b58_udf(addr: pd.Series) -> pd.Series:
    return addr.map(_safe(c32_to_b58), na_action="ignore")


@pandas_udf(StringType())
def pubkey_to_stacks_udf(pubkey_hex: pd.Series) -> pd.Series:
    return pubkey_hex.map(_safe(pubkey_to_stacks_address), na_action="ignore")


@pandas_udf(StringType())
def c32address_udf(version: pd.Series, bytes_hex: pd.Series) -> pd.Series:
    """X5 (rpc.js:362): c32 address from (version, hash160-hex) — the
    LeaderKeyRegister address shape in the burnchain op JSON."""
    def one(v, h):
        if v is None or h is None:
            return None
        return c32address(int(v), bytes.fromhex(h))
    return pd.Series([_safe(lambda p: one(*p))((v, h))
                      for v, h in zip(version, bytes_hex)])


@pandas_udf(StringType())
def stacks_block_id_udf(block_hash: pd.Series,
                        consensus_hash: pd.Series) -> pd.Series:
    """X1/J8 computed join key: sha512_256(block_hash ‖ consensus_hash)
    over the hex-decoded buffers (rpc.js:320-322)."""
    def one(bh, ch):
        if bh is None or ch is None:
            return None
        return sha512_256(bytes.fromhex(bh) + bytes.fromhex(ch)).hex()
    return pd.Series([one(b, c) for b, c in zip(block_hash, consensus_hash)])


def with_btc_address(df, stx_col: str = "stx_address",
                     out_col: str = "btc_address") -> "DataFrame":
    """Final-projection enrichment (F11/F12): invalid/unknown addresses
    yield NULL rather than failing the batch."""
    return df.withColumn(out_col, c32_to_b58_udf(F.col(stx_col)))
