"""X1-X5 crypto codec tests: known public vectors + round-trips +
vectorized UDF behavior (including null/invalid handling)."""

from __future__ import annotations

from mining_data_integration_spark import addresses as ad


class TestPrimitives:
    def test_sha512_256_empty_vector(self):
        # NIST SHA-512/256("")
        assert ad.sha512_256(b"").hex() == (
            "c672b8d1ef56ed28ab87c3622c5114069bdd3ad7b8f9737498d0c01ecef0967a")

    def test_b58check_genesis_vector(self):
        # Bitcoin genesis coinbase: version 0x00 + known hash160
        h160 = bytes.fromhex("62e907b15cbf27d5425399ebf6f0fb50ebb88f18")
        assert ad.b58check_encode(0, h160) == \
            "1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa"
        v, payload = ad.b58check_decode("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa")
        assert (v, payload) == (0, h160)

    def test_c32_roundtrip_all_versions(self):
        h160 = bytes.fromhex("00" * 2 + "a1" * 18)  # leading zeros kept
        for version in (20, 21, 22, 26):
            addr = ad.c32address(version, h160)
            assert addr[0] == "S"
            assert ad.c32address_decode(addr) == (version, h160)

    def test_c32_b58_roundtrip(self):
        h160 = bytes.fromhex("3b" * 20)
        c32 = ad.c32address(26, h160)
        b58 = ad.c32_to_b58(c32)
        assert ad.b58_to_c32(b58) == c32
        assert ad.b58check_decode(b58) == (111, h160)

    def test_pubkey_compress_decompress(self):
        # generator point G of secp256k1 (public constant)
        gx = "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"
        gy = "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8"
        unc = bytes.fromhex("04" + gx + gy)
        comp = ad.compress_pubkey(unc)
        assert comp.hex() == "02" + gx           # G_y is even
        assert ad.decompress_pubkey(comp) == unc

    def test_pubkey_to_stacks_deterministic(self):
        gx = "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"
        a1 = ad.pubkey_to_stacks_address("02" + gx)
        a2 = ad.pubkey_to_stacks_address("02" + gx)
        assert a1 == a2 and a1.startswith("ST")


class TestUdfs:
    def test_c32_to_b58_udf_null_on_invalid(self, spark):
        h160 = bytes.fromhex("3b" * 20)
        good = ad.c32address(26, h160)
        bad = good[:-1] + ("0" if good[-1] != "0" else "1")  # break checksum
        df = spark.createDataFrame(
            [(good,), (bad,), (None,)], "stx_address string")
        rows = ad.with_btc_address(df).collect()
        assert rows[0].btc_address == ad.c32_to_b58(good)
        assert rows[1].btc_address is None   # corrupted checksum -> NULL
        assert rows[2].btc_address is None

    def test_stacks_block_id_udf(self, spark):
        bh, ch = "ab" * 32, "cd" * 20
        df = spark.createDataFrame([(bh, ch)], "block_hash string, consensus_hash string")
        got = df.select(
            ad.stacks_block_id_udf("block_hash", "consensus_hash").alias("id")
        ).collect()[0].id
        assert got == ad.sha512_256(bytes.fromhex(bh) + bytes.fromhex(ch)).hex()
