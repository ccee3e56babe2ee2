"""Pure-Python Keccak-256 + EIP-55 checksum addresses.

The reference computes event-topic constants with ``Web3.keccak`` at import
time (reference ``src/transform/etl_pipeline.py:30-38``) and checksums
addresses with ``Web3.to_checksum_address`` (``etl_pipeline.py:81-82``).
Neither web3 nor a keccak C extension is assumed here, so this module
implements the (public, FIPS-202-documented) Keccak permutation in the style
of the Keccak team's public-domain CompactFIPS202 reference code, with the
original Keccak 0x01 domain padding that Ethereum uses (not SHA3's 0x06).

These run driver-side (constants) or inside Arrow-batched pandas UDFs
(checksumming); they are not on any hot aggregation path.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1


def _rol64(a: int, n: int) -> int:
    n %= 64
    return ((a << n) | (a >> (64 - n))) & _MASK64


def _keccak_f1600(lanes: list[list[int]]) -> list[list[int]]:
    R = 1
    for _ in range(24):
        # theta
        C = [lanes[x][0] ^ lanes[x][1] ^ lanes[x][2] ^ lanes[x][3] ^ lanes[x][4] for x in range(5)]
        D = [C[(x + 4) % 5] ^ _rol64(C[(x + 1) % 5], 1) for x in range(5)]
        lanes = [[lanes[x][y] ^ D[x] for y in range(5)] for x in range(5)]
        # rho and pi
        x, y = 1, 0
        current = lanes[x][y]
        for t in range(24):
            x, y = y, (2 * x + 3 * y) % 5
            current, lanes[x][y] = lanes[x][y], _rol64(current, (t + 1) * (t + 2) // 2)
        # chi
        for y2 in range(5):
            T = [lanes[x2][y2] for x2 in range(5)]
            for x2 in range(5):
                lanes[x2][y2] = T[x2] ^ ((~T[(x2 + 1) % 5]) & T[(x2 + 2) % 5])
        # iota
        for j in range(7):
            R = ((R << 1) ^ ((R >> 7) * 0x71)) % 256
            if R & 2:
                lanes[0][0] ^= 1 << ((1 << j) - 1)
    return lanes


def keccak_256(data: bytes) -> bytes:
    """Keccak-256 digest (Ethereum variant: delimiter 0x01, rate 136)."""
    rate = 136
    state = bytearray(200)
    # absorb
    offset = 0
    block = bytearray(data)
    while len(block) - offset >= rate:
        for i in range(rate):
            state[i] ^= block[offset + i]
        state = _permute(state)
        offset += rate
    # pad
    tail = block[offset:]
    padded = bytearray(rate)
    padded[: len(tail)] = tail
    padded[len(tail)] ^= 0x01
    padded[rate - 1] ^= 0x80
    for i in range(rate):
        state[i] ^= padded[i]
    state = _permute(state)
    return bytes(state[:32])


def _permute(state: bytearray) -> bytearray:
    lanes = [
        [int.from_bytes(state[8 * (x + 5 * y) : 8 * (x + 5 * y) + 8], "little") for y in range(5)]
        for x in range(5)
    ]
    lanes = _keccak_f1600(lanes)
    out = bytearray(200)
    for x in range(5):
        for y in range(5):
            out[8 * (x + 5 * y) : 8 * (x + 5 * y) + 8] = lanes[x][y].to_bytes(8, "little")
    return out


def keccak_256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return "0x" + keccak_256(data).hex()


def to_checksum_address(addr: str) -> str:
    """EIP-55 mixed-case checksum encoding of a 0x-prefixed hex address."""
    hexaddr = addr.lower().removeprefix("0x")
    digest = keccak_256(hexaddr.encode("ascii")).hex()
    out = []
    for ch, d in zip(hexaddr, digest):
        out.append(ch.upper() if ch in "abcdef" and int(d, 16) >= 8 else ch)
    return "0x" + "".join(out)


# Event-signature topic constants (keccak of the canonical signatures;
# identical to the reference's Web3.keccak-derived values,
# reference etl_pipeline.py:30-38 / kafka_producer.py:30-34).
ERC20_TRANSFER_TOPIC = keccak_256_hex("Transfer(address,address,uint256)")
UNISWAP_V2_SWAP_TOPIC = keccak_256_hex("Swap(address,uint256,uint256,uint256,uint256,address)")
UNISWAP_V3_SWAP_TOPIC = keccak_256_hex("Swap(address,address,int256,int256,uint160,uint128,int24)")
