from .keccak import (
    ERC20_TRANSFER_TOPIC,
    UNISWAP_V2_SWAP_TOPIC,
    UNISWAP_V3_SWAP_TOPIC,
    keccak_256,
    keccak_256_hex,
    to_checksum_address,
)
from .hex import (
    eip55_checksum,
    fn_selector,
    hex_to_double,
    hex_to_double_cols,
    hex_to_long,
    topic_address,
)
from .maps import TOKEN_STANDARDS, token_standards_col, token_standards_df

__all__ = [
    "ERC20_TRANSFER_TOPIC",
    "UNISWAP_V2_SWAP_TOPIC",
    "UNISWAP_V3_SWAP_TOPIC",
    "keccak_256",
    "keccak_256_hex",
    "to_checksum_address",
    "eip55_checksum",
    "fn_selector",
    "hex_to_double",
    "hex_to_double_cols",
    "hex_to_long",
    "topic_address",
    "TOKEN_STANDARDS",
    "token_standards_col",
    "token_standards_df",
]
