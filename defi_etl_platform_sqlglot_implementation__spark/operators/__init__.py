from .transfers import decode_transfers
from .swaps import parse_swaps, swap_price
from .tx_features import aggregate_by_block, engineer_transactions
from .mev import mev_scores
from .risk import (
    il_scan,
    rolling_var,
    rolling_var_cvar,
    stress_test,
    var_cvar,
)

__all__ = [
    "decode_transfers",
    "parse_swaps",
    "swap_price",
    "aggregate_by_block",
    "engineer_transactions",
    "mev_scores",
    "il_scan",
    "rolling_var",
    "rolling_var_cvar",
    "stress_test",
    "var_cvar",
]
