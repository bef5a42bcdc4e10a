from .black_scholes import (
    bs_price,
    bs_greeks,
    black76_price,
    black76_greeks,
    generalized_bs_price,
)

__all__ = [
    "bs_price",
    "bs_greeks",
    "black76_price",
    "black76_greeks",
    "generalized_bs_price",
]
