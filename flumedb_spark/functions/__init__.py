from .columns import cents, epoch_us, scaled_int, tokens

__all__ = ["cents", "epoch_us", "scaled_int", "tokens"]
