from .discount import discount, gae

__all__ = ["discount", "gae"]
